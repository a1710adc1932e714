"""Per-stage throughput benchmarks beyond bench.py's stage-3 number.

Prints ONE JSON line per stage:
  stage-2  proposal generation (frozen Swin-L + masked k-means + full-res
           nearest-centroid), the reference's proposal_generation_net.py
           workload (40 jobs x 8 V100, batch 1/GPU).
  stage-2b dense-CRF smoothing on device (bilateral-grid mean field), the
           reference's 90-process pydensecrf CPU farm
           (continuously_postprocess_dcrf.py, sh_files/dcrf/run.sh).

Baselines: stage 2 — the reference runs batch 1/V100 with sklearn k-means on
CPU per image; public Swin-L inference pace (~8 img/s/V100 at 640^2) bounds
it above, k-means latency pushes it below; we take 5 img/s/V100 as a generous
estimate. Stage 2b — pydensecrf at 640^2 with 10 mean-field iterations runs
~1.2 s/img/core (public timings; the reference's farm exists precisely
because of this), i.e. ~0.8 img/s/core.
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def _swin_knobs():
    """A/B env knobs shared with bench.py (tools/ab_bench.py discipline) so
    the forward-only trunk stages can measure the same levers."""
    kw = {}
    if "BENCH_FUSED_MLP" in os.environ:
        kw["fused_mlp"] = os.environ["BENCH_FUSED_MLP"] == "1"
    if "BENCH_QKV_LAYOUT" in os.environ:
        kw["qkv_layout"] = os.environ["BENCH_QKV_LAYOUT"]
    if "BENCH_FUSED_PROJ" in os.environ:
        kw["fused_proj"] = os.environ["BENCH_FUSED_PROJ"] == "1"
    return kw


def bench_stage2(batch_size: int = 8, image_size: int = 640, iters: int = 8):
    from partdistillation_tpu.models.meta_arch.proposal_generation import (
        ProposalGenerationConfig, make_generation_fn)
    from partdistillation_tpu.models.meta_arch.proposal import normalize_images
    from partdistillation_tpu.models.swin import SwinTransformer, swin_large_config

    cfg = ProposalGenerationConfig(swin=swin_large_config(dtype=jnp.bfloat16, **_swin_knobs()))
    gen_fn = jax.jit(make_generation_fn(cfg))
    backbone = SwinTransformer(cfg.swin)
    rng = np.random.RandomState(0)
    params = jax.jit(backbone.init)(
        jax.random.PRNGKey(0),
        normalize_images(jnp.zeros((1, image_size, image_size, 3))))
    batch = {
        "image": jnp.asarray(
            rng.randint(0, 255, (batch_size, image_size, image_size, 3)),
            jnp.float32),
        "object_mask": jnp.asarray(
            rng.rand(batch_size, image_size, image_size) < 0.4),
    }
    key = jax.random.PRNGKey(1)
    out = gen_fn(params, batch, key)
    _sync(out["object_ratio"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = gen_fn(params, batch, key)
    _sync(out["object_ratio"])
    ips = batch_size * iters / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "stage2_proposal_generation_images_per_sec_per_chip",
        "value": round(ips, 3), "unit": "images/sec/chip",
        "vs_baseline": round(ips / 5.0, 3),
    }))


def bench_stage1(batch_size: int = 8, image_size: int = 640, topk: int = 10,
                 iters: int = 8, vocab: int = 1000, dtype=jnp.bfloat16):
    """Stage-1 detection from pixels: segmenter top-k object proposals +
    CLIP ViT-B/32 region scoring (the `detect` CLI's compute path,
    models/meta_arch/labeling.py), the reference's Detic labeling workload
    (labeling_detic.py:25-119, 60 jobs x 8 V100, batch 2/GPU,
    sh_files/detic/run.sh:10-31).

    Reports the combined images/sec of the serial detector -> region-scorer
    chain. Baseline: Detic SwinB at batch 2/GPU with the CLIP text head —
    ~3 img/s/V100 (generous, same spirit as the other stage estimates).
    CLIP weights are randomly initialized at the true ViT-B/32 geometry
    (identical FLOPs; the bench needs no checkpoint download)."""
    from partdistillation_tpu.models.clip_vit import (CLIPVisionTower,
                                                      CLIPVisionTowerConfig)
    from partdistillation_tpu.models.meta_arch.labeling import (
        clip_region_scorer_jax, make_proposal_detection_fn)
    from partdistillation_tpu.models.meta_arch.proposal import (
        ProposalModelConfig, normalize_images)
    from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
    from partdistillation_tpu.models.segmenter import (MaskFormerSegmenter,
                                                       SegmenterConfig)
    from partdistillation_tpu.models.swin import swin_large_config
    from partdistillation_tpu.models.transformer_decoder import (
        TransformerDecoderConfig)

    seg = SegmenterConfig(
        swin=swin_large_config(dtype=dtype, **_swin_knobs()),
        # banded r4 exact: detect runs frozen converted/trained weights
        pixel_decoder=PixelDecoderConfig(dtype=dtype, msda_mode="banded",
                                         msda_band_radius=4),
        decoder=TransformerDecoderConfig(num_classes=1, num_queries=200,
                                         dec_layers=9, dtype=dtype),
    )
    model_cfg = ProposalModelConfig(segmenter=seg, test_topk=topk)
    model = MaskFormerSegmenter(seg)
    rng = np.random.RandomState(0)
    images_np = rng.randint(0, 255, (batch_size, image_size, image_size, 3)
                            ).astype(np.uint8)
    images = jnp.asarray(images_np, jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), normalize_images(images[:1]))
    detection_fn = jax.jit(make_proposal_detection_fn(model_cfg))

    det = detection_fn(params, images)
    _sync(det["scores"])
    t0 = time.perf_counter()
    for _ in range(iters):
        det = detection_fn(params, images)
    _sync(det["scores"])
    ips_det = batch_size * iters / (time.perf_counter() - t0)

    # CLIP ViT-B/32 region scorer at true geometry, random init
    ccfg = CLIPVisionTowerConfig(dtype=dtype)
    tower = CLIPVisionTower(ccfg)
    cparams = jax.jit(tower.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3)))
    temb = rng.randn(vocab, ccfg.projection_dim).astype(np.float32)
    temb /= np.linalg.norm(temb, axis=-1, keepdims=True)
    scorer = clip_region_scorer_jax(
        tower.apply, temb, crop_size=ccfg.image_size, capacity=16,
        vision_params=cparams, crop_backend="device")

    # DEVICE-resident image/masks (the detection outputs) scored in ONE
    # dispatch for the whole batch (scorer.batched): re-uploading per region
    # call costs ~315 ms/image over the axon tunnel (~15 MB/s host->device —
    # a tunnel artifact, not TPU PCIe), and per-image dispatches measured
    # 14.9 img/s; empty masks fall back to full-image crops via the device
    # path's bbox guard
    masks_dev = det["masks"]
    scorer.batched(images, masks_dev)  # warm the jit
    t0 = time.perf_counter()
    for _ in range(iters):
        scorer.batched(images, masks_dev)
    ips_clip = batch_size * iters / (time.perf_counter() - t0)

    ips = 1.0 / (1.0 / ips_det + 1.0 / ips_clip)

    # end-to-end host loop (the `detect` CLI): double-buffered pipelining —
    # JPEG loads, mask readback, RLE encode and store writes for batch i
    # overlap batch i+1's device programs. The device ceiling is the serial
    # combination above (detector + scorer share one chip; their device
    # times add) — this measures how close the real CLI loop gets to it.
    import tempfile

    from PIL import Image

    from partdistillation_tpu.models.meta_arch.labeling import (
        LabelingConfig, run_labeling_batched)

    tmpd = tempfile.mkdtemp(prefix="s1bench_")
    n_images = batch_size * iters
    items = []
    for i in range(n_images):
        p = os.path.join(tmpd, f"im{i:04d}.jpg")
        Image.fromarray(images_np[i % batch_size]).save(p, quality=90)
        items.append({"image_id": f"im{i:04d}", "file_name": p,
                      "class_id": 0, "class_code": "n00000000"})

    class _NullWriter:
        def __contains__(self, iid):
            return False

        def write(self, rec):
            return True

        def flush(self):
            pass

    lcfg = LabelingConfig(topk=topk)
    run_labeling_batched(detection_fn, params, items[:batch_size],
                         _NullWriter(), lcfg, region_scorer=scorer,
                         image_size=image_size, batch_size=batch_size)  # warm
    t0 = time.perf_counter()
    stats = run_labeling_batched(detection_fn, params, items, _NullWriter(),
                                 lcfg, region_scorer=scorer,
                                 image_size=image_size, batch_size=batch_size)
    ips_e2e = (stats["saved"] + stats["empty"]) / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "stage1_detect_images_per_sec_per_chip",
        "value": round(ips_e2e, 3),
        "unit": ("images/sec/chip (end-to-end pipelined CLI loop; device "
                 f"ceiling {ips:.1f} = detector {ips_det:.1f} + {topk}-region "
                 f"CLIP scoring {ips_clip:.1f} serial on one chip)"),
        "vs_baseline": round(ips_e2e / 3.0, 3),
    }))


def bench_dcrf(batch_size: int = 8, image_size: int = 640, capacity: int = 8,
               crf_iters: int = 10, iters: int = 5):
    from partdistillation_tpu.ops.dense_crf import (DenseCRFParams, dense_crf,
                                                    unary_from_masks)

    params = DenseCRFParams(iters=crf_iters)
    rng = np.random.RandomState(0)
    image = jnp.asarray(
        rng.randint(0, 255, (batch_size, image_size, image_size, 3)), jnp.float32)
    masks = jnp.asarray(
        rng.rand(batch_size, capacity, image_size, image_size) < 0.15)
    valid = jnp.ones((batch_size, capacity), bool)

    def refine(image, masks, valid):
        unary = unary_from_masks(masks, valid, params.gt_prob)
        q = dense_crf(image, unary, params)
        return jnp.argmax(q, axis=-1)

    fn = jax.jit(jax.vmap(refine))
    out = fn(image, masks, valid)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(image, masks, valid)
    _sync(out)
    ips = batch_size * iters / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "stage2b_dcrf_images_per_sec_per_chip",
        "value": round(ips, 3), "unit": "images/sec/chip",
        "vs_baseline": round(ips / 0.8, 3),
    }))


def bench_loader(n_images: int = 256, image_size: int = 640,
                 batch_size: int = 16, num_workers: int = 8):
    """Input-pipeline headroom: images/sec of `batch_iterator` with the
    stage-3 ProposalTrainMapper (JPEG decode + aug + RLE decode + pad-stack)
    over a synthetic on-disk dataset at 640^2. The number to compare against
    is the stage-3 device throughput (bench.py): the loader must be >=2x the
    device or the chip starves (VERDICT r2 weak #7 / SURVEY §7 hard-part #7).
    vs_baseline = loader img/s / 19.08 (the round-2 device img/s/chip)."""
    import tempfile

    from PIL import Image

    from partdistillation_tpu.data.datasets.imagenet import load_imagenet
    from partdistillation_tpu.data.loader import batch_iterator
    from partdistillation_tpu.data.mappers import ProposalTrainMapper
    from partdistillation_tpu.data.pseudo_store import ShardWriter
    from partdistillation_tpu.utils import rle as rle_codec

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as root:
        cls_dir = os.path.join(root, "n00000001")
        os.makedirs(cls_dir)
        # realistic JPEGs: smooth random fields, ~VGA-to-640^2 sizes
        base = rng.randint(0, 255, (64, 64, 3), np.uint8)
        img = np.asarray(Image.fromarray(base).resize(
            (image_size, int(image_size * 0.75))), np.uint8)
        for i in range(n_images):
            Image.fromarray(img).save(
                os.path.join(cls_dir, f"img_{i:05d}.jpg"), quality=90)
        store_dir = os.path.join(root, "stage2")
        h, w = img.shape[:2]
        # realistic proposals: contiguous blobs (random-noise masks would be
        # worst-case RLE, ~1000x more runs than real part masks)
        yy, xx = np.mgrid[0:h, 0:w]
        with ShardWriter(store_dir, 0, 1) as wtr:
            for i in range(n_images):
                masks = []
                for _ in range(4):
                    cy, cx = rng.randint(0, h), rng.randint(0, w)
                    ry, rx = rng.randint(h // 8, h // 3), rng.randint(w // 8, w // 3)
                    masks.append(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0)
                wtr.write({"image_id": f"img_{i:05d}", "object_ratio": 0.5,
                           "part_masks": [rle_codec.encode(m) for m in masks]})
        items = load_imagenet(root)
        for it in items:
            it["proposal_store"] = store_dir
        mapper = ProposalTrainMapper(image_size=image_size)

        # per-core number first: the mapper is thread-pooled, so host
        # throughput = per-core x workers on a real multi-core TPU host (this
        # bench box has os.cpu_count()=1, where pooling can only lose)
        for it in items[:16]:
            mapper(dict(it, _epoch=0))  # warm (store mmap, PIL codecs)
        t0 = time.perf_counter()
        for it in items[:64]:
            mapper(dict(it, _epoch=1))
        per_core = 64 / (time.perf_counter() - t0)

        t0 = time.perf_counter()
        n = 0
        for batch in batch_iterator(items, mapper, batch_size,
                                    num_workers=num_workers):
            n += batch["image"].shape[0]
        pooled = n / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "loader_stage3_images_per_sec_per_core",
        "value": round(per_core, 3),
        "unit": "images/sec/core (host input pipeline; pooled on this box: "
                f"{pooled:.1f} img/s with {num_workers} workers, "
                f"{os.cpu_count()} cpus)",
        # the loader must outrun the device (bench.py stage-3 img/s/chip)
        # 2x per chip; baseline = 2 x 22.84
        "vs_baseline": round(per_core / (2 * 22.84), 3),
    }))


def bench_stage4(batch_size: int = 8, image_size: int = 640, iters: int = 8,
                 num_object_classes: int = 1000, k: int = 8,
                 dtype=jnp.bfloat16):
    """Stage-4 part ranking at production geometry: the CLUSTER phase
    (Swin-L 640^2 Mask2Former forward + top-200 + unique assignment +
    ratio/score filters + GT top-1 match) and the SAVE/label phase (forward +
    per-class centroid-bank nearest-centroid labeling), plus the on-device
    per-class k-means fit the host loop calls between them.

    Reference: part_ranking_model.py driven as 50 jobs x 8 V100s
    (sh_files/part_ranking/run.sh:34-44), batch 1/GPU with sklearn k-means on
    CPU; the forward is the same Mask2Former-SwinL as stage 2's, so we reuse
    the 5 img/s/V100 inference estimate as the per-device baseline."""
    from partdistillation_tpu.ops.kmeans import masked_kmeans
    from partdistillation_tpu.models.meta_arch.part_ranking import (
        PartRankingConfig, RankingMode, make_cluster_fn, make_label_fn)
    from partdistillation_tpu.models.meta_arch.proposal import normalize_images
    from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
    from partdistillation_tpu.models.segmenter import (MaskFormerSegmenter,
                                                       SegmenterConfig)
    from partdistillation_tpu.models.swin import swin_large_config
    from partdistillation_tpu.models.transformer_decoder import (
        TransformerDecoderConfig)

    seg = SegmenterConfig(
        swin=swin_large_config(dtype=dtype, **_swin_knobs()),
        # banded MSDA is exact here: ranking runs the FROZEN stage-3
        # checkpoint (eval-only), so sampling offsets are fixed at their
        # trained values (measured in-band at radius 4,
        # tools/msda_offset_hist.py; PERF.md round-3 radius table)
        pixel_decoder=PixelDecoderConfig(dtype=dtype, msda_mode="banded",
                                         msda_band_radius=4),
        decoder=TransformerDecoderConfig(num_classes=1, num_queries=200,
                                         dec_layers=9, dtype=dtype),
    )
    cfg = PartRankingConfig(segmenter=seg, num_clusters=k)
    model = MaskFormerSegmenter(seg)
    rng = np.random.RandomState(0)
    t = 8
    batch = {
        "image": jnp.asarray(
            rng.randint(0, 255, (batch_size, image_size, image_size, 3)),
            jnp.float32),
        "masks": jnp.asarray(
            (rng.rand(batch_size, t, image_size, image_size) < 0.15)
            .astype(np.float32)),
        "mask_valid": jnp.ones((batch_size, t), bool),
        "mask_labels": jnp.asarray(rng.randint(0, k, (batch_size, t)),
                                   jnp.int32),
        "object_mask": jnp.asarray(
            (rng.rand(batch_size, image_size, image_size) < 0.5)
            .astype(np.float32)),
        "object_label": jnp.asarray(
            rng.randint(0, num_object_classes, (batch_size,)), jnp.int32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 normalize_images(batch["image"][:1]))

    cluster_fn = jax.jit(make_cluster_fn(cfg))
    out = cluster_fn(params, batch)
    _sync(out["scores"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = cluster_fn(params, batch)
    _sync(out["scores"])
    ips = batch_size * iters / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "stage4_ranking_cluster_images_per_sec_per_chip",
        "value": round(ips, 3), "unit": "images/sec/chip",
        "vs_baseline": round(ips / 5.0, 3),
    }))

    # per-class k-means fit (host loop between cluster and save phases):
    # 10k reservoir features -> k=8 centroids, 20 Lloyd iterations
    feats = jnp.asarray(rng.randn(10000, 256).astype(np.float32))
    fmask = jnp.ones((10000,), bool)
    # ONE dispatch scans 20 fits: the per-dispatch loop measured 6.4-12.1
    # ms/fit across runs (r3 "unexplained 2x variance") because a single fit
    # is ~5 ms of device time and the per-dispatch tunnel RPC (~35 ms
    # enqueue + jitter) dominated — the variance was the WIRE, not the
    # kernel. Scanning M fits per dispatch amortizes the RPC away.
    m = 20

    @jax.jit
    def fit_many(f, keys):
        def body(_, key):
            return None, masked_kmeans(f, fmask, k, key, iters=20)[0]

        return jax.lax.scan(body, None, keys)[1]

    keys = jax.random.split(jax.random.PRNGKey(0), m)
    cents = fit_many(feats, keys)
    _sync(cents)
    t0 = time.perf_counter()
    cents = fit_many(feats, keys)
    _sync(cents)
    per_fit_ms = (time.perf_counter() - t0) / m * 1e3
    print(json.dumps({
        "metric": "stage4_kmeans_fit_ms_per_class",
        "value": round(per_fit_ms, 2),
        "unit": "ms (10k x 256 feats, k=8; 20 fits per dispatch)",
        # sklearn KMeans(n_init=10) on the same workload ~1.5 s/class (CPU)
        "vs_baseline": round(1500.0 / per_fit_ms, 2),
    }))

    centroids = jnp.asarray(
        rng.randn(num_object_classes, k, 256).astype(np.float32))
    label_fn = jax.jit(make_label_fn(cfg, RankingMode.SAVE))
    out = label_fn(params, batch, centroids)
    first = next(iter(out.values()))
    _sync(first)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = label_fn(params, batch, centroids)
    _sync(next(iter(out.values())))
    ips = batch_size * iters / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "stage4_ranking_label_images_per_sec_per_chip",
        "value": round(ips, 3), "unit": "images/sec/chip",
        "vs_baseline": round(ips / 5.0, 3),
    }))


def bench_stage5(batch_size: int = 16, image_size: int = 640,
                 num_object_classes: int = 22000, num_parts: int = 8,
                 iters: int = 10, dtype=jnp.bfloat16):
    """Stage-5 PartDistillation self-training step at the reference's
    production head size: Swin-L 640^2, 9 decoder layers, the
    num_object_classes x num_parts + 1 = 176,001-way gradient-masked part
    classifier (part_distillation_transformer_decoder.py:107), Hungarian
    matching in the sliced 8+1 space, clipped AdamW, trunk frozen like the
    reference launch (sh_files/part_distillation_training/train.sh:8
    freeze_keys='["backbone","encoder"]', batch 256 / 64 V100 = 4 img/GPU).

    Baseline: same 3.0 img/s/V100 trunk estimate as bench.py — the giant head
    adds little compute (the live slice is 9 logits) but, in the reference,
    runs in float64 (:107,237); ours is f32-safe by design (slice-first).

    Batch: bs16/chip (round-4 sweep on the donated onehot step:
    bs8 22.45, bs16 24.75, bs24 24.30 img/s — 16 is the v5e sweet spot;
    the reference ran 4/GPU on V100-32GB)."""
    import optax

    from partdistillation_tpu.engine.optim import OptimizerConfig, build_optimizer
    from partdistillation_tpu.losses.criterion import CriterionConfig
    from partdistillation_tpu.losses.matcher import MatcherConfig
    from partdistillation_tpu.models.meta_arch.part_distillation import (
        PartDistillationConfig, make_loss_fn)
    from partdistillation_tpu.models.meta_arch.proposal import normalize_images
    from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
    from partdistillation_tpu.models.segmenter import (MaskFormerSegmenter,
                                                       SegmenterConfig)
    from partdistillation_tpu.models.swin import swin_large_config
    from partdistillation_tpu.models.transformer_decoder import (
        TransformerDecoderConfig)

    seg = SegmenterConfig(
        swin=swin_large_config(dtype=dtype, **_swin_knobs()),
        # banded MSDA is exact here: the stage-5 launch config freezes
        # backbone+encoder (train.sh:8), so offsets never move (radius 4
        # covers the init cap exactly — PERF.md round-3 radius table)
        pixel_decoder=PixelDecoderConfig(dtype=dtype, msda_mode="banded",
                                         msda_band_radius=4),
        decoder=TransformerDecoderConfig(
            num_classes=num_parts, num_queries=200, dec_layers=9, dtype=dtype,
            num_object_classes=num_object_classes, num_parts=num_parts,
            # production default (run.py): scatter-free head slice — the
            # gather head's scatter-add grad faults the worker under
            # donation (tools/stage5_donation_harness.py, PERF.md round 4)
            head_slice="onehot"),
        freeze_backbone=True,
        freeze_pixel_decoder=True,
    )
    cfg = PartDistillationConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=num_parts, num_points=12544,
                                  # stage-5 launch config also disables
                                  # importance sampling (train.sh:20,42)
                                  importance_sample_ratio=0.0,
                                  matcher=MatcherConfig(num_points=12544)),
        num_parts=num_parts,
    )

    model = MaskFormerSegmenter(seg)
    rng = np.random.RandomState(0)
    t = 8
    batch = {
        "image": jnp.asarray(
            rng.randint(0, 255, (batch_size, image_size, image_size, 3)),
            jnp.float32),
        # f32 masks, not bool: see bench.py (bool layout conversion cost)
        "masks": jnp.asarray(
            (rng.rand(batch_size, t, image_size, image_size) < 0.15)
            .astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, num_parts, (batch_size, t)),
                              jnp.int32),
        "valid": jnp.ones((batch_size, t), bool),
        "gt_object_class": jnp.asarray(
            rng.randint(0, num_object_classes, (batch_size,)), jnp.int32),
    }

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), normalize_images(batch["image"][:1]),
        gt_object_class=batch["gt_object_class"][:1])
    tx = build_optimizer(OptimizerConfig(
        freeze_keys=("backbone", "pixel_decoder"), warmup_iters=0), params)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(cfg)

    # donated, like the production Trainer: safe with the onehot head slice
    # (the round-3 fault was the GATHER head's scatter-add grad under
    # donation — tools/stage5_donation_harness.py, PERF.md round 4)
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, key):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # fresh key per step: identical keys would repeat the dropout/point-
    # sampling noise and make the reported loss stream unrepresentative
    key = jax.random.PRNGKey(1)
    params, opt_state, loss = train_step(params, opt_state, batch, key)
    _sync(loss)
    params, opt_state, loss = train_step(params, opt_state, batch,
                                         jax.random.fold_in(key, 1))
    _sync(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = train_step(params, opt_state, batch,
                                             jax.random.fold_in(key, 2 + i))
    _sync(loss)
    ips = batch_size * iters / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "stage5_part_distillation_train_images_per_sec_per_chip",
        "value": round(ips, 3), "unit": "images/sec/chip",
        "vs_baseline": round(ips / 3.0, 3),
    }))


if __name__ == "__main__":
    import sys

    # "5" intentionally last AND safe alone: the stage-5 program run second
    # in one process crashes the remote TPU worker (PERF.md round 3) —
    # prefer `python bench_stages.py 5` in its own process
    stages = sys.argv[1:] or ["loader", "1", "2", "2b", "4", "5"]
    if "loader" in stages:
        bench_loader()
    if "1" in stages:
        bench_stage1()
    if "2" in stages:
        bench_stage2()
    if "2b" in stages:
        bench_dcrf()
    if "4" in stages:
        bench_stage4()
    if "5" in stages:
        bench_stage5()
