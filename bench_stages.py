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

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def bench_stage2(batch_size: int = 8, image_size: int = 640, iters: int = 8):
    from partdistillation_tpu.models.meta_arch.proposal_generation import (
        ProposalGenerationConfig, make_generation_fn)
    from partdistillation_tpu.models.meta_arch.proposal import normalize_images
    from partdistillation_tpu.models.swin import SwinTransformer, swin_large_config

    cfg = ProposalGenerationConfig(swin=swin_large_config(dtype=jnp.bfloat16))
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


def bench_stage5(batch_size: int = 8, image_size: int = 640,
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
    runs in float64 (:107,237); ours is f32-safe by design (slice-first)."""
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
        swin=swin_large_config(dtype=dtype),
        pixel_decoder=PixelDecoderConfig(dtype=dtype),
        decoder=TransformerDecoderConfig(
            num_classes=num_parts, num_queries=200, dec_layers=9, dtype=dtype,
            num_object_classes=num_object_classes, num_parts=num_parts),
        freeze_backbone=True,
        freeze_pixel_decoder=True,
    )
    cfg = PartDistillationConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=num_parts, num_points=12544,
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

    @jax.jit
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

    stages = sys.argv[1:] or ["2", "2b", "5"]
    if "2" in stages:
        bench_stage2()
    if "2b" in stages:
        bench_dcrf()
    if "5" in stages:
        bench_stage5()
