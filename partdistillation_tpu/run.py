"""Stage CLI: the five-stage PartDistillation pipeline as subcommands.

Replaces the reference's per-stage ``*_train_net.py`` entry points + SLURM
job farms (SURVEY.md §1, §2.7) with one program:

  python -m partdistillation_tpu.run label              # stage 1
  python -m partdistillation_tpu.run propose            # stage 2
  python -m partdistillation_tpu.run dcrf               # stage 2b (on device)
  python -m partdistillation_tpu.run train-proposal     # stage 3
  python -m partdistillation_tpu.run rank               # stage 4 (cluster/save/match/eval)
  python -m partdistillation_tpu.run train-distillation # stage 5
  python -m partdistillation_tpu.run eval-pixel-grouping

Multi-host: every subcommand shards work by jax.process_index() — one
multi-host TPU program subsumes the reference's 40-60-job farms. Resume is
idempotent everywhere (pseudo-label stores skip written ids; trainers restore
the latest Orbax checkpoint).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import Optional

import numpy as np

logger = logging.getLogger("partdistillation_tpu")


# ---------------------------------------------------------------- helpers


def _setup(args) -> "PipelineConfig":
    from .config import PipelineConfig, load_config

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s")
    cfg = load_config(PipelineConfig, getattr(args, "config", None),
                      getattr(args, "set", None))
    # Persistent compilation cache for every stage CLI (bench.py already had
    # this; without it each fresh stage process pays the FULL remote compile
    # — measured 10-18 min per stage over the dev tunnel, bench_pipeline r5).
    # JAX_COMPILATION_CACHE_DIR overrides; resume/restarted jobs reuse it.
    try:
        import jax

        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if not cache:
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            if jax.default_backend() == "cpu":
                # XLA:CPU AOT artifacts are NOT portable across host CPU
                # microarchitectures and their cache key misses the machine
                # features — loading a stale artifact after the repo moves
                # boxes SIGILLs (observed round 5; tests/conftest.py carries
                # the same guard). Key the CPU cache by the host's flags.
                import hashlib
                import platform
                try:
                    with open("/proc/cpuinfo") as f:
                        flags = next((l for l in f if l.startswith("flags")),
                                     platform.machine())
                except OSError:
                    flags = platform.machine() + platform.processor()
                tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
                cache = os.path.join(root, f".jax_cache_cpu_{tag}")
            else:
                cache = os.path.join(root, ".jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as e:  # never block a CLI on cache plumbing
        logger.warning("compilation cache not enabled: %s", e)
    return cfg


def _tiny_swin():
    from .models.swin import SwinConfig

    return SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                      window_size=4, drop_path_rate=0.0)


def _msda(args) -> dict:
    """--msda-mode/--msda-band-radius CLI knobs -> PixelDecoderConfig kwargs.

    mode "banded" is the measured-fastest sampling core when offsets are
    frozen/trained in-band (PERF.md round 3); report msda_band_oob_fraction
    when enabling it on converted weights."""
    kw = {}
    if getattr(args, "msda_mode", None):
        kw["msda_mode"] = args.msda_mode
    if getattr(args, "msda_band_radius", None) is not None:
        kw["msda_band_radius"] = args.msda_band_radius
    return kw


def _segmenter_cfg(tiny: bool, num_classes: int, num_queries: int,
                   num_object_classes: int = 0, num_parts: int = 8,
                   msda: dict = {}, freeze_trunk: bool = False):
    import jax.numpy as jnp

    from .models.pixel_decoder import PixelDecoderConfig
    from .models.segmenter import SegmenterConfig
    from .models.swin import swin_large_config
    from .models.transformer_decoder import TransformerDecoderConfig

    if tiny:
        return SegmenterConfig(
            swin=_tiny_swin(),
            pixel_decoder=PixelDecoderConfig(conv_dim=32, mask_dim=32,
                                             transformer_layers=1,
                                             transformer_ffn_dim=64, n_heads=4,
                                             n_points=2, **msda),
            decoder=TransformerDecoderConfig(
                num_classes=num_classes, hidden_dim=32, num_queries=num_queries,
                num_heads=4, dim_feedforward=64, dec_layers=2, mask_dim=32,
                num_object_classes=num_object_classes, num_parts=num_parts),
            freeze_backbone=freeze_trunk, freeze_pixel_decoder=freeze_trunk,
        )
    # Full-size default = the measured production configuration of record
    # (PERF.md; bench.py; the reference launch configs train_multi.sh:8,33-38):
    # bf16 compute (f32 master weights), banded-radius-4 MSDA (exact for
    # frozen/in-band offsets; msda_band_oob_fraction reports escapes on
    # converted weights — override with --msda-mode/--msda-band-radius).
    # The previous f32+dense default OOM'd a 16 GiB chip at the production
    # bs16 train step (27.7 GB hat intermediate) — caught by bench_pipeline.
    m = {"msda_mode": "banded", "msda_band_radius": 4, **msda}
    bf16 = jnp.bfloat16
    return SegmenterConfig(
        swin=swin_large_config(dtype=bf16),
        pixel_decoder=PixelDecoderConfig(dtype=bf16, **m),
        decoder=TransformerDecoderConfig(
            num_classes=num_classes, num_queries=num_queries, dec_layers=9,
            dtype=bf16,
            num_object_classes=num_object_classes, num_parts=num_parts),
        # stop_gradient (not just a zeroed optimizer update) releases the
        # trunk backward: activations are freed, grads never materialize
        freeze_backbone=freeze_trunk, freeze_pixel_decoder=freeze_trunk,
    )


def _pack_train_batch(batch, mask_keys=("masks",), image_key="image"):
    """Host side of the train-batch wire format: uint8 image + bit-packed
    masks (8x fewer upload bytes; Trainer.batch_prepare unpacks on device)."""
    from .utils.bitpack import pack_bits_np

    out = dict(batch)
    if image_key in out:
        out[image_key] = np.clip(np.asarray(out[image_key]),
                                 0, 255).astype(np.uint8)
    for k in mask_keys:
        if k in out:
            out[k] = pack_bits_np(np.asarray(out[k], bool))
    return out


def _unpack_train_batch(width, mask_keys=("masks",), image_key="image"):
    """Device side (runs inside the compiled step via Trainer.batch_prepare)."""
    import jax.numpy as jnp

    from .utils.bitpack import unpack_bits

    def prepare(batch):
        b = dict(batch)
        if image_key in b:
            b[image_key] = b[image_key].astype(jnp.float32)
        for k in mask_keys:
            if k in b:
                b[k] = unpack_bits(b[k], width)
        return b

    return prepare


def _packed_batches(loader, mask_keys=("masks",), image_key="image"):
    for batch in loader:
        yield _pack_train_batch(batch, mask_keys, image_key)


def _unpack_train_batch_host(batch, width, mask_keys=("masks",),
                             image_key="image"):
    """Host-side inverse of _pack_train_batch (vis overlays read the batch)."""
    from .utils.bitpack import unpack_bits_np

    b = dict(batch)
    if image_key in b and np.asarray(b[image_key]).dtype == np.uint8:
        b[image_key] = np.asarray(b[image_key], np.float32)
    for k in mask_keys:
        arr = b.get(k)
        if arr is not None and np.asarray(arr).dtype == np.uint8:
            b[k] = unpack_bits_np(np.asarray(arr), width)
    return b


class _StageTimer:
    """Uniform per-stage timing: separates the first processed batch (jit
    compile + executable load, which a production run amortizes over hours)
    from the steady-state rate. ``bench_pipeline.py`` consumes these fields
    from every stage's JSON line to report the composite pipeline number."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.t1 = None
        self.n1 = 0
        self.n = 0

    def batch(self, n_images: int):
        self.n += n_images
        if self.t1 is None:
            self.t1 = time.perf_counter()
            self.n1 = self.n

    def stats(self) -> dict:
        t = time.perf_counter()
        total = t - self.t0
        out = {
            "total_s": round(total, 2),
            "images_per_sec": round(self.n / max(total, 1e-9), 3),
            "first_batch_s": round((self.t1 or t) - self.t0, 2),
        }
        if self.t1 is not None and t > self.t1 and self.n > self.n1:
            out["images_per_sec_steady"] = round(
                (self.n - self.n1) / (t - self.t1), 3)
        return out


def _shard_id(args) -> tuple:
    import jax

    if args.shard is not None:
        return args.shard, args.num_shards or 1
    return jax.process_index(), jax.process_count()


def _imagenet_items(cfg, args, object_store: Optional[str] = None):
    from .data.datasets.imagenet import load_imagenet

    shard, num_shards = _shard_id(args)
    return load_imagenet(
        cfg.data.imagenet_root,
        partition_index=shard if num_shards > 1 else None,
        total_partitions=num_shards if num_shards > 1 else None,
        object_mask_store=object_store,
        debug_limit=cfg.data.debug_limit,
        vocab_map=cfg.data.vocab_map or None,
        manifest=cfg.data.manifest or None,
    )


def _graft_params(init_tree, restored_tree):
    """LENIENT warm-start graft: leaves whose path+shape match are taken from
    the checkpoint; everything else keeps its fresh init. Returns
    ``(params, {"grafted": n, "kept_init": m})``."""
    stats = {"grafted": 0, "kept_init": 0}

    def _as_dict(node):
        # FrozenDict / any Mapping from an older checkpoint would fail
        # isinstance(dict) and silently turn the whole tree into one
        # unmatched leaf — normalize to plain dicts first.
        if not isinstance(node, dict) and hasattr(node, "items") \
                and hasattr(node, "keys"):
            return {k: v for k, v in node.items()}
        return node

    def graft(init_node, rest_node, path=""):
        init_node = _as_dict(init_node)
        rest_node = _as_dict(rest_node)
        if isinstance(init_node, dict):
            if not isinstance(rest_node, dict):
                stats["kept_init"] += 1
                return init_node
            return {k: graft(v, rest_node[k], f"{path}/{k}")
                    if k in rest_node else v
                    for k, v in init_node.items()}
        ishape = getattr(init_node, "shape", None)
        rshape = getattr(rest_node, "shape", None)
        if ishape is not None and tuple(ishape) == tuple(rshape or ()):
            stats["grafted"] += 1
            return rest_node
        stats["kept_init"] += 1
        logger.info("warm-start: keeping init for %s (checkpoint shape "
                    "%s vs %s)", path, rshape, ishape)
        return init_node

    return graft(init_tree, restored_tree), stats


def _restore_params(path: Optional[str], init_fn, trainer_dir: Optional[str] = None,
                    torch_path: Optional[str] = None,
                    require_weights: bool = False,
                    allow_random: bool = False):
    """Model params for eval/inference CLIs.

    ``path``: a bare Orbax params checkpoint (StandardCheckpointer layout).
    ``trainer_dir``: a stage Trainer checkpoint dir (CheckpointManager of
    TrainStates) — the latest step's ``params`` subtree is grafted onto the
    freshly-initialized structure. This is how a trained stage-3/5 model is
    fed into the eval entry points (the reference's
    DetectionCheckpointer.resume_or_load at part_proposal_train_net.py:205).
    ``torch_path``: a torch/detectron2 Mask2Former checkpoint (.pth/.pkl) —
    converted through utils/convert_weights onto the initialized structure
    (weights/README.md initial-weights contract).

    ``require_weights``: eval/inference CLIs must not silently run with
    freshly-initialized weights (the reference forces an explicit
    MODEL.WEIGHTS); pass ``allow_random`` (--allow-random-init) to override
    for smoke tests, with a loud warning.
    """
    sources = [s for s in (path, trainer_dir, torch_path) if s]
    if len(sources) > 1:
        raise SystemExit("--params, --trainer-checkpoint and --torch-params "
                         "are mutually exclusive")
    if require_weights and not sources:
        if not allow_random:
            raise SystemExit(
                "this command evaluates/infers with model weights but none were "
                "given — pass --params, --trainer-checkpoint or --torch-params "
                "(or --allow-random-init to knowingly run with random weights)")
        logger.warning("RUNNING WITH RANDOM WEIGHTS (--allow-random-init): "
                       "all outputs/metrics below are meaningless for quality")
    params = init_fn()
    if torch_path:
        from .utils.convert_weights import (convert_mask2former_state_dict,
                                            load_torch_checkpoint)

        sd = load_torch_checkpoint(torch_path)
        params, unmatched = convert_mask2former_state_dict(sd, template=params)
        logger.info("converted torch checkpoint %s (%d unmatched keys)",
                    torch_path, len(unmatched))
        if unmatched:
            logger.info("unmatched torch keys (first 10): %s", unmatched[:10])
    elif path:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        params = ckpt.restore(os.path.abspath(path), params)
        logger.info("restored params from %s", path)
    elif trainer_dir:
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(trainer_dir))
        latest = mgr.latest_step()
        if latest is None:
            raise SystemExit(f"no trainer checkpoint found in {trainer_dir}")
        restored = mgr.restore(latest)["params"]
        # LENIENT graft: leaves whose path+shape match are taken from the
        # checkpoint; everything else keeps its fresh init. This is what
        # makes cross-stage warm-starts work (e.g. train-distillation from
        # the trained stage-3 proposal model: same trunk/decoder, but the
        # giant part-classifier head only exists in stage 5) — the
        # reference's MODEL.WEIGHTS + detectron2 shape-mismatch-skip
        # behavior.
        params, stats = _graft_params(params, restored)
        logger.info("restored trainer params from %s step %d "
                    "(%d leaves grafted, %d kept init)",
                    trainer_dir, latest, stats["grafted"], stats["kept_init"])
        if stats["grafted"] == 0:
            # A zero-leaf warm-start is almost certainly operator error (wrong
            # --trainer-checkpoint path contents / incompatible checkpoint):
            # every leaf silently keeping its fresh init would "train" from
            # scratch while claiming to warm-start.
            raise SystemExit(
                f"warm-start from {trainer_dir} grafted 0 leaves — the "
                "checkpoint does not match this model at any leaf; refusing "
                "to continue with a fully fresh init")
    return params


def _save_params(path: str, params):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params, force=True)
    ckpt.wait_until_finished()



def _fit_mesh(batch_size: int, n_model: int = 1):
    """Data-axis size = gcd(devices/n_model, per-host batch) so the batch
    shards evenly; leftover devices idle rather than erroring (loudly)."""
    import math

    import jax

    from .parallel.mesh import make_mesh

    n_avail = max(len(jax.devices()) // max(n_model, 1), 1)
    n_data = math.gcd(n_avail, batch_size) or 1
    used = n_data * max(n_model, 1)
    if used < len(jax.devices()):
        logger.warning(
            "mesh uses %d of %d devices (data=%d x model=%d): batch_size=%d "
            "does not divide the device count — %d device(s) IDLE; pick a "
            "batch size divisible by %d to use the full chip count",
            used, len(jax.devices()), n_data, max(n_model, 1), batch_size,
            len(jax.devices()) - used, n_avail)
    return make_mesh(n_data=n_data, n_model=n_model)


# ---------------------------------------------------------------- eval datasets


def _eval_catalog(cfg, args):
    """DatasetCatalog of the GT part-evaluation datasets — the reference's
    TEST-set wiring (part_ranking_train_net.py TEST lists;
    sh_files/supervised_learning/semseg/pascal.sh:6-33), with the
    registrar-style name->loader indirection of register_*.py replaced by an
    explicit process-local catalog (data/catalog.py). Loaders are lazy; the
    per-dataset eval contract (mapper kwargs, part/object class counts)
    rides Metadata.extra."""
    from .data.catalog import DatasetCatalog, Metadata

    cat = DatasetCatalog()

    def load_pi():
        from .data.datasets.part_imagenet import load_part_imagenet

        return load_part_imagenet(cfg.data.part_imagenet_json,
                                  cfg.data.part_imagenet_images,
                                  debug_limit=cfg.data.debug_limit)

    cat.register("part_imagenet", load_pi, Metadata(
        name="part_imagenet",
        extra={"mapper_kwargs": {},
               "n_gt_parts": getattr(args, "num_gt_parts", 40),
               "num_obj_classes": None}))

    def load_pascal():
        from .data.datasets.pascal_parts import load_pascal_parts
        from .data.mappers import PartEvalMapper

        raw = load_pascal_parts(cfg.data.pascal_parts_annotations,
                                cfg.data.pascal_parts_images,
                                debug_limit=cfg.data.debug_limit)
        vocab = PartEvalMapper.pascal_vocab(raw)
        class_names = sorted({o["class_name"] for it in raw for o in it["objects"]})
        cid = {c: i for i, c in enumerate(class_names)}
        items = []
        for it in raw:
            by_cls = {}
            for o in it["objects"]:
                by_cls.setdefault(o["class_name"], []).append(o)
            for cname, objs in sorted(by_cls.items()):
                entry = {k: v for k, v in it.items() if k != "objects"}
                entry.update(image_id=f"{it['image_id']}:{cname}",
                             objects=objs, class_id=cid[cname])
                items.append(entry)
        md = cat.get("pascal").metadata
        md.class_names = class_names
        md.extra.update(mapper_kwargs={"part_vocab": vocab},
                        n_gt_parts=max(len(vocab), 1),
                        num_obj_classes=len(class_names))
        return items

    # pascal's part vocabulary / class counts come from parsing the .mat
    # annotations, so its metadata.extra is POPULATED BY THE LOADER — call
    # spec.items() before reading it (None values mark the unloaded state)
    cat.register("pascal", load_pascal, Metadata(
        name="pascal", extra={"mapper_kwargs": None, "n_gt_parts": None,
                              "num_obj_classes": None}))

    def load_cs():
        from .data.datasets.cityscapes_part import (
            CITYSCAPES_PART_SIDS, load_cityscapes_part)

        raw = load_cityscapes_part(cfg.data.cityscapes_part_labels,
                                   cfg.data.cityscapes_images,
                                   debug_limit=cfg.data.debug_limit)
        sids = sorted(CITYSCAPES_PART_SIDS)
        return [dict(it, image_id=f"{it['image_id']}:{s}", sid=s, class_id=i)
                for it in raw for i, s in enumerate(sids)]

    from .data.datasets.cityscapes_part import (
        CITYSCAPES_NUM_PART_CLASSES, CITYSCAPES_PART_SIDS)

    cat.register("cityscapes", load_cs, Metadata(
        name="cityscapes",
        extra={"mapper_kwargs": {},
               "n_gt_parts": CITYSCAPES_NUM_PART_CLASSES,
               "num_obj_classes": len(CITYSCAPES_PART_SIDS)}))
    return cat


def _load_eval_items(cfg, args) -> dict:
    """``--eval-dataset`` switch shared by the eval CLIs.

    Returns {name, items, mapper_kwargs, n_gt_parts, num_obj_classes}. Items
    carry a dataset-local ``class_id`` for pascal/cityscapes (one item per
    (image, object class), the per-object-class confusion keying of
    register_pascal_parts.py:45 / cityscapes_part_mapper.py:59-63);
    part_imagenet items keep their synset ``class_code`` (mapped to the
    imagenet vocabulary by the caller when a bank index is needed).
    """
    name = getattr(args, "eval_dataset", "part_imagenet")
    cat = _eval_catalog(cfg, args)
    if name not in cat:
        raise SystemExit(f"unknown --eval-dataset {name!r} "
                         f"(choose one of {', '.join(cat.names())})")
    spec = cat.get(name)
    items = spec.items()  # may fill metadata.extra (pascal vocab)
    return {"name": name, "items": items, **spec.metadata.extra}


def _assign_eval_class_ids(cfg, ds: dict, num_obj: int) -> list:
    """Give every eval item an object-class id indexing the model's per-class
    state (centroid bank / vote mapping / giant head).

    part_imagenet: synset codes -> the ImageNet-root GLOBAL vocabulary (the
    ids the bank was built with); out-of-vocabulary items are dropped.
    pascal/cityscapes: items already carry dataset-local ids (the reference
    runs its modal pipeline per dataset with local category ids).
    """
    items = ds["items"]
    if ds["name"] != "part_imagenet":
        n_local = ds["num_obj_classes"] or 1
        if n_local > num_obj:
            raise SystemExit(
                f"{ds['name']} has {n_local} object classes but the model bank "
                f"covers {num_obj}; re-run the cluster/train phase on this "
                "dataset or raise --num-object-classes")
        return items

    from .data.datasets.imagenet import global_code_to_id

    try:
        code_to_id = global_code_to_id(cfg.data.imagenet_root, cfg.data.vocab_map or None, cfg.data.manifest or None)
    except FileNotFoundError:
        code_to_id = {}
    if not code_to_id:
        logger.warning("imagenet_root unavailable; falling back to eval-local "
                       "class ids (only valid if the eval set's sorted codes "
                       "match the training vocabulary)")
        codes = sorted({it["class_code"] for it in items})
        code_to_id = {c: i for i, c in enumerate(codes)}
    n_before = len(items)
    items = [it for it in items
             if code_to_id.get(it["class_code"], num_obj) < num_obj]
    if len(items) < n_before:
        logger.warning("eval: dropped %d items outside the %d-class object "
                       "vocabulary", n_before - len(items), num_obj)
    for it in items:
        it["class_id"] = code_to_id[it["class_code"]]
    return items


# ---------------------------------------------------------------- stage 1


def cmd_label(args):
    cfg = _setup(args)
    from .data.pseudo_store import ShardWriter
    from .models.meta_arch.labeling import (
        LabelingConfig, precomputed_detector, run_labeling)

    items = _imagenet_items(cfg, args)
    shard, num_shards = _shard_id(args)
    detector = precomputed_detector(args.detections)
    writer = ShardWriter(cfg.paths.object_labels, shard, num_shards)
    stats = run_labeling(detector, items, writer,
                         LabelingConfig(topk=args.topk,
                                        score_threshold=args.score_threshold,
                                        match_classes=not args.no_class_match))
    writer.close()
    print(json.dumps({"stage": "label", **stats}))


def cmd_detect(args):
    """Stage 1 from PIXELS: class-agnostic segmenter mask proposals +
    optional CLIP open-vocabulary region scoring, written to the stage-1
    object-labels store. The in-framework replacement for the reference's
    external Detic detector (labeling_detic.py:25-119; Detic itself is a
    dangling symlink in the reference repo — here the detector is the
    Mask2Former trunk, typically with --torch-params COCO weights or a
    stage-3 trainer checkpoint)."""
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.pseudo_store import ShardWriter
    from .models.meta_arch.labeling import (
        LabelingConfig, clip_region_scorer, make_proposal_detection_fn,
        run_labeling_batched)
    from .models.meta_arch.proposal import ProposalModelConfig, normalize_images
    from .models.segmenter import MaskFormerSegmenter

    items = _imagenet_items(cfg, args)
    shard, num_shards = _shard_id(args)

    seg = _segmenter_cfg(args.tiny, msda=_msda(args), num_classes=1, num_queries=args.num_queries)
    model_cfg = ProposalModelConfig(
        segmenter=seg, test_topk=min(args.proposals, args.num_queries))
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(jax.random.PRNGKey(cfg.seed),
                                    normalize_images(jnp.zeros((1, size, size, 3)))),
        trainer_dir=args.trainer_checkpoint,
        torch_path=getattr(args, "torch_params", None),
        require_weights=True, allow_random=args.allow_random_init)

    scorer = None
    if args.clip_model:
        from .data.datasets.imagenet import global_code_to_id, read_class_names
        from .models.meta_arch.labeling import clip_region_scorer_tpu

        code_to_id = global_code_to_id(cfg.data.imagenet_root, cfg.data.vocab_map or None, cfg.data.manifest or None)
        names = read_class_names(cfg.data.imagenet_root)
        vocab = [names.get(c, c) for c in sorted(code_to_id)]
        if args.clip_backend == "torch":
            scorer = clip_region_scorer(args.clip_model, vocab)
        else:  # device-side vision tower (models/clip_vit)
            scorer = clip_region_scorer_tpu(args.clip_model, vocab)
        logger.info("CLIP region scorer (%s) over %d classes",
                    args.clip_backend, len(vocab))

    detection_fn = jax.jit(make_proposal_detection_fn(model_cfg))
    writer = ShardWriter(cfg.paths.object_labels, shard, num_shards)
    stats = run_labeling_batched(
        detection_fn, params, items, writer,
        LabelingConfig(topk=args.topk, score_threshold=args.score_threshold,
                       match_classes=scorer is not None and not args.no_class_match),
        region_scorer=scorer, image_size=size,
        batch_size=cfg.data.batch_size, num_workers=cfg.data.num_workers)
    writer.close()
    print(json.dumps({"stage": "detect", **stats}))


def cmd_eval_detect(args):
    """Stage-1 detection quality: AR@k of the `detect` path's object-mask
    proposals against OBJECT ground truth (PartImageNet object instances /
    Pascal object silhouettes) — the first measurement of the
    Detic-replacement claim (reference stage-1: labeling_detic.py:57-119,
    which the reference never scores either; its Detic is an external
    dependency)."""
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data.loader import batch_iterator
    from .data.mappers import PartEvalMapper
    from .evaluation.proposal_evaluator import ProposalEvaluator
    from .models.meta_arch.labeling import make_proposal_detection_fn
    from .models.meta_arch.proposal import ProposalModelConfig, normalize_images
    from .models.segmenter import MaskFormerSegmenter

    ds = _load_eval_items(cfg, args)
    seg = _segmenter_cfg(args.tiny, msda=_msda(args), num_classes=1, num_queries=args.num_queries)
    model_cfg = ProposalModelConfig(
        segmenter=seg, test_topk=min(args.topk, args.num_queries))
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(jax.random.PRNGKey(cfg.seed),
                                    normalize_images(jnp.zeros((1, size, size, 3)))),
        trainer_dir=args.trainer_checkpoint,
        torch_path=getattr(args, "torch_params", None),
        require_weights=True, allow_random=args.allow_random_init)

    detection_fn = jax.jit(make_proposal_detection_fn(model_cfg))
    mapper = PartEvalMapper(image_size=size, capacity=16,
                            merge_parts_by_class=False, **ds["mapper_kwargs"])
    limits = tuple(l for l in (1, 10, 50, 100) if l <= model_cfg.test_topk)
    evaluator = ProposalEvaluator(limits=limits or (model_cfg.test_topk,),
                                  distributed=jax.process_count() > 1)
    for batch in batch_iterator(ds["items"], mapper, cfg.data.batch_size,
                                num_workers=cfg.data.num_workers):
        out = detection_fn(params, jnp.asarray(batch["image"]))
        bv = batch["batch_valid"]
        # GT = the object silhouette, one instance per image
        gt = batch["object_mask"][:, None]
        gt_valid = gt.reshape(gt.shape[0], 1, -1).any(-1)
        evaluator.process(
            {"pred_masks": np.asarray(out["masks"])[bv],
             "scores": np.asarray(out["scores"])[bv],
             "valid": np.asarray(out["valid"])[bv]},
            gt[bv], gt_valid[bv])
    metrics = evaluator.evaluate()
    from .engine.metrics import print_csv_format

    print_csv_format(metrics, task="eval-detect")
    print(json.dumps({"stage": "eval-detect", "dataset": ds["name"],
                      **metrics}))


# ---------------------------------------------------------------- stage 2


def cmd_propose(args):
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.loader import batch_iterator
    from .data.mappers import ProposalGenerationMapper
    from .data.pseudo_store import ShardWriter, mark_shard_complete
    from .models.meta_arch.proposal import normalize_images
    from .models.meta_arch.proposal_generation import (
        ProposalGenerationConfig, make_generation_fn)
    from .models.swin import SwinTransformer, swin_large_config
    from .utils import rle as rle_codec

    shard, num_shards = _shard_id(args)
    items = _imagenet_items(cfg, args, object_store=cfg.paths.object_labels)
    writer = ShardWriter(cfg.paths.proposals, shard, num_shards)
    items = [it for it in items if it["image_id"] not in writer]
    logger.info("stage 2: %d images to process", len(items))

    gen_cfg = ProposalGenerationConfig(
        swin=_tiny_swin() if args.tiny
        else swin_large_config(dtype=jnp.bfloat16),
        num_clusters=args.num_clusters)
    backbone = SwinTransformer(gen_cfg.swin)
    size = cfg.data.image_size

    # wire format (PERF.md round-5): uint8 image up, bit-packed masks both
    # ways — unpack/pack INSIDE the jit; ~12x fewer host<->device bytes
    from .utils.bitpack import pack_bits, pack_bits_np, unpack_bits, unpack_bits_np

    raw_gen_fn = make_generation_fn(gen_cfg)

    def _gen_wire(params, wire, key):
        out = dict(raw_gen_fn(params, {
            "image": wire["image_u8"].astype(jnp.float32),
            "object_mask": unpack_bits(wire["object_mask_p"], size)}, key))
        out["part_masks"] = pack_bits(out["part_masks"])
        return out

    gen_fn = jax.jit(_gen_wire)
    params = _restore_params(
        args.params,
        lambda: jax.jit(backbone.init)(
            jax.random.PRNGKey(cfg.seed),
            normalize_images(jnp.zeros((1, size, size, 3)))),
        torch_path=getattr(args, "torch_params", None),
        require_weights=True, allow_random=args.allow_random_init)

    mapper = ProposalGenerationMapper(image_size=size)
    n_saved, n_batches, timer = 0, 0, _StageTimer()
    t0 = timer.t0
    for batch in batch_iterator(items, mapper, cfg.data.batch_size,
                                num_workers=cfg.data.num_workers):
        out = gen_fn(params, {
            "image_u8": jnp.asarray(
                np.clip(batch["image"], 0, 255).astype(np.uint8)),
            "object_mask_p": jnp.asarray(pack_bits_np(batch["object_mask"]))},
            jax.random.PRNGKey(n_batches))
        masks = unpack_bits_np(np.asarray(out["part_masks"]), size)
        valid = np.asarray(out["part_valid"])
        ratio = np.asarray(out["object_ratio"])
        for b in range(masks.shape[0]):
            if not batch["batch_valid"][b]:
                continue
            rles = [rle_codec.encode(masks[b, k]) for k in range(masks.shape[1])
                    if valid[b, k]]
            if not rles:
                continue
            n_saved += int(writer.write({
                "image_id": str(batch["image_id"][b]),
                "part_masks": rles,
                "object_ratio": float(ratio[b]),
                "object_class": int(batch["class_id"][b]),
            }))
        n_batches += 1
        timer.batch(int(np.sum(batch["batch_valid"])))
        if n_batches % 20 == 0:
            writer.flush()
            ips = n_saved / (time.perf_counter() - t0)
            logger.info("stage 2: %d saved (%.2f img/s)", n_saved, ips)
    writer.close()
    # completion marker: lets `dcrf --watch` (running concurrently, the
    # reference's continuously_postprocess_dcrf job shape) terminate once
    # every propose shard is done and drained
    mark_shard_complete(cfg.paths.proposals, shard, num_shards)
    print(json.dumps({"stage": "propose", "saved": n_saved, **timer.stats()}))


# ---------------------------------------------------------------- stage 2b


def cmd_dcrf(args):
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.loader import batch_iterator
    from .data.mappers import PartRankingMapper
    from .data.datasets.imagenet import load_imagenet_with_proposals
    from .data.pseudo_store import ShardWriter, store_complete
    from .ops.dense_crf import DenseCRFParams, dense_crf, unary_from_masks
    from .utils import rle as rle_codec

    shard, num_shards = _shard_id(args)
    base = _imagenet_items(cfg, args)
    writer = ShardWriter(cfg.paths.proposals_dcrf, shard, num_shards)

    params = DenseCRFParams(gt_prob=args.gt_prob, iters=args.iters,
                            bilateral_sxy=args.bilateral_sxy,
                            bilateral_stride=args.bilateral_stride)
    capacity = cfg.data.mask_capacity

    def refine(image, masks, valid):
        unary = unary_from_masks(masks, valid, params.gt_prob)
        q = dense_crf(image, unary, params)
        label = jnp.argmax(q, axis=-1)
        refined = label[None, :, :] == (1 + jnp.arange(capacity)[:, None, None])
        return refined, jnp.any(refined, axis=(1, 2)) & valid

    # wire format: uint8 image up, masks bit-packed both directions (the
    # bool wire measured 2.9 img/s e2e vs 38 on-device — bench_pipeline r5)
    from .utils.bitpack import pack_bits, pack_bits_np, unpack_bits, unpack_bits_np

    size = cfg.data.image_size

    def _refine_wire(image_u8, masks_p, valid):
        refined, v = jax.vmap(refine)(image_u8.astype(jnp.float32),
                                      unpack_bits(masks_p, size), valid)
        return pack_bits(refined), v

    refine_fn = jax.jit(_refine_wire)
    mapper = PartRankingMapper(image_size=cfg.data.image_size, capacity=capacity)

    # images whose refinement produced no surviving mask leave no record
    # (downstream joins skip them anyway); remember them so --watch rescans
    # don't redo the same dCRF forever
    refined_empty: set = set()

    def one_pass() -> int:
        """Scan the upstream store and refine everything not yet written."""
        from .data.mappers import invalidate_store_cache

        # the mapper-side store cache must see late-arriving shards
        invalidate_store_cache(cfg.paths.proposals)
        items = load_imagenet_with_proposals(base, cfg.paths.proposals)
        items = [it for it in items if it["image_id"] not in writer
                 and it["image_id"] not in refined_empty]
        if not items:
            return 0
        logger.info("stage 2b dCRF: %d images", len(items))
        n_saved, n_batches = 0, 0
        for batch in batch_iterator(items, mapper, cfg.data.batch_size,
                                    num_workers=cfg.data.num_workers):
            refined, valid = refine_fn(
                jnp.asarray(np.clip(batch["image"], 0, 255).astype(np.uint8)),
                jnp.asarray(pack_bits_np(batch["part_masks"])),
                jnp.asarray(batch["part_valid"]))
            refined = unpack_bits_np(np.asarray(refined), size)
            valid = np.asarray(valid)
            timer.batch(int(np.sum(batch["batch_valid"])))
            for b in range(refined.shape[0]):
                if not batch["batch_valid"][b]:
                    continue
                rles = [rle_codec.encode(refined[b, k]) for k in range(capacity)
                        if valid[b, k]]
                if not rles:
                    refined_empty.add(str(batch["image_id"][b]))
                    continue
                union = refined[b][valid[b]].any(0)
                n_saved += int(writer.write({
                    "image_id": str(batch["image_id"][b]),
                    "part_masks": rles,
                    "object_ratio": float(union.mean()),
                    "object_class": int(batch["class_id"][b]),
                }))
            n_batches += 1
            if n_batches % 20 == 0:
                writer.flush()
        writer.flush()
        return n_saved

    # --watch: run concurrently with stage 2, like the reference's dCRF
    # worker farm (continuously_postprocess_dcrf.py:121-127 `while True` +
    # skip-if-done) — but with a termination protocol: exit once every
    # upstream propose shard has dropped its completion marker and a final
    # rescan finds nothing new.
    n_saved, timer = 0, _StageTimer()
    while True:
        n_saved += one_pass()
        if not args.watch:
            break
        if store_complete(cfg.paths.proposals):
            # upstream writers close (flush) before dropping their markers,
            # so one final drain pass sees every record
            n_saved += one_pass()
            logger.info("stage 2b dCRF --watch: upstream complete and "
                        "drained; exiting")
            break
        time.sleep(args.watch_interval)
    writer.close()
    print(json.dumps({"stage": "dcrf", "saved": n_saved, **timer.stats()}))


# ---------------------------------------------------------------- training


def _make_vis_fn(model, vis_dir: str, needs_object_class: bool = False,
                 topk: int = 6, max_images: int = 4):
    """In-train overlay snapshots (the reference's VIS_PERIOD path,
    proposal_model.py:198-211, 451-475): predicted top-k masks (left) next to
    the GT/pseudo-label masks (right) for the first images of the live train
    batch, saved as one collage PNG per visualization step."""
    import jax
    import jax.numpy as jnp

    from .models.meta_arch.proposal import normalize_images
    from .utils.visualize import make_collage, overlay_masks, save_image

    os.makedirs(vis_dir, exist_ok=True)

    @jax.jit
    def predict(params, images, gt_object_class):
        kwargs = {"gt_object_class": gt_object_class} if needs_object_class else {}
        out = model.apply(params, normalize_images(images), **kwargs)
        probs = jax.nn.softmax(out["pred_logits"], axis=-1)[..., :-1].max(-1)
        scores, idx = jax.lax.top_k(probs, topk)
        masks = jnp.take_along_axis(out["pred_masks"], idx[:, :, None, None],
                                    axis=1)
        h, w = images.shape[1:3]
        masks = jax.vmap(
            lambda m: jax.image.resize(m, (topk, h, w), "linear"))(masks)
        return masks > 0.0, scores

    def vis_fn(params, batch, step):
        n = min(max_images, len(batch["image"]))
        images = np.asarray(batch["image"][:n])
        goc = jnp.asarray(np.asarray(
            batch.get("gt_object_class", np.zeros(len(batch["image"]))),
            np.int32))[:n]
        masks, _ = predict(params, jnp.asarray(images), goc)
        masks = np.asarray(masks)
        gt = batch.get("masks", batch.get("part_masks"))
        gt_valid = batch.get("valid", batch.get("part_valid"))
        panels = []
        for i in range(n):
            panels.append(overlay_masks(images[i], masks[i]))
            if gt is not None:
                panels.append(overlay_masks(
                    images[i], np.asarray(gt[i]) > 0.5,
                    valid=np.asarray(gt_valid[i]) > 0))
        save_image(os.path.join(vis_dir, f"step_{step:06d}.png"),
                   make_collage(panels, cols=2))

    return vis_fn


def _train_loop(cfg, trainer, loader, stage: str, eval_fn=None, vis_fn=None):
    """Hot loop + periodic held-out evaluation (TEST.EVAL_PERIOD parity:
    ``eval_fn(params) -> metrics`` runs every ``cfg.eval_every`` steps and its
    scalars land in metrics.jsonl under ``eval/``) + periodic train-batch
    overlay snapshots (VIS_PERIOD parity: ``vis_fn(params, batch, step)``
    every ``cfg.vis_every`` steps)."""
    from .engine.metrics import MetricLogger

    mlog = MetricLogger(os.path.join(cfg.checkpoint_dir, "logs", stage),
                        run_name=stage)
    t0 = time.perf_counter()
    n_img = 0
    timer = _StageTimer()
    for batch in loader:
        batch = {k: v for k, v in batch.items() if k != "image_id"}
        metrics = trainer.train_step(batch)
        if timer.t1 is None:
            # scalar readback: the only true sync over the axon tunnel
            # (PERF.md round-1 finding) — charge compile+load to first_batch_s
            float(np.asarray(metrics["total_loss"]).ravel()[0])
        timer.batch(int(np.asarray(batch["batch_valid"]).sum()))
        if (vis_fn is not None and cfg.vis_every > 0
                and trainer.step % cfg.vis_every == 0):
            vis_fn(trainer.state.params,
                   _unpack_train_batch_host(batch, cfg.data.image_size),
                   trainer.step)
        n_img += int(np.asarray(batch["batch_valid"]).sum())
        step = trainer.step
        if step % cfg.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            ips = n_img / (time.perf_counter() - t0)
            logger.info("%s step %d: loss=%.4f grad=%.3f %.2f img/s",
                        stage, step, m.get("total_loss", float("nan")),
                        m.get("grad_norm", float("nan")), ips)
            if os.environ.get("PD_DEBUG_JIT"):
                # retrace debugging: a growing cache means the batch arg
                # signature is unstable and every step re-traces/reloads
                try:
                    logger.info("jit cache size: %s",
                                trainer._step_fn._cache_size())
                except Exception:
                    pass
            mlog.log({**m, "images_per_sec": ips}, step)
        if eval_fn is not None and cfg.eval_every > 0 and step % cfg.eval_every == 0:
            emetrics = eval_fn(trainer.state.params)
            emetrics = {f"eval/{k}": float(v) for k, v in (emetrics or {}).items()
                        if isinstance(v, (int, float, np.floating))}
            logger.info("%s step %d eval: %s", stage, step, emetrics)
            mlog.log(emetrics, step)
        if trainer._ckpt is not None and step % cfg.checkpoint_every == 0:
            trainer.save()
        if step >= cfg.max_iters:
            break
    # close the measurement window with a true sync (scalar readback) before
    # reading the clock — block_until_ready returns early over the tunnel
    try:
        float(np.asarray(metrics["total_loss"]).ravel()[0])
    except (NameError, KeyError):
        pass
    stats = timer.stats()
    if trainer._ckpt is not None:
        trainer.save()
    mlog.close()
    return {"steps": trainer.step,
            "images_per_sec": round(n_img / max(time.perf_counter() - t0, 1e-9), 3),
            **{k: v for k, v in stats.items() if k != "images_per_sec"}}


def cmd_train_proposal(args):
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.datasets.imagenet import load_imagenet_with_proposals
    from .data.loader import DataLoader
    from .data.mappers import ProposalTrainMapper
    from .engine.optim import OptimizerConfig
    from .engine.trainer import Trainer
    from .losses.criterion import CriterionConfig
    from .losses.matcher import MatcherConfig
    from .models.meta_arch.proposal import (ProposalModelConfig, make_loss_fn,
                                            normalize_images)
    from .models.segmenter import MaskFormerSegmenter
    # _imagenet_items already class-partitions by process — no host_shard on
    # top (double-sharding would drop (N-1)/N of each host's partition).
    base = _imagenet_items(cfg, args)
    items = load_imagenet_with_proposals(base, cfg.paths.proposals_dcrf
                                         if not args.raw_proposals
                                         else cfg.paths.proposals)
    logger.info("stage 3: %d train items on this host", len(items))

    seg = _segmenter_cfg(args.tiny, msda=_msda(args), num_classes=1,
                         num_queries=args.num_queries,
                         freeze_trunk=args.freeze_trunk)
    n_pts = 1024 if args.tiny else 12544
    model_cfg = ProposalModelConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=1, num_points=n_pts,
                                  importance_sample_ratio=0.0,
                                  matcher=MatcherConfig(num_points=n_pts)))
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(jax.random.PRNGKey(cfg.seed),
                                    normalize_images(jnp.zeros((1, size, size, 3)))),
        # warm-start from another stage's Trainer checkpoint (the reference's
        # MODEL.WEIGHTS contract); this run's OWN checkpoints still win via
        # trainer.resume_or_load() below
        trainer_dir=args.trainer_checkpoint,
        torch_path=getattr(args, "torch_params", None))

    mesh = _fit_mesh(cfg.data.batch_size)
    trainer = Trainer(
        loss_fn=make_loss_fn(model_cfg),
        init_params=params,
        optimizer_cfg=OptimizerConfig(
            freeze_keys=("backbone", "pixel_decoder") if args.freeze_trunk else (),
            max_iter=cfg.max_iters),
        mesh=mesh,
        checkpoint_dir=os.path.join(cfg.checkpoint_dir, "proposal"),
        seed=cfg.seed,
        # wire format: masks upload bit-packed + image uint8 (see
        # _pack_train_batch); unpacked on device inside the compiled step
        batch_prepare=_unpack_train_batch(cfg.data.image_size))
    trainer.resume_or_load()

    mapper = ProposalTrainMapper(image_size=size, capacity=cfg.data.mask_capacity,
                                 seed=cfg.seed)
    loader = DataLoader(items, mapper, cfg.data.batch_size, shuffle=True,
                        seed=cfg.seed, epochs=None,
                        num_workers=cfg.data.num_workers, drop_last=True)
    eval_fn = None
    if cfg.eval_every > 0:
        import dataclasses as _dc

        ds = _load_eval_items(cfg, args)
        infer_cfg = _dc.replace(
            model_cfg, test_topk=min(model_cfg.test_topk, args.num_queries))
        eval_fn = lambda p: _proposal_ar_eval(cfg, args, infer_cfg, p, ds)  # noqa: E731
    vis_fn = (_make_vis_fn(model, os.path.join(cfg.checkpoint_dir, "logs",
                                               "train-proposal", "vis"))
              if cfg.vis_every > 0 else None)
    stats = _train_loop(cfg, trainer, _packed_batches(loader), "train-proposal",
                        eval_fn=eval_fn, vis_fn=vis_fn)
    print(json.dumps({"stage": "train-proposal", **stats}))


def cmd_train_distillation(args):
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.datasets.imagenet import load_imagenet_with_segmentation
    from .data.loader import DataLoader
    from .data.mappers import PartDistillationTrainMapper
    from .engine.optim import OptimizerConfig
    from .engine.trainer import Trainer
    from .losses.criterion import CriterionConfig
    from .losses.matcher import MatcherConfig
    from .models.meta_arch.part_distillation import (PartDistillationConfig,
                                                     make_loss_fn)
    from .models.meta_arch.proposal import normalize_images
    from .models.segmenter import MaskFormerSegmenter
    # _imagenet_items already class-partitions by process (see stage 3 note)
    base = _imagenet_items(cfg, args)
    items = load_imagenet_with_segmentation(base, cfg.paths.part_masks_with_class)
    logger.info("stage 5: %d train items on this host", len(items))

    num_obj = args.num_object_classes
    seg = _segmenter_cfg(args.tiny, msda=_msda(args), num_classes=args.num_parts,
                         num_queries=args.num_queries,
                         num_object_classes=num_obj, num_parts=args.num_parts,
                         # reference stage-5 launch config freezes backbone +
                         # encoder too (train.sh:8)
                         freeze_trunk=args.freeze_trunk)
    if cfg.n_model_shards <= 1:
        import dataclasses as _dc

        # unsharded giant head: the gather formulation's scatter-add backward
        # faults the TPU worker under donation (reproduced r3+r4,
        # tools/repro_donation_fault.py); the scatter-free onehot slice is
        # crash-free WITH donation at identical speed (PERF.md round 4)
        seg = _dc.replace(seg, decoder=_dc.replace(seg.decoder,
                                                   head_slice="onehot"))
    # a leftover PD_HEAD_SLICE=gather from an A/B session would silently
    # reinstate the donation scatter-add kernel fault (the env var wins at
    # trace time, transformer_decoder.py head()); fall back to donate=False
    # for that configuration instead of crashing the worker
    _env_slice = os.environ.get("PD_HEAD_SLICE")
    _donate = not (cfg.n_model_shards <= 1 and _env_slice == "gather")
    if not _donate:
        logger.warning(
            "PD_HEAD_SLICE=gather with an unsharded giant head: disabling "
            "state donation to dodge the known scatter-add donation fault "
            "(PERF.md round 4); unset PD_HEAD_SLICE for the fast path")
    n_pts = 1024 if args.tiny else 12544
    model_cfg = PartDistillationConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=args.num_parts, num_points=n_pts,
                                  # reference stage-5 launch config disables
                                  # importance sampling (train.sh:20,42) —
                                  # ratio 0 resolves point_mode to the exact
                                  # gather-free jittered grid; the 0.75
                                  # default's random-point path costs ~5 s/
                                  # step at production geometry (the round-3
                                  # stage-5 finding, which the CLI had
                                  # re-introduced — caught by bench_pipeline,
                                  # PERF.md round 5)
                                  importance_sample_ratio=0.0,
                                  matcher=MatcherConfig(num_points=n_pts)),
        num_parts=args.num_parts)
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(
            jax.random.PRNGKey(cfg.seed),
            normalize_images(jnp.zeros((1, size, size, 3))),
            gt_object_class=jnp.zeros((1,), jnp.int32)),
        # warm-start e.g. from the trained stage-3 proposal model; size-
        # mismatched heads (stage-5's part classifier) keep their init
        trainer_dir=args.trainer_checkpoint,
        torch_path=getattr(args, "torch_params", None))

    from .parallel.mesh import giant_head_rule

    mesh = _fit_mesh(cfg.data.batch_size, n_model=cfg.n_model_shards)
    trainer = Trainer(
        loss_fn=make_loss_fn(model_cfg),
        init_params=params,
        optimizer_cfg=OptimizerConfig(
            freeze_keys=("backbone", "pixel_decoder") if args.freeze_trunk
            else (),
            max_iter=cfg.max_iters),
        mesh=mesh,
        checkpoint_dir=os.path.join(cfg.checkpoint_dir, "part_distillation"),
        seed=cfg.seed,
        batch_prepare=_unpack_train_batch(cfg.data.image_size),
        # n_model_shards > 1 shards the giant head's kernel AND its Adam
        # moments over the model axis (size-1 axis = replicated, no-op)
        sharding_rules=giant_head_rule,
        # donation is safe again: the unsharded head uses the scatter-free
        # onehot slice (above), which dodges the round-3 donation kernel
        # fault; the sharded multi-chip head donates fine with gather.
        # _donate only drops to False when PD_HEAD_SLICE=gather forces the
        # faulting configuration back on (guard above).
        donate=_donate)
    trainer.resume_or_load()

    mapper = PartDistillationTrainMapper(image_size=size,
                                         capacity=cfg.data.mask_capacity,
                                         seed=cfg.seed)
    loader = DataLoader(items, mapper, cfg.data.batch_size, shuffle=True,
                        seed=cfg.seed, epochs=None,
                        num_workers=cfg.data.num_workers, drop_last=True)
    eval_fn = None
    if cfg.eval_every > 0:
        import dataclasses as _dc

        ds = _load_eval_items(cfg, args)
        infer_cfg = _dc.replace(
            model_cfg,
            test_topk=min(model_cfg.test_topk, args.num_queries * args.num_parts))
        eval_fn = lambda p: _distill_match_eval(  # noqa: E731
            cfg, args, infer_cfg, p, phases=("match", "eval"), ds=ds)
    vis_fn = (_make_vis_fn(model, os.path.join(cfg.checkpoint_dir, "logs",
                                               "train-distillation", "vis"),
                           needs_object_class=True)
              if cfg.vis_every > 0 else None)
    stats = _train_loop(cfg, trainer, _packed_batches(loader),
                        "train-distillation",
                        eval_fn=eval_fn, vis_fn=vis_fn)
    print(json.dumps({"stage": "train-distillation", **stats}))


# ---------------------------------------------------------------- stage 3 eval


def _proposal_ar_eval(cfg, args, model_cfg, params, ds=None) -> dict:
    """AR@k of the (trained) ProposalModel on a GT part dataset — the
    reference Trainer.test -> ProposalModel.inference -> ProposalEvaluator
    path (part_proposal_train_net.py:90-126, proposal_model.py:371-430)."""
    import jax
    import jax.numpy as jnp

    from .data.loader import batch_iterator
    from .data.mappers import PartEvalMapper
    from .evaluation.proposal_evaluator import ProposalEvaluator
    from .models.meta_arch.proposal import make_inference_fn

    if ds is None:
        ds = _load_eval_items(cfg, args)
    # AR is class-agnostic over part *instances*: keep instances separate
    mapper = PartEvalMapper(image_size=cfg.data.image_size, capacity=16,
                            merge_parts_by_class=False, **ds["mapper_kwargs"])
    infer_fn = jax.jit(make_inference_fn(model_cfg))
    limits = tuple(l for l in (1, 10, 50, 100, 200) if l <= model_cfg.test_topk)
    evaluator = ProposalEvaluator(limits=limits or (model_cfg.test_topk,),
                                  distributed=jax.process_count() > 1)
    for batch in batch_iterator(ds["items"], mapper, cfg.data.batch_size,
                                num_workers=cfg.data.num_workers):
        out = infer_fn(params, {
            "image": jnp.asarray(batch["image"]),
            "part_masks": jnp.asarray(batch["gt_part_masks"]),
            "part_labels": jnp.asarray(batch["gt_part_labels"]),
            "part_valid": jnp.asarray(batch["gt_valid"]),
            "object_masks": jnp.asarray(batch["object_mask"])[:, None],
            "object_valid": jnp.ones((batch["object_mask"].shape[0], 1), bool),
        })
        bv = batch["batch_valid"]
        evaluator.process(
            {k: np.asarray(out[k])[bv] for k in ("pred_masks", "scores", "valid")},
            batch["gt_part_masks"][bv], batch["gt_valid"][bv])
    return evaluator.evaluate()


def cmd_eval_proposal(args):
    """Stage-3 AR eval entry point (part_proposal_train_net.py:90-126)."""
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .models.meta_arch.proposal import ProposalModelConfig, normalize_images
    from .models.segmenter import MaskFormerSegmenter

    ds = _load_eval_items(cfg, args)
    seg = _segmenter_cfg(args.tiny, msda=_msda(args), num_classes=1, num_queries=args.num_queries)
    model_cfg = ProposalModelConfig(
        segmenter=seg, test_topk=min(args.topk, args.num_queries),
        use_unique_per_pixel_label=not args.no_unique_assignment)
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(jax.random.PRNGKey(cfg.seed),
                                    normalize_images(jnp.zeros((1, size, size, 3)))),
        trainer_dir=args.trainer_checkpoint,
        torch_path=getattr(args, "torch_params", None),
        require_weights=True, allow_random=args.allow_random_init)
    metrics = _proposal_ar_eval(cfg, args, model_cfg, params, ds)
    from .engine.metrics import print_csv_format

    print_csv_format(metrics, task="eval-proposal")
    print(json.dumps({"stage": "eval-proposal", "dataset": ds["name"], **metrics}))


# ---------------------------------------------------------------- stage 4


def cmd_rank(args):
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.datasets.imagenet import (load_imagenet_with_proposals,
                                         read_class_names)
    from .data.loader import batch_iterator
    from .data.mappers import PartRankingMapper
    from .data.pseudo_store import ShardWriter
    from .evaluation.clustering import ClusteringModule
    from .models.meta_arch.part_ranking import (PartRankingConfig, RankingMode,
                                                make_cluster_fn, make_label_fn)
    from .models.meta_arch.proposal import normalize_images
    from .models.segmenter import MaskFormerSegmenter
    from .utils import rle as rle_codec

    phases = args.phases.split(",")
    eval_dataset = getattr(args, "eval_dataset", "part_imagenet")
    on_eval_set = eval_dataset != "part_imagenet"
    ds = None

    if on_eval_set:
        # Pascal/Cityscapes: the whole modal pipeline (cluster -> match ->
        # eval) runs over the GT dataset with dataset-local class ids, as the
        # reference does per TEST dataset; "save" (imagenet pseudo-labels)
        # does not apply.
        if "save" in phases:
            raise SystemExit(f"--phases save not supported with "
                             f"--eval-dataset {eval_dataset}")
        from .data.mappers import PartEvalMapper

        ds = _load_eval_items(cfg, args)
        num_obj = args.num_object_classes or ds["num_obj_classes"]
        items = _assign_eval_class_ids(cfg, ds, num_obj)
        # cluster-phase input: GT part instances play the proposal role
        eval_mapper = PartEvalMapper(image_size=cfg.data.image_size,
                                     capacity=cfg.data.mask_capacity,
                                     **ds["mapper_kwargs"])

        def mapper(item):
            ex = eval_mapper(item)
            if ex is None:
                return None
            return {"image": ex["image"], "object_mask": ex["object_mask"],
                    "part_masks": ex["gt_part_masks"],
                    "part_valid": ex["gt_valid"],
                    "image_id": ex["image_id"], "class_id": ex["object_class"]}
    else:
        base = _imagenet_items(cfg, args)
        items = load_imagenet_with_proposals(
            base, cfg.paths.proposals_dcrf if not args.raw_proposals
            else cfg.paths.proposals)
        num_obj = args.num_object_classes
        if num_obj is None:
            # every host must agree on the bank size, and _imagenet_items
            # partitions classes per host — derive from the GLOBAL vocabulary
            from .data.datasets.imagenet import global_code_to_id

            try:
                num_obj = len(global_code_to_id(cfg.data.imagenet_root, cfg.data.vocab_map or None, cfg.data.manifest or None))
            except FileNotFoundError:
                num_obj = 1 + max((it["class_id"] for it in items), default=0)
        mapper = PartRankingMapper(image_size=cfg.data.image_size,
                                   capacity=cfg.data.mask_capacity)
    logger.info("stage 4: %d items, %d object classes, phases=%s, dataset=%s",
                len(items), num_obj, phases, eval_dataset)

    seg = _segmenter_cfg(args.tiny, msda=_msda(args), num_classes=1, num_queries=args.num_queries)
    rank_cfg = PartRankingConfig(segmenter=seg, num_clusters=args.num_clusters,
                                 test_topk=args.num_queries)
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(jax.random.PRNGKey(cfg.seed),
                                    normalize_images(jnp.zeros((1, size, size, 3)))),
        trainer_dir=args.trainer_checkpoint,
        torch_path=getattr(args, "torch_params", None),
        require_weights=True, allow_random=args.allow_random_init)
    suffix = f"_{eval_dataset}" if on_eval_set else ""
    centroid_path = os.path.join(cfg.checkpoint_dir, f"rank_centroids{suffix}.npz")

    def batches():
        return batch_iterator(items, mapper, cfg.data.batch_size,
                              num_workers=cfg.data.num_workers)

    # wire format: uint8 image + bit-packed mask uploads; pred-mask
    # downloads bit-packed (save phase) — unpack/pack inside the jit
    from .utils.bitpack import pack_bits, pack_bits_np, unpack_bits, unpack_bits_np

    def _wire_in(batch):
        return {
            "image": jnp.asarray(
                np.clip(batch["image"], 0, 255).astype(np.uint8)),
            "masks_p": jnp.asarray(pack_bits_np(batch["part_masks"])),
            "mask_valid": jnp.asarray(batch["part_valid"]),
            "object_mask_p": jnp.asarray(pack_bits_np(batch["object_mask"])),
        }

    def _wire_unpack(wire):
        return {
            "image": wire["image"].astype(jnp.float32),
            "masks": unpack_bits(wire["masks_p"], size),
            "mask_valid": wire["mask_valid"],
            "object_mask": unpack_bits(wire["object_mask_p"], size),
        }

    phase_stats = {}
    if "cluster" in phases:
        from .engine.launch import barrier, is_main_process

        raw_cluster_fn = make_cluster_fn(rank_cfg)
        # fetch ONLY what ClusteringModule consumes: feats (B,K,256) + valid.
        # The first composite pipeline run (PERF.md round 5) measured this
        # phase at 0.49 img/s e2e vs ~30 on-device because the full
        # (B, topk, H, W) pred_masks output was read back every batch and
        # then discarded — keeping masks out of the jit's fetched outputs
        # removes ~99% of the readback bytes (XLA still computes what valid
        # depends on, but never transfers the mask tensor).
        cluster_fn = jax.jit(
            lambda p, wire: {
                k: v for k, v in raw_cluster_fn(p, _wire_unpack(wire)).items()
                if k in ("feats", "valid")})
        clusterer = ClusteringModule(num_obj, seg.decoder.hidden_dim,
                                     args.num_clusters,
                                     distributed=jax.process_count() > 1)
        timer = _StageTimer()
        for batch in batches():
            out = cluster_fn(params, _wire_in(batch))
            bv = batch["batch_valid"]
            out = {k: np.asarray(v)[bv] for k, v in out.items()}
            clusterer.process(out, np.asarray(batch["class_id"])[bv])
            timer.batch(int(np.sum(bv)))
        phase_stats["cluster"] = timer.stats()
        # evaluate() all-gathers features across hosts; only process 0 writes
        # the shared bank (the reference's rank-0 sklearn ClusteringModule,
        # clustering_module.py:43-70)
        centroids = clusterer.evaluate()
        if is_main_process():
            os.makedirs(cfg.checkpoint_dir, exist_ok=True)
            np.savez(centroid_path, centroids=centroids)
        barrier("rank_centroids_written")
        logger.info("stage 4 cluster: centroid bank %s saved", centroids.shape)

    if "save" in phases:
        centroids = jnp.asarray(np.load(centroid_path)["centroids"])
        raw_label_fn = make_label_fn(rank_cfg, RankingMode.SAVE)
        # Only valid slots are written to the store, and slot order is
        # score-descending — compact the valid slots to the front ON DEVICE
        # and download just the first --save-topk of them (the first
        # composite pipeline run measured 6.0 img/s e2e here with all
        # topk=200 bit-packed masks on the wire; typical valid counts are
        # <= the proposal capacity). Overflow beyond the cap is counted and
        # logged so a production run can raise --save-topk.
        save_cap = min(args.save_topk, args.num_queries)

        def _label_wire(p, wire, cents):
            out = dict(raw_label_fn(p, {
                **_wire_unpack(wire),
                "object_label": wire["object_label"],
                "mask_labels": wire["mask_labels"]}, cents))
            va = out["valid"]
            idx = jnp.argsort(~va, axis=1, stable=True)[:, :save_cap]
            take = lambda a: jnp.take_along_axis(a, idx, axis=1)
            return {
                "pred_masks": pack_bits(jnp.take_along_axis(
                    out["pred_masks"], idx[..., None, None], axis=1)),
                "scores": take(out["scores"]),
                "pred_labels": take(out["pred_labels"]),
                "valid": take(va),
                "overflow": jnp.maximum(
                    jnp.sum(va, axis=1) - save_cap, 0),
            }

        label_fn = jax.jit(_label_wire)
        shard, num_shards = _shard_id(args)
        writer = ShardWriter(cfg.paths.part_masks_with_class, shard, num_shards)
        n_saved = 0
        n_overflow = 0
        timer = _StageTimer()
        for batch in batches():
            out = label_fn(params, {
                **_wire_in(batch),
                "object_label": jnp.asarray(batch["class_id"]),
                "mask_labels": jnp.zeros(batch["part_valid"].shape, jnp.int32),
            }, centroids)
            pm = unpack_bits_np(np.asarray(out["pred_masks"]), size)
            sc = np.asarray(out["scores"])
            lb = np.asarray(out["pred_labels"])
            va = np.asarray(out["valid"])
            n_overflow += int(np.sum(np.asarray(out["overflow"])))
            for b in range(pm.shape[0]):
                if not batch["batch_valid"][b]:
                    continue
                keep = np.nonzero(va[b])[0]
                if keep.size == 0:
                    continue
                n_saved += int(writer.write({
                    "image_id": str(batch["image_id"][b]),
                    "part_masks": [rle_codec.encode(pm[b, i]) for i in keep],
                    "part_labels": [int(lb[b, i]) for i in keep],
                    "part_scores": [float(sc[b, i]) for i in keep],
                    "object_class": int(batch["class_id"][b]),
                }))
            timer.batch(int(np.sum(batch["batch_valid"])))
        writer.close()
        if n_overflow:
            logger.warning(
                "stage 4 save: %d valid parts beyond --save-topk %d were "
                "dropped; raise --save-topk", n_overflow, save_cap)
        phase_stats["save"] = {"saved": n_saved, "overflow": n_overflow,
                               **timer.stats()}
        logger.info("stage 4 save: %d records", n_saved)

    if "match" in phases or "eval" in phases:
        _rank_match_eval(cfg, args, rank_cfg, params, centroid_path, phases,
                         num_obj, ds=ds)

    print(json.dumps({"stage": "rank", "phases": phases,
                      "dataset": eval_dataset, **phase_stats}))


def _rank_match_eval(cfg, args, rank_cfg, params, centroid_path, phases, num_obj,
                     ds=None):
    """Match (majority-vote mapping) and eval (mIoU) on a GT part dataset.

    ``--eval-dataset`` selects PartImageNet / Pascal-Parts / Cityscapes-Part
    (the reference's TEST-set lists, part_ranking_train_net.py).
    """
    import jax
    import jax.numpy as jnp

    from .data.loader import batch_iterator
    from .data.mappers import PartEvalMapper
    from .evaluation.miou import MIoUEvaluator, MIoUMatcher
    from .models.meta_arch.part_ranking import RankingMode, make_label_fn

    if ds is None:
        ds = _load_eval_items(cfg, args)
    items = _assign_eval_class_ids(cfg, ds, num_obj)
    n_gt_parts = ds["n_gt_parts"]
    suffix = "" if ds["name"] == "part_imagenet" else f"_{ds['name']}"
    mapping_path = os.path.join(cfg.checkpoint_dir, f"rank_mapping{suffix}.npz")
    mapper = PartEvalMapper(image_size=cfg.data.image_size, capacity=16,
                            **ds["mapper_kwargs"])
    centroids = jnp.asarray(np.load(centroid_path)["centroids"])

    def run(mode, mapping=None):
        label_fn = jax.jit(make_label_fn(
            rank_cfg, mode,
            num_label_space=n_gt_parts if mode == RankingMode.EVAL else None))
        for batch in batch_iterator(items, mapper, cfg.data.batch_size,
                                    num_workers=cfg.data.num_workers):
            out = label_fn(params, {
                "image": jnp.asarray(batch["image"]),
                "object_label": jnp.asarray(batch["object_class"]),
                "masks": jnp.asarray(batch["gt_part_masks"]),
                "mask_labels": jnp.asarray(batch["gt_part_labels"]),
                "mask_valid": jnp.asarray(batch["gt_valid"]),
                "object_mask": jnp.asarray(batch["object_mask"])},
                centroids, mapping)
            yield batch, {k: np.asarray(v) for k, v in out.items()}

    mapping_arr = None
    if "match" in phases:
        matcher = MIoUMatcher(pred_classes=rank_cfg.num_clusters,
                              gt_classes=n_gt_parts,
                              distributed=jax.process_count() > 1)
        for batch, out in run(RankingMode.MATCH):
            bv = batch["batch_valid"]
            matcher.process({k: v[bv] for k, v in out.items()},
                            batch["gt_part_masks"][bv], batch["gt_part_labels"][bv],
                            batch["gt_valid"][bv], batch["object_class"][bv])
        votes = matcher.evaluate()
        mapping_arr = np.zeros((num_obj, rank_cfg.num_clusters), np.int32)
        for c, vote in votes.items():
            mapping_arr[c] = vote[: rank_cfg.num_clusters]
        from .engine.launch import barrier, is_main_process

        if is_main_process():
            np.savez(mapping_path, mapping=mapping_arr)
        barrier("rank_mapping_written")
        logger.info("stage 4 match: mapping for %d classes", len(votes))

    if "eval" in phases:
        if mapping_arr is None:
            mapping_arr = np.load(mapping_path)["mapping"]
        evaluator = MIoUEvaluator(gt_classes=n_gt_parts,
                                  distributed=jax.process_count() > 1)
        for batch, out in run(RankingMode.EVAL, jnp.asarray(mapping_arr)):
            bv = batch["batch_valid"]
            evaluator.process({k: v[bv] for k, v in out.items()},
                              batch["gt_part_masks"][bv], batch["gt_part_labels"][bv],
                              batch["gt_valid"][bv], batch["object_class"][bv])
        metrics = evaluator.evaluate()
        from .engine.metrics import print_csv_format

        print_csv_format(metrics, task="rank-eval")
        print(json.dumps({"stage": "rank-eval", **metrics}))
        return metrics
    return None


# ---------------------------------------------------------------- stage 5 save/eval


def _distill_setup(cfg, args):
    """Model cfg + params for stage-5 inference (save/eval entry points)."""
    import jax
    import jax.numpy as jnp

    from .losses.criterion import CriterionConfig
    from .losses.matcher import MatcherConfig
    from .models.meta_arch.part_distillation import PartDistillationConfig
    from .models.meta_arch.proposal import normalize_images
    from .models.segmenter import MaskFormerSegmenter

    num_obj = args.num_object_classes
    seg = _segmenter_cfg(args.tiny, msda=_msda(args), num_classes=args.num_parts,
                         num_queries=args.num_queries,
                         num_object_classes=num_obj, num_parts=args.num_parts)
    model_cfg = PartDistillationConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=args.num_parts,
                                  matcher=MatcherConfig()),
        num_parts=args.num_parts,
        test_topk=min(args.topk, args.num_queries * args.num_parts))
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(
            jax.random.PRNGKey(cfg.seed),
            normalize_images(jnp.zeros((1, size, size, 3))),
            gt_object_class=jnp.zeros((1,), jnp.int32)),
        trainer_dir=args.trainer_checkpoint,
        torch_path=getattr(args, "torch_params", None),
        require_weights=True, allow_random=args.allow_random_init)
    return model_cfg, params


def cmd_distill_save(args):
    """Stage-5 save pass: run the trained PartDistillation model over the
    stage-4 dataset and write final part predictions to ``paths.predictions``
    (part_distillation_model.py:290-311)."""
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.datasets.imagenet import load_imagenet_with_segmentation
    from .data.loader import batch_iterator
    from .data.mappers import PartDistillationSaveMapper
    from .data.pseudo_store import ShardWriter
    from .models.meta_arch.part_distillation import make_inference_fn
    from .utils import rle as rle_codec

    base = _imagenet_items(cfg, args)
    items = load_imagenet_with_segmentation(base, cfg.paths.part_masks_with_class)
    shard, num_shards = _shard_id(args)
    writer = ShardWriter(cfg.paths.predictions, shard, num_shards)
    items = [it for it in items if it["image_id"] not in writer]
    logger.info("stage 5 save: %d images to process", len(items))

    model_cfg, params = _distill_setup(cfg, args)
    raw_infer_fn = make_inference_fn(model_cfg, mode="save")
    size = cfg.data.image_size

    # wire format: uint8 image + bit-packed masks up, packed pred masks down
    from .utils.bitpack import pack_bits, pack_bits_np, unpack_bits, unpack_bits_np

    def _infer_wire(p, wire):
        out = dict(raw_infer_fn(p, {
            "image": wire["image_u8"].astype(jnp.float32),
            "gt_object_class": wire["gt_object_class"],
            "part_masks": unpack_bits(wire["part_masks_p"], size),
            "part_labels": wire["part_labels"],
            "part_valid": wire["part_valid"],
            "object_masks": unpack_bits(wire["object_mask_p"], size)[:, None],
            "object_valid": jnp.ones((wire["object_mask_p"].shape[0], 1), bool),
        }))
        out["pred_masks"] = pack_bits(out["pred_masks"])
        return out

    infer_fn = jax.jit(_infer_wire)
    mapper = PartDistillationSaveMapper(image_size=cfg.data.image_size,
                                        capacity=cfg.data.mask_capacity)
    n_saved, n_batches, timer = 0, 0, _StageTimer()
    for batch in batch_iterator(items, mapper, cfg.data.batch_size,
                                num_workers=cfg.data.num_workers):
        out = infer_fn(params, {
            "image_u8": jnp.asarray(
                np.clip(batch["image"], 0, 255).astype(np.uint8)),
            "gt_object_class": jnp.asarray(batch["gt_object_class"]),
            "part_masks_p": jnp.asarray(pack_bits_np(batch["part_masks"])),
            "part_labels": jnp.asarray(batch["part_labels"]),
            "part_valid": jnp.asarray(batch["part_valid"]),
            "object_mask_p": jnp.asarray(pack_bits_np(batch["object_mask"])),
        })
        pm = unpack_bits_np(np.asarray(out["pred_masks"]), size)
        sc = np.asarray(out["scores"])
        lb = np.asarray(out["pred_labels"])
        va = np.asarray(out["valid"])
        for b in range(pm.shape[0]):
            if not batch["batch_valid"][b]:
                continue
            keep = np.nonzero(va[b])[0]
            if keep.size == 0:
                continue
            n_saved += int(writer.write({
                "image_id": str(batch["image_id"][b]),
                "part_masks": [rle_codec.encode(pm[b, i]) for i in keep],
                "part_labels": [int(lb[b, i]) for i in keep],
                "part_scores": [float(sc[b, i]) for i in keep],
                "object_class": int(batch["gt_object_class"][b]),
            }))
        n_batches += 1
        timer.batch(int(np.sum(batch["batch_valid"])))
        if n_batches % 20 == 0:
            writer.flush()
    writer.close()
    print(json.dumps({"stage": "distill-save", "saved": n_saved, **timer.stats()}))


def _distill_match_eval(cfg, args, model_cfg, params, phases, ds=None) -> Optional[dict]:
    """Stage-5 match (majority-vote cluster->GT mapping) + eval (mIoU) on a GT
    part dataset (part_distillation_model.py:470-472; miou_matcher/evaluator)."""
    import jax
    import jax.numpy as jnp

    from .data.loader import batch_iterator
    from .data.mappers import PartEvalMapper
    from .evaluation.miou import MIoUEvaluator, MIoUMatcher
    from .models.meta_arch.part_distillation import make_inference_fn

    if ds is None:
        ds = _load_eval_items(cfg, args)
    num_obj = args.num_object_classes
    items = _assign_eval_class_ids(cfg, ds, num_obj)
    n_gt_parts = ds["n_gt_parts"]
    suffix = "" if ds["name"] == "part_imagenet" else f"_{ds['name']}"
    mapping_path = os.path.join(cfg.checkpoint_dir, f"distill_mapping{suffix}.npz")
    mapper = PartEvalMapper(image_size=cfg.data.image_size, capacity=16,
                            **ds["mapper_kwargs"])

    def run(mode, mapping=None):
        infer_fn = jax.jit(make_inference_fn(model_cfg, mode=mode))
        for batch in batch_iterator(items, mapper, cfg.data.batch_size,
                                    num_workers=cfg.data.num_workers):
            out = infer_fn(params, {
                "image": jnp.asarray(batch["image"]),
                "gt_object_class": jnp.asarray(batch["object_class"]),
                "part_masks": jnp.asarray(batch["gt_part_masks"]),
                "part_labels": jnp.asarray(batch["gt_part_labels"]),
                "part_valid": jnp.asarray(batch["gt_valid"]),
                "object_masks": jnp.asarray(batch["object_mask"])[:, None],
                "object_valid": jnp.ones((batch["object_mask"].shape[0], 1), bool),
            }, mapping)
            yield batch, {k: np.asarray(v) for k, v in out.items()}

    mapping_arr = None
    if "match" in phases:
        matcher = MIoUMatcher(pred_classes=model_cfg.num_parts,
                              gt_classes=n_gt_parts,
                              distributed=jax.process_count() > 1)
        for batch, out in run("save"):
            bv = batch["batch_valid"]
            matcher.process({k: v[bv] for k, v in out.items()},
                            batch["gt_part_masks"][bv], batch["gt_part_labels"][bv],
                            batch["gt_valid"][bv], batch["object_class"][bv])
        votes = matcher.evaluate()
        mapping_arr = np.zeros((num_obj, model_cfg.num_parts), np.int32)
        for c, vote in votes.items():
            mapping_arr[c] = vote[: model_cfg.num_parts]
        from .engine.launch import barrier, is_main_process

        if is_main_process():
            os.makedirs(cfg.checkpoint_dir, exist_ok=True)
            np.savez(mapping_path, mapping=mapping_arr)
        barrier("distill_mapping_written")
        logger.info("stage 5 match: mapping for %d classes", len(votes))

    if "eval" in phases:
        if mapping_arr is None:
            mapping_arr = np.load(mapping_path)["mapping"]
        evaluator = MIoUEvaluator(gt_classes=n_gt_parts,
                                  distributed=jax.process_count() > 1)
        for batch, out in run("eval", jnp.asarray(mapping_arr)):
            bv = batch["batch_valid"]
            evaluator.process({k: v[bv] for k, v in out.items()},
                              batch["gt_part_masks"][bv], batch["gt_part_labels"][bv],
                              batch["gt_valid"][bv], batch["object_class"][bv])
        return evaluator.evaluate()
    return None


def cmd_distill_eval(args):
    """Stage-5 mIoU eval entry point (match + eval phases)."""
    cfg = _setup(args)
    phases = args.phases.split(",")
    ds = _load_eval_items(cfg, args)
    model_cfg, params = _distill_setup(cfg, args)
    metrics = _distill_match_eval(cfg, args, model_cfg, params, phases, ds)
    out = {"stage": "distill-eval", "dataset": ds["name"], "phases": phases}
    if metrics is not None:
        from .engine.metrics import print_csv_format

        print_csv_format(metrics, task="distill-eval")
        out.update(metrics)
    print(json.dumps(out))


# ---------------------------------------------------------------- ablation


def _supervised_setup(cfg, args, require_weights: bool = False):
    """Shared by train/eval-supervised: items + model cfg + params.

    ``--eval-dataset`` selects the GT part dataset (the reference trains and
    evaluates the supervised ablation on PartImageNet, Pascal-Parts, and
    Cityscapes-Part — sh_files/supervised_learning/semseg/pascal.sh).
    Fewshot ``--label-percentage`` subsets images with fixed seed 1234
    (register_part_imagenet.py:15-29).
    """
    import jax
    import jax.numpy as jnp

    from .losses.criterion import CriterionConfig
    from .losses.matcher import MatcherConfig
    from .models.meta_arch.proposal import normalize_images
    from .models.meta_arch.supervised import SupervisedModelConfig
    from .models.segmenter import MaskFormerSegmenter

    ds = _load_eval_items(cfg, args)
    items = ds["items"]
    if args.label_percentage is not None and args.label_percentage < 100.0:
        rng = np.random.RandomState(1234)
        n_keep = max(1, int(round(len(items) * args.label_percentage / 100.0)))
        keep = rng.permutation(len(items))[:n_keep]
        items = [items[i] for i in sorted(keep)]
    n_cls = (args.num_part_classes if ds["name"] == "part_imagenet"
             else ds["n_gt_parts"])
    train_classes = 1 if args.class_agnostic else n_cls
    seg = _segmenter_cfg(args.tiny, msda=_msda(args), num_classes=train_classes,
                         num_queries=args.num_queries)
    # Architecture switches (the reference's PIXEL_DECODER_NAME /
    # TRANSFORMER_DECODER_NAME registry dispatch): select the FPN pixel
    # decoders and/or the MaskFormer-v1 standard decoder.
    if args.pixel_decoder != "msdeform" or args.decoder != "multi_scale":
        import dataclasses as _dc

        from .models.fpn import FPNPixelDecoderConfig
        from .models.maskformer_decoder import StandardDecoderConfig

        fpn = (FPNPixelDecoderConfig(conv_dim=32, mask_dim=32,
                                     transformer_enc_layers=1, n_heads=4,
                                     transformer_ffn_dim=64)
               if args.tiny else FPNPixelDecoderConfig())
        std = (StandardDecoderConfig(num_classes=train_classes, hidden_dim=32,
                                     num_queries=args.num_queries, num_heads=4,
                                     dim_feedforward=64, dec_layers=2,
                                     mask_dim=32)
               if args.tiny else
               StandardDecoderConfig(num_classes=train_classes,
                                     num_queries=args.num_queries))
        seg = _dc.replace(seg, pixel_decoder_type=args.pixel_decoder, fpn=fpn,
                          decoder_type=args.decoder, standard_decoder=std)
    n_pts = 1024 if args.tiny else 12544
    model_cfg = SupervisedModelConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=train_classes, num_points=n_pts,
                                  matcher=MatcherConfig(num_points=n_pts)),
        num_part_classes=n_cls,
        class_agnostic_learning=args.class_agnostic,
        class_agnostic_inference=args.class_agnostic,
        test_topk=args.num_queries)
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(jax.random.PRNGKey(cfg.seed),
                                    normalize_images(jnp.zeros((1, size, size, 3)))),
        trainer_dir=getattr(args, "trainer_checkpoint", None),
        torch_path=getattr(args, "torch_params", None),
        require_weights=require_weights,
        allow_random=getattr(args, "allow_random_init", False))
    return items, model_cfg, params, ds


def _supervised_eval(cfg, args, model_cfg, params, ds, items=None) -> dict:
    """SupervisedModel mIoU on the GT dataset (supervised_miou_evaluator)."""
    import jax
    import jax.numpy as jnp

    from .data.loader import batch_iterator
    from .data.mappers import PartEvalMapper
    from .evaluation.miou import SupervisedMIoUEvaluator
    from .models.meta_arch.supervised import make_inference_fn

    mapper = PartEvalMapper(image_size=cfg.data.image_size, capacity=16,
                            **ds["mapper_kwargs"])
    infer_fn = jax.jit(make_inference_fn(model_cfg))
    evaluator = SupervisedMIoUEvaluator(gt_classes=model_cfg.num_part_classes,
                                        distributed=jax.process_count() > 1)
    for batch in batch_iterator(items if items is not None else ds["items"],
                                mapper, cfg.data.batch_size,
                                num_workers=cfg.data.num_workers):
        out = infer_fn(params, {"image": jnp.asarray(batch["image"]),
                                "object_mask": jnp.asarray(batch["object_mask"])})
        bv = batch["batch_valid"]
        evaluator.process({k: np.asarray(v)[bv] for k, v in out.items()},
                          batch["gt_part_masks"][bv], batch["gt_part_labels"][bv],
                          batch["gt_valid"][bv], batch["object_class"][bv])
    return evaluator.evaluate()


def cmd_train_supervised(args):
    """Supervised / fewshot ablation: train on real part GT
    (supervised_train_net.py; fewshot via --label-percentage)."""
    cfg = _setup(args)
    from .data.loader import DataLoader, host_shard
    from .data.mappers import PartEvalMapper
    from .engine.optim import OptimizerConfig
    from .engine.trainer import Trainer
    from .models.meta_arch.supervised import make_loss_fn

    items, model_cfg, params, ds = _supervised_setup(cfg, args)
    items = host_shard(items)
    logger.info("supervised: %d train items on %s (label %% = %s)",
                len(items), ds["name"], args.label_percentage)

    gt_mapper = PartEvalMapper(image_size=cfg.data.image_size,
                               capacity=cfg.data.mask_capacity,
                               **ds["mapper_kwargs"])

    def mapper(item):
        ex = gt_mapper(item)
        if ex is None:
            return None
        return {"image": ex["image"], "masks": ex["gt_part_masks"],
                "labels": ex["gt_part_labels"], "valid": ex["gt_valid"],
                "image_id": ex["image_id"]}

    mesh = _fit_mesh(cfg.data.batch_size)
    trainer = Trainer(
        loss_fn=make_loss_fn(model_cfg),
        init_params=params,
        optimizer_cfg=OptimizerConfig(max_iter=cfg.max_iters),
        mesh=mesh,
        checkpoint_dir=os.path.join(cfg.checkpoint_dir, "supervised"),
        seed=cfg.seed,
        batch_prepare=_unpack_train_batch(cfg.data.image_size))
    trainer.resume_or_load()
    loader = DataLoader(items, mapper, cfg.data.batch_size, shuffle=True,
                        seed=cfg.seed, epochs=None,
                        num_workers=cfg.data.num_workers, drop_last=True)
    eval_fn = None
    if cfg.eval_every > 0:
        eval_fn = lambda p: _supervised_eval(cfg, args, model_cfg, p, ds)  # noqa: E731
    vis_fn = None
    if cfg.vis_every > 0:
        from .models.segmenter import MaskFormerSegmenter

        vis_fn = _make_vis_fn(
            MaskFormerSegmenter(model_cfg.segmenter),
            os.path.join(cfg.checkpoint_dir, "logs", "train-supervised", "vis"))
    stats = _train_loop(cfg, trainer, _packed_batches(loader),
                        "train-supervised",
                        eval_fn=eval_fn, vis_fn=vis_fn)
    print(json.dumps({"stage": "train-supervised", **stats}))


def cmd_eval_supervised(args):
    cfg = _setup(args)
    items, model_cfg, params, ds = _supervised_setup(cfg, args,
                                                     require_weights=True)
    metrics = _supervised_eval(cfg, args, model_cfg, params, ds, items=items)
    from .engine.metrics import print_csv_format

    print_csv_format(metrics, task="eval-supervised")
    print(json.dumps({"stage": "eval-supervised", "dataset": ds["name"], **metrics}))


# ---------------------------------------------------------------- eval


def cmd_eval_pixel_grouping(args):
    """Stage-2 clustering quality: AR@k of k-means proposals vs GT parts
    (the reference's pixel_grouping_test_net.py path)."""
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.datasets.part_imagenet import load_part_imagenet
    from .data.loader import batch_iterator
    from .data.mappers import PartEvalMapper
    from .evaluation.proposal_evaluator import ProposalEvaluator
    from .models.meta_arch.proposal import normalize_images
    from .models.meta_arch.proposal_generation import (
        ProposalGenerationConfig, make_generation_fn)
    from .models.swin import SwinTransformer, swin_large_config

    items = load_part_imagenet(cfg.data.part_imagenet_json,
                               cfg.data.part_imagenet_images,
                               debug_limit=cfg.data.debug_limit)
    gen_cfg = ProposalGenerationConfig(
        swin=_tiny_swin() if args.tiny
        else swin_large_config(dtype=jnp.bfloat16),
        num_clusters=args.num_clusters)
    gen_fn = jax.jit(make_generation_fn(gen_cfg))
    backbone = SwinTransformer(gen_cfg.swin)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(backbone.init)(
            jax.random.PRNGKey(cfg.seed),
            normalize_images(jnp.zeros((1, size, size, 3)))),
        torch_path=getattr(args, "torch_params", None),
        require_weights=True, allow_random=args.allow_random_init)

    mapper = PartEvalMapper(image_size=size, capacity=16,
                            merge_parts_by_class=False)
    evaluator = ProposalEvaluator(limits=(1, 10, 50, 100))
    n = 0
    for batch in batch_iterator(items, mapper, cfg.data.batch_size,
                                num_workers=cfg.data.num_workers):
        out = gen_fn(params, {"image": jnp.asarray(batch["image"]),
                              "object_mask": jnp.asarray(batch["object_mask"])},
                     jax.random.PRNGKey(n))
        bv = batch["batch_valid"]
        scores = np.ones(np.asarray(out["part_valid"]).shape, np.float32)
        evaluator.process(
            {"pred_masks": np.asarray(out["part_masks"])[bv],
             "scores": scores[bv],
             "valid": np.asarray(out["part_valid"])[bv]},
            batch["gt_part_masks"][bv], batch["gt_valid"][bv])
        n += 1
    from .engine.metrics import print_csv_format

    metrics = evaluator.evaluate()
    print_csv_format(metrics, task="eval-pixel-grouping")
    print(json.dumps({"stage": "eval-pixel-grouping", **metrics}))


# ---------------------------------------------------------------- doctor


def cmd_doctor(args):
    """Environment health check — the things that page you at 3am: backend
    liveness (probed in a SUBPROCESS with a timeout, because a wedged TPU
    tunnel makes PJRT client creation hang indefinitely), store paths,
    compile cache, native library, and the library's own import surface."""
    import subprocess
    import sys as _sys

    cfg = _setup(args)
    report = {"stage": "doctor"}

    try:
        r = subprocess.run(
            [_sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "print(d[0].platform, len(d))"],
            capture_output=True, text=True, timeout=args.backend_timeout)
        if r.returncode == 0:
            platform, n = r.stdout.split()
            report["backend"] = {"ok": True, "platform": platform,
                                 "devices": int(n)}
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
            report["backend"] = {"ok": False, "error": (tail or ["?"])[0][:300]}
    except subprocess.TimeoutExpired:
        report["backend"] = {
            "ok": False,
            "error": f"init hung > {args.backend_timeout}s — tunnel/runtime "
                     "wedged; retry later or restart the TPU runtime"}

    import jax as _jax

    report["jax"] = {"version": _jax.__version__}

    root = cfg.paths.root
    try:
        os.makedirs(root, exist_ok=True)
        probe = os.path.join(root, ".doctor_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
        report["pseudo_label_root"] = {"ok": True, "path": root}
    except OSError as e:
        report["pseudo_label_root"] = {"ok": False, "path": root,
                                       "error": str(e)[:200]}

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_tpu")
    report["compile_cache"] = {"path": cache, "exists": os.path.isdir(cache),
                               "entries": len(os.listdir(cache))
                               if os.path.isdir(cache) else 0}

    try:
        from .utils.native_lib import native_available

        report["native"] = {"ok": bool(native_available())}
    except Exception as e:  # noqa: BLE001 - diagnostic surface
        report["native"] = {"ok": False, "error": str(e)[:200]}

    ok = all(v.get("ok", True) for v in report.values()
             if isinstance(v, dict) and "ok" in v)
    report["ok"] = ok
    print(json.dumps(report, indent=2))
    if not ok:
        raise SystemExit(2)


# ---------------------------------------------------------------- profile


def cmd_profile(args):
    """Profiler harness: trace N stage-3 train steps on synthetic data and
    print a scope-attributed device-time breakdown (utils/profiling.py).
    The reference has no profiling surface at all; this is the TPU build's
    answer to "where does the step go" (see PERF.md for captured results)."""
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .engine.optim import OptimizerConfig
    from .engine.trainer import Trainer
    from .losses.criterion import CriterionConfig
    from .losses.matcher import MatcherConfig
    from .models.meta_arch.proposal import (ProposalModelConfig, make_loss_fn,
                                            normalize_images)
    from .models.segmenter import MaskFormerSegmenter
    from .utils.profiling import summarize_trace, trace_steps

    seg = _segmenter_cfg(args.tiny, msda=_msda(args), num_classes=1, num_queries=args.num_queries)
    n_pts = 1024 if args.tiny else 12544
    model_cfg = ProposalModelConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=1, num_points=n_pts,
                                  importance_sample_ratio=0.0,
                                  matcher=MatcherConfig(num_points=n_pts)))
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    b, t = cfg.data.batch_size, cfg.data.mask_capacity
    rng = np.random.RandomState(cfg.seed)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (b, size, size, 3)),
                             jnp.float32),
        "masks": jnp.asarray((rng.rand(b, t, size, size) < 0.2)
                             .astype(np.float32)),
        "valid": jnp.asarray(np.tile(np.arange(t) < 4, (b, 1))),
    }
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(jax.random.PRNGKey(cfg.seed),
                                    normalize_images(batch["image"][:1])),
        torch_path=getattr(args, "torch_params", None))
    trainer = Trainer(loss_fn=make_loss_fn(model_cfg), init_params=params,
                      optimizer_cfg=OptimizerConfig())

    def step():
        m = trainer.train_step(batch)
        float(jnp.asarray(m["total_loss"]).ravel()[0])  # true sync

    out_dir = args.output or os.path.join(cfg.checkpoint_dir, "profile")
    trace_steps(step, out_dir, steps=args.steps)
    try:
        hlo = trainer.compiled_hlo_text(batch)  # named-scope attribution
    except Exception as e:  # pragma: no cover - fall back to op-kind buckets
        logger.warning("HLO attribution unavailable (%s)", e)
        hlo = None
    summary = summarize_trace(out_dir, steps=args.steps, hlo_text=hlo)
    top = dict(list(summary.items())[: args.top])
    for scope, ms in top.items():
        print(f"{ms:9.2f} ms/step  {scope}")
    print(json.dumps({"stage": "profile", "trace_dir": out_dir,
                      "total_ms_per_step": round(sum(summary.values()), 2),
                      "top": {k: round(v, 2) for k, v in top.items()}}))


# ---------------------------------------------------------------- viz


def cmd_visualize(args):
    """Collage of pseudo-label overlays (make_visualization.py:63-101)."""
    cfg = _setup(args)
    from .data.pseudo_store import PseudoLabelStore
    from .data.transforms import load_image, resize_image, resize_mask
    from .utils import rle as rle_codec
    from .utils.visualize import make_collage, overlay_masks, save_image

    store = PseudoLabelStore(args.store or cfg.paths.proposals_dcrf)
    items = {it["image_id"]: it for it in _imagenet_items(cfg, args)}
    size = cfg.data.image_size
    panels = []
    for record in store:
        item = items.get(record["image_id"])
        if item is None:
            continue
        image = load_image(item["file_name"])
        if image is None:
            continue
        image = resize_image(image, (size, size))
        masks = np.stack([resize_mask(rle_codec.decode(r), (size, size))
                          for r in record["part_masks"]])
        labels = record.get("part_labels")
        panels.append(overlay_masks(image, masks, labels=labels))
        if len(panels) >= args.max_images:
            break
    if not panels:
        raise SystemExit("no overlapping images between store and dataset")
    save_image(args.output, make_collage(panels, cols=args.cols))
    print(json.dumps({"stage": "visualize", "panels": len(panels),
                      "output": args.output}))


# ---------------------------------------------------------------- main


def _add_common(p):
    p.add_argument("--config", default=None, help="yaml config (with _BASE_)")
    p.add_argument("--set", nargs="*", default=[],
                   help="dotted overrides: data.batch_size=4 ...")
    p.add_argument("--shard", type=int, default=None)
    p.add_argument("--num-shards", type=int, default=None)
    p.add_argument("--tiny", action="store_true", help="tiny model (smoke tests)")
    p.add_argument("--params", default=None, help="orbax params checkpoint")
    p.add_argument("--trainer-checkpoint", default=None,
                   help="stage Trainer checkpoint dir (loads latest step's params)")
    p.add_argument("--torch-params", default=None,
                   help="torch/detectron2 Mask2Former checkpoint (.pth/.pkl), "
                        "converted via utils/convert_weights")
    p.add_argument("--allow-random-init", action="store_true",
                   help="let eval/inference commands run with freshly-"
                        "initialized weights (smoke tests only)")
    p.add_argument("--msda-mode", default=None,
                   choices=["onehot_mxu", "take", "banded", "pallas_folded"],
                   help="deformable-attention sampling core (default: backend "
                        "auto). 'banded' is fastest when the encoder is frozen "
                        "or offsets are measured in-band "
                        "(ops/ms_deform_attn.msda_band_oob_fraction)")
    p.add_argument("--msda-band-radius", type=int, default=None,
                   help="vertical tap radius for --msda-mode banded (default 6)")


def _add_eval_dataset(p):
    p.add_argument("--eval-dataset", default="part_imagenet",
                   choices=["part_imagenet", "pascal", "cityscapes"],
                   help="GT part dataset for evaluation")
    p.add_argument("--num-gt-parts", type=int, default=40,
                   help="GT part-label space (part_imagenet only; "
                        "pascal/cityscapes derive it from the dataset)")


def build_parser():
    parser = argparse.ArgumentParser("partdistillation_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("label", help="stage 1: object labeling")
    _add_common(p)
    p.add_argument("--detections", required=True,
                   help="store dir of precomputed detections")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--score-threshold", type=float, default=0.0)
    p.add_argument("--no-class-match", action="store_true")
    p.set_defaults(fn=cmd_label)

    p = sub.add_parser("detect",
                       help="stage 1 from pixels: segmenter proposals + CLIP")
    _add_common(p)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--proposals", type=int, default=100,
                   help="mask proposals per image before class filtering")
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--score-threshold", type=float, default=0.0)
    p.add_argument("--clip-model", default=None,
                   help="local CLIP checkpoint dir (transformers format)")
    p.add_argument("--clip-backend", choices=("tpu", "torch"), default="tpu",
                   help="region-embedding backend: jitted flax vision tower "
                        "(models/clip_vit) or host-side torch")
    p.add_argument("--no-class-match", action="store_true")
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("eval-detect",
                       help="stage-1 detection AR vs OBJECT ground truth")
    _add_common(p)
    _add_eval_dataset(p)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--topk", type=int, default=100)
    p.set_defaults(fn=cmd_eval_detect)

    p = sub.add_parser("propose", help="stage 2: pixel grouping")
    _add_common(p)
    p.add_argument("--num-clusters", type=int, default=4)
    p.set_defaults(fn=cmd_propose)

    p = sub.add_parser("dcrf", help="stage 2b: dense-CRF smoothing (on device)")
    _add_common(p)
    p.add_argument("--gt-prob", type=float, default=0.7)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--bilateral-sxy", type=float, default=20.0)
    p.add_argument("--bilateral-stride", type=int, default=None,
                   help="window-grid cell size in px (default sxy/2.5; "
                        "smaller = finer/slower — ops/dense_crf.py)")
    p.add_argument("--watch", action="store_true",
                   help="run continuously alongside stage 2 (the reference's "
                        "dCRF worker-farm shape): rescan for new proposals "
                        "until every propose shard marks completion")
    p.add_argument("--watch-interval", type=float, default=10.0,
                   help="seconds between --watch rescans")
    p.set_defaults(fn=cmd_dcrf)

    p = sub.add_parser("train-proposal", help="stage 3: proposal learning")
    _add_common(p)
    _add_eval_dataset(p)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--freeze-trunk", action="store_true", default=True)
    p.add_argument("--no-freeze-trunk", dest="freeze_trunk", action="store_false")
    p.add_argument("--raw-proposals", action="store_true",
                   help="train on raw stage-2 output (skip dCRF)")
    p.set_defaults(fn=cmd_train_proposal)

    p = sub.add_parser("eval-proposal",
                       help="stage-3 AR eval of the trained ProposalModel")
    _add_common(p)
    _add_eval_dataset(p)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--topk", type=int, default=200)
    p.add_argument("--no-unique-assignment", action="store_true")
    p.set_defaults(fn=cmd_eval_proposal)

    p = sub.add_parser("rank", help="stage 4: part ranking")
    _add_common(p)
    _add_eval_dataset(p)
    p.add_argument("--phases", default="cluster,save")
    p.add_argument("--num-clusters", type=int, default=8)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--num-object-classes", type=int, default=None)
    p.add_argument("--raw-proposals", action="store_true")
    p.add_argument("--save-topk", type=int, default=32,
                   help="save phase: max valid parts downloaded/saved per "
                        "image (device-side compaction; overflow is counted "
                        "and logged)")
    p.set_defaults(fn=cmd_rank)

    p = sub.add_parser("train-distillation", help="stage 5: self-training")
    _add_common(p)
    _add_eval_dataset(p)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--num-parts", type=int, default=8)
    p.add_argument("--num-object-classes", type=int, default=22000)
    p.add_argument("--freeze-trunk", action="store_true", default=True)
    p.add_argument("--no-freeze-trunk", dest="freeze_trunk",
                   action="store_false")
    p.set_defaults(fn=cmd_train_distillation)

    p = sub.add_parser("distill-save",
                       help="stage-5 save pass -> paths.predictions")
    _add_common(p)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--num-parts", type=int, default=8)
    p.add_argument("--num-object-classes", type=int, default=22000)
    p.add_argument("--topk", type=int, default=200)
    p.set_defaults(fn=cmd_distill_save)

    p = sub.add_parser("distill-eval",
                       help="stage-5 mIoU eval (match + eval phases)")
    _add_common(p)
    _add_eval_dataset(p)
    p.add_argument("--phases", default="match,eval")
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--num-parts", type=int, default=8)
    p.add_argument("--num-object-classes", type=int, default=22000)
    p.add_argument("--topk", type=int, default=200)
    p.set_defaults(fn=cmd_distill_eval)

    for name, fn in (("train-supervised", cmd_train_supervised),
                     ("eval-supervised", cmd_eval_supervised)):
        p = sub.add_parser(name, help="supervised/fewshot ablation")
        _add_common(p)
        _add_eval_dataset(p)
        p.add_argument("--num-queries", type=int, default=200)
        p.add_argument("--num-part-classes", type=int, default=40)
        p.add_argument("--class-agnostic", action="store_true")
        p.add_argument("--label-percentage", type=float, default=None,
                       help="fewshot subset %% (seed 1234)")
        p.add_argument("--pixel-decoder", default="msdeform",
                       choices=["msdeform", "fpn", "transformer_fpn"])
        p.add_argument("--decoder", default="multi_scale",
                       choices=["multi_scale", "standard"])
        p.set_defaults(fn=fn)

    p = sub.add_parser("eval-pixel-grouping", help="stage-2 AR eval vs GT parts")
    _add_common(p)
    p.add_argument("--num-clusters", type=int, default=4)
    p.set_defaults(fn=cmd_eval_pixel_grouping)

    p = sub.add_parser("doctor", help="environment health check (backend, "
                                      "paths, cache, native lib)")
    _add_common(p)
    p.add_argument("--backend-timeout", type=int, default=120,
                   help="seconds before declaring the backend wedged")
    p.set_defaults(fn=cmd_doctor)

    p = sub.add_parser("profile", help="trace N train steps, print breakdown")
    _add_common(p)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--output", default=None, help="trace dir (default: ckpt/profile)")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("visualize", help="collage of pseudo-label overlays")
    _add_common(p)
    p.add_argument("--store", default=None, help="store dir (default: dCRF proposals)")
    p.add_argument("--output", default="collage.png")
    p.add_argument("--max-images", type=int, default=16)
    p.add_argument("--cols", type=int, default=4)
    p.set_defaults(fn=cmd_visualize)

    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
