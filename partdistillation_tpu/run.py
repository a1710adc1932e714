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
    return cfg


def _tiny_swin():
    from .models.swin import SwinConfig

    return SwinConfig(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                      window_size=4, drop_path_rate=0.0)


def _segmenter_cfg(tiny: bool, num_classes: int, num_queries: int,
                   num_object_classes: int = 0, num_parts: int = 8):
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
                                             n_points=2),
            decoder=TransformerDecoderConfig(
                num_classes=num_classes, hidden_dim=32, num_queries=num_queries,
                num_heads=4, dim_feedforward=64, dec_layers=2, mask_dim=32,
                num_object_classes=num_object_classes, num_parts=num_parts),
        )
    return SegmenterConfig(
        swin=swin_large_config(),
        pixel_decoder=PixelDecoderConfig(),
        decoder=TransformerDecoderConfig(
            num_classes=num_classes, num_queries=num_queries, dec_layers=9,
            num_object_classes=num_object_classes, num_parts=num_parts),
    )


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
    )


def _restore_params(path: Optional[str], init_fn):
    """Orbax restore if path given, else init_fn()."""
    params = init_fn()
    if path:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        params = ckpt.restore(os.path.abspath(path), params)
        logger.info("restored params from %s", path)
    return params


def _save_params(path: str, params):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params, force=True)
    ckpt.wait_until_finished()



def _fit_mesh(batch_size: int, n_model: int = 1):
    """Data-axis size = gcd(devices/n_model, per-host batch) so the batch
    shards evenly; leftover devices idle rather than erroring."""
    import math

    import jax

    from .parallel.mesh import make_mesh

    n_avail = max(len(jax.devices()) // max(n_model, 1), 1)
    n_data = math.gcd(n_avail, batch_size) or 1
    return make_mesh(n_data=n_data, n_model=n_model)


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


# ---------------------------------------------------------------- stage 2


def cmd_propose(args):
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.loader import batch_iterator
    from .data.mappers import ProposalGenerationMapper
    from .data.pseudo_store import ShardWriter
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
        swin=_tiny_swin() if args.tiny else swin_large_config(),
        num_clusters=args.num_clusters)
    gen_fn = jax.jit(make_generation_fn(gen_cfg))
    backbone = SwinTransformer(gen_cfg.swin)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(backbone.init)(
            jax.random.PRNGKey(cfg.seed),
            normalize_images(jnp.zeros((1, size, size, 3)))),
    )

    mapper = ProposalGenerationMapper(image_size=size)
    n_saved, n_batches, t0 = 0, 0, time.perf_counter()
    for batch in batch_iterator(items, mapper, cfg.data.batch_size,
                                num_workers=cfg.data.num_workers):
        out = gen_fn(params, {"image": jnp.asarray(batch["image"]),
                              "object_mask": jnp.asarray(batch["object_mask"])},
                     jax.random.PRNGKey(n_batches))
        masks = np.asarray(out["part_masks"])
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
        if n_batches % 20 == 0:
            writer.flush()
            ips = n_saved / (time.perf_counter() - t0)
            logger.info("stage 2: %d saved (%.2f img/s)", n_saved, ips)
    writer.close()
    print(json.dumps({"stage": "propose", "saved": n_saved,
                      "images_per_sec": round(n_saved / max(time.perf_counter() - t0, 1e-9), 3)}))


# ---------------------------------------------------------------- stage 2b


def cmd_dcrf(args):
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.loader import batch_iterator
    from .data.mappers import PartRankingMapper
    from .data.datasets.imagenet import load_imagenet_with_proposals
    from .data.pseudo_store import ShardWriter
    from .ops.dense_crf import DenseCRFParams, dense_crf, unary_from_masks
    from .utils import rle as rle_codec

    shard, num_shards = _shard_id(args)
    base = _imagenet_items(cfg, args)
    items = load_imagenet_with_proposals(base, cfg.paths.proposals)
    writer = ShardWriter(cfg.paths.proposals_dcrf, shard, num_shards)
    items = [it for it in items if it["image_id"] not in writer]
    logger.info("stage 2b dCRF: %d images", len(items))

    params = DenseCRFParams(gt_prob=args.gt_prob, iters=args.iters,
                            bilateral_sxy=args.bilateral_sxy)
    capacity = cfg.data.mask_capacity

    def refine(image, masks, valid):
        unary = unary_from_masks(masks, valid, params.gt_prob)
        q = dense_crf(image, unary, params)
        label = jnp.argmax(q, axis=-1)
        refined = label[None, :, :] == (1 + jnp.arange(capacity)[:, None, None])
        return refined, jnp.any(refined, axis=(1, 2)) & valid

    refine_fn = jax.jit(jax.vmap(refine))
    mapper = PartRankingMapper(image_size=cfg.data.image_size, capacity=capacity)

    n_saved, t0 = 0, time.perf_counter()
    for batch in batch_iterator(items, mapper, cfg.data.batch_size,
                                num_workers=cfg.data.num_workers):
        refined, valid = refine_fn(jnp.asarray(batch["image"]),
                                   jnp.asarray(batch["part_masks"]),
                                   jnp.asarray(batch["part_valid"]))
        refined, valid = np.asarray(refined), np.asarray(valid)
        for b in range(refined.shape[0]):
            if not batch["batch_valid"][b]:
                continue
            rles = [rle_codec.encode(refined[b, k]) for k in range(capacity)
                    if valid[b, k]]
            if not rles:
                continue
            union = refined[b][valid[b]].any(0)
            n_saved += int(writer.write({
                "image_id": str(batch["image_id"][b]),
                "part_masks": rles,
                "object_ratio": float(union.mean()),
                "object_class": int(batch["class_id"][b]),
            }))
        if n_saved % 200 == 0:
            writer.flush()
    writer.close()
    print(json.dumps({"stage": "dcrf", "saved": n_saved,
                      "images_per_sec": round(n_saved / max(time.perf_counter() - t0, 1e-9), 3)}))


# ---------------------------------------------------------------- training


def _train_loop(cfg, trainer, loader, stage: str):
    from .engine.metrics import MetricLogger

    mlog = MetricLogger(os.path.join(cfg.checkpoint_dir, "logs", stage),
                        run_name=stage)
    t0 = time.perf_counter()
    n_img = 0
    for batch in loader:
        batch = {k: v for k, v in batch.items() if k != "image_id"}
        metrics = trainer.train_step(batch)
        n_img += int(np.asarray(batch["batch_valid"]).sum())
        step = trainer.step
        if step % cfg.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            ips = n_img / (time.perf_counter() - t0)
            logger.info("%s step %d: loss=%.4f grad=%.3f %.2f img/s",
                        stage, step, m.get("total_loss", float("nan")),
                        m.get("grad_norm", float("nan")), ips)
            mlog.log({**m, "images_per_sec": ips}, step)
        if trainer._ckpt is not None and step % cfg.checkpoint_every == 0:
            trainer.save()
        if step >= cfg.max_iters:
            break
    if trainer._ckpt is not None:
        trainer.save()
    mlog.close()
    return {"steps": trainer.step,
            "images_per_sec": round(n_img / max(time.perf_counter() - t0, 1e-9), 3)}


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

    seg = _segmenter_cfg(args.tiny, num_classes=1, num_queries=args.num_queries)
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
                                    normalize_images(jnp.zeros((1, size, size, 3)))))

    mesh = _fit_mesh(cfg.data.batch_size)
    trainer = Trainer(
        loss_fn=make_loss_fn(model_cfg),
        init_params=params,
        optimizer_cfg=OptimizerConfig(
            freeze_keys=("backbone", "pixel_decoder") if args.freeze_trunk else (),
            max_iter=cfg.max_iters),
        mesh=mesh,
        checkpoint_dir=os.path.join(cfg.checkpoint_dir, "proposal"),
        seed=cfg.seed)
    trainer.resume_or_load()

    mapper = ProposalTrainMapper(image_size=size, capacity=cfg.data.mask_capacity,
                                 seed=cfg.seed)
    loader = DataLoader(items, mapper, cfg.data.batch_size, shuffle=True,
                        seed=cfg.seed, epochs=None,
                        num_workers=cfg.data.num_workers, drop_last=True)
    stats = _train_loop(cfg, trainer, loader, "train-proposal")
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
    seg = _segmenter_cfg(args.tiny, num_classes=args.num_parts,
                         num_queries=args.num_queries,
                         num_object_classes=num_obj, num_parts=args.num_parts)
    n_pts = 1024 if args.tiny else 12544
    model_cfg = PartDistillationConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=args.num_parts, num_points=n_pts,
                                  matcher=MatcherConfig(num_points=n_pts)),
        num_parts=args.num_parts)
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(
            jax.random.PRNGKey(cfg.seed),
            normalize_images(jnp.zeros((1, size, size, 3))),
            gt_object_class=jnp.zeros((1,), jnp.int32)))

    mesh = _fit_mesh(cfg.data.batch_size, n_model=cfg.n_model_shards)
    trainer = Trainer(
        loss_fn=make_loss_fn(model_cfg),
        init_params=params,
        optimizer_cfg=OptimizerConfig(max_iter=cfg.max_iters),
        mesh=mesh,
        checkpoint_dir=os.path.join(cfg.checkpoint_dir, "part_distillation"),
        seed=cfg.seed)
    trainer.resume_or_load()

    mapper = PartDistillationTrainMapper(image_size=size,
                                         capacity=cfg.data.mask_capacity,
                                         seed=cfg.seed)
    loader = DataLoader(items, mapper, cfg.data.batch_size, shuffle=True,
                        seed=cfg.seed, epochs=None,
                        num_workers=cfg.data.num_workers, drop_last=True)
    stats = _train_loop(cfg, trainer, loader, "train-distillation")
    print(json.dumps({"stage": "train-distillation", **stats}))


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
    base = _imagenet_items(cfg, args)
    items = load_imagenet_with_proposals(
        base, cfg.paths.proposals_dcrf if not args.raw_proposals
        else cfg.paths.proposals)
    num_obj = args.num_object_classes or (
        1 + max((it["class_id"] for it in items), default=0))
    logger.info("stage 4: %d items, %d object classes, phases=%s",
                len(items), num_obj, phases)

    seg = _segmenter_cfg(args.tiny, num_classes=1, num_queries=args.num_queries)
    rank_cfg = PartRankingConfig(segmenter=seg, num_clusters=args.num_clusters,
                                 test_topk=args.num_queries)
    model = MaskFormerSegmenter(seg)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(model.init)(jax.random.PRNGKey(cfg.seed),
                                    normalize_images(jnp.zeros((1, size, size, 3)))))
    mapper = PartRankingMapper(image_size=size, capacity=cfg.data.mask_capacity)
    centroid_path = os.path.join(cfg.checkpoint_dir, "rank_centroids.npz")

    def batches():
        return batch_iterator(items, mapper, cfg.data.batch_size,
                              num_workers=cfg.data.num_workers)

    if "cluster" in phases:
        from .engine.launch import barrier, is_main_process

        cluster_fn = jax.jit(make_cluster_fn(rank_cfg))
        clusterer = ClusteringModule(num_obj, seg.decoder.hidden_dim,
                                     args.num_clusters,
                                     distributed=jax.process_count() > 1)
        for batch in batches():
            out = cluster_fn(params, {
                "image": jnp.asarray(batch["image"]),
                "masks": jnp.asarray(batch["part_masks"]),
                "mask_valid": jnp.asarray(batch["part_valid"]),
                "object_mask": jnp.asarray(batch["object_mask"])})
            bv = batch["batch_valid"]
            out = {k: np.asarray(v)[bv] for k, v in out.items()}
            clusterer.process(out, np.asarray(batch["class_id"])[bv])
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
        label_fn = jax.jit(make_label_fn(rank_cfg, RankingMode.SAVE))
        shard, num_shards = _shard_id(args)
        writer = ShardWriter(cfg.paths.part_masks_with_class, shard, num_shards)
        n_saved = 0
        for batch in batches():
            out = label_fn(params, {
                "image": jnp.asarray(batch["image"]),
                "object_label": jnp.asarray(batch["class_id"]),
                "masks": jnp.asarray(batch["part_masks"]),
                "mask_labels": jnp.zeros(batch["part_valid"].shape, jnp.int32),
                "mask_valid": jnp.asarray(batch["part_valid"]),
                "object_mask": jnp.asarray(batch["object_mask"])}, centroids)
            pm = np.asarray(out["pred_masks"])
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
                    "object_class": int(batch["class_id"][b]),
                }))
        writer.close()
        logger.info("stage 4 save: %d records", n_saved)

    if "match" in phases or "eval" in phases:
        _rank_match_eval(cfg, args, rank_cfg, params, centroid_path, phases, num_obj)

    print(json.dumps({"stage": "rank", "phases": phases}))


def _rank_match_eval(cfg, args, rank_cfg, params, centroid_path, phases, num_obj):
    """Match (majority-vote mapping) and eval (mIoU) on a GT part dataset."""
    import jax
    import jax.numpy as jnp

    from .data.datasets.part_imagenet import load_part_imagenet
    from .data.loader import batch_iterator
    from .data.mappers import PartEvalMapper
    from .evaluation.miou import MIoUEvaluator, MIoUMatcher
    from .models.meta_arch.part_ranking import RankingMode, make_label_fn

    items = load_part_imagenet(cfg.data.part_imagenet_json,
                               cfg.data.part_imagenet_images,
                               debug_limit=cfg.data.debug_limit)
    # Object-class ids must be the ImageNet-root GLOBAL vocabulary — the ids
    # the centroid bank (cluster phase) and vote mapping are indexed by. Eval
    # synsets outside the vocabulary (or beyond the configured bank size)
    # cannot be scored and are dropped.
    from .data.datasets.imagenet import global_code_to_id

    try:
        code_to_id = global_code_to_id(cfg.data.imagenet_root)
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
        logger.warning("rank match/eval: dropped %d items outside the %d-class "
                       "object vocabulary", n_before - len(items), num_obj)
    for it in items:
        it["class_id"] = code_to_id[it["class_code"]]
    n_gt_parts = args.num_gt_parts
    mapper = PartEvalMapper(image_size=cfg.data.image_size, capacity=16)
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
            np.savez(os.path.join(cfg.checkpoint_dir, "rank_mapping.npz"),
                     mapping=mapping_arr)
        barrier("rank_mapping_written")
        logger.info("stage 4 match: mapping for %d classes", len(votes))

    if "eval" in phases:
        if mapping_arr is None:
            mapping_arr = np.load(
                os.path.join(cfg.checkpoint_dir, "rank_mapping.npz"))["mapping"]
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


# ---------------------------------------------------------------- ablation


def _supervised_setup(cfg, args):
    """Shared by train/eval-supervised: items + model cfg + params."""
    import jax
    import jax.numpy as jnp

    from .data.datasets.part_imagenet import load_part_imagenet
    from .losses.criterion import CriterionConfig
    from .losses.matcher import MatcherConfig
    from .models.meta_arch.proposal import normalize_images
    from .models.meta_arch.supervised import SupervisedModelConfig
    from .models.segmenter import MaskFormerSegmenter

    items = load_part_imagenet(cfg.data.part_imagenet_json,
                               cfg.data.part_imagenet_images,
                               label_percentage=args.label_percentage,
                               debug_limit=cfg.data.debug_limit)
    n_cls = args.num_part_classes
    train_classes = 1 if args.class_agnostic else n_cls
    seg = _segmenter_cfg(args.tiny, num_classes=train_classes,
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
                                    normalize_images(jnp.zeros((1, size, size, 3)))))
    return items, model_cfg, params


def cmd_train_supervised(args):
    """Supervised / fewshot ablation: train on real part GT
    (supervised_train_net.py; fewshot via --label-percentage)."""
    cfg = _setup(args)
    from .data.loader import DataLoader, host_shard
    from .data.mappers import PartEvalMapper
    from .engine.optim import OptimizerConfig
    from .engine.trainer import Trainer
    from .models.meta_arch.supervised import make_loss_fn

    items, model_cfg, params = _supervised_setup(cfg, args)
    items = host_shard(items)
    logger.info("supervised: %d train items (label %% = %s)",
                len(items), args.label_percentage)

    gt_mapper = PartEvalMapper(image_size=cfg.data.image_size,
                               capacity=cfg.data.mask_capacity)

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
        seed=cfg.seed)
    trainer.resume_or_load()
    loader = DataLoader(items, mapper, cfg.data.batch_size, shuffle=True,
                        seed=cfg.seed, epochs=None,
                        num_workers=cfg.data.num_workers, drop_last=True)
    stats = _train_loop(cfg, trainer, loader, "train-supervised")
    print(json.dumps({"stage": "train-supervised", **stats}))


def cmd_eval_supervised(args):
    cfg = _setup(args)
    import jax
    import jax.numpy as jnp

    from .data.loader import batch_iterator
    from .data.mappers import PartEvalMapper
    from .evaluation.miou import SupervisedMIoUEvaluator
    from .models.meta_arch.supervised import make_inference_fn

    items, model_cfg, params = _supervised_setup(cfg, args)
    mapper = PartEvalMapper(image_size=cfg.data.image_size, capacity=16)
    infer_fn = jax.jit(make_inference_fn(model_cfg))
    evaluator = SupervisedMIoUEvaluator(gt_classes=args.num_part_classes)
    for batch in batch_iterator(items, mapper, cfg.data.batch_size,
                                num_workers=cfg.data.num_workers):
        out = infer_fn(params, {"image": jnp.asarray(batch["image"]),
                                "object_mask": jnp.asarray(batch["object_mask"])})
        bv = batch["batch_valid"]
        evaluator.process({k: np.asarray(v)[bv] for k, v in out.items()},
                          batch["gt_part_masks"][bv], batch["gt_part_labels"][bv],
                          batch["gt_valid"][bv], batch["object_class"][bv])
    from .engine.metrics import print_csv_format

    metrics = evaluator.evaluate()
    print_csv_format(metrics, task="eval-supervised")
    print(json.dumps({"stage": "eval-supervised", **metrics}))


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
        swin=_tiny_swin() if args.tiny else swin_large_config(),
        num_clusters=args.num_clusters)
    gen_fn = jax.jit(make_generation_fn(gen_cfg))
    backbone = SwinTransformer(gen_cfg.swin)
    size = cfg.data.image_size
    params = _restore_params(
        args.params,
        lambda: jax.jit(backbone.init)(
            jax.random.PRNGKey(cfg.seed),
            normalize_images(jnp.zeros((1, size, size, 3)))))

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

    p = sub.add_parser("propose", help="stage 2: pixel grouping")
    _add_common(p)
    p.add_argument("--num-clusters", type=int, default=4)
    p.set_defaults(fn=cmd_propose)

    p = sub.add_parser("dcrf", help="stage 2b: dense-CRF smoothing (on device)")
    _add_common(p)
    p.add_argument("--gt-prob", type=float, default=0.7)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--bilateral-sxy", type=float, default=20.0)
    p.set_defaults(fn=cmd_dcrf)

    p = sub.add_parser("train-proposal", help="stage 3: proposal learning")
    _add_common(p)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--freeze-trunk", action="store_true", default=True)
    p.add_argument("--no-freeze-trunk", dest="freeze_trunk", action="store_false")
    p.add_argument("--raw-proposals", action="store_true",
                   help="train on raw stage-2 output (skip dCRF)")
    p.set_defaults(fn=cmd_train_proposal)

    p = sub.add_parser("rank", help="stage 4: part ranking")
    _add_common(p)
    p.add_argument("--phases", default="cluster,save")
    p.add_argument("--num-clusters", type=int, default=8)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--num-object-classes", type=int, default=None)
    p.add_argument("--num-gt-parts", type=int, default=40)
    p.add_argument("--raw-proposals", action="store_true")
    p.set_defaults(fn=cmd_rank)

    p = sub.add_parser("train-distillation", help="stage 5: self-training")
    _add_common(p)
    p.add_argument("--num-queries", type=int, default=200)
    p.add_argument("--num-parts", type=int, default=8)
    p.add_argument("--num-object-classes", type=int, default=22000)
    p.set_defaults(fn=cmd_train_distillation)

    for name, fn in (("train-supervised", cmd_train_supervised),
                     ("eval-supervised", cmd_eval_supervised)):
        p = sub.add_parser(name, help="supervised/fewshot ablation")
        _add_common(p)
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
