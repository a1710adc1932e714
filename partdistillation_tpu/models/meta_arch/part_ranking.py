"""Stage-4 PartRankingModel: cluster -> classify -> label -> majority-vote.

Capability parity with the reference PartRankingModel
(part_distillation/part_ranking_model.py:28-566) and its 4-phase modal
evaluation (part_ranking_train_net.py:101-137, base_trainer.py:31-42):

  cluster: per image, top-k proposals by class-0 score, unique per-pixel
    assignment + conditional filters (min_*_1), object-mask gating, top-1-IoU
    match to the image's stage-2/3 masks (fg threshold 0.001); emit each
    surviving proposal's l2-normalized decoder feature (:519-536, :288-300)
  [host] per-object-class k-means (k=8) over the gathered features — the
    reference's rank-0 sklearn ClusteringModule (clustering_module.py:43-70)
    becomes an on-device masked k-means over a dense (C_obj, N_cap, D) buffer
  label/save: score(q, c) = class-0 prob x softmax(centroid score) ('l2' =
    negative distance or 'dot'); flattened top-k over (Q x k); unique
    assignment, merge-by-cluster, conditional filters (min_*_2); save part
    masks + cluster labels (:441-515, :260-274)
  match: accumulate per-object-class (pred cluster x GT part) confusion
    matrices; majority vote = per-row argmax (miou_matcher.py:43-107)
  eval: apply the vote mapping, mIoU evaluation (miou_evaluator.py)

Explicit mode enum instead of the reference's dataset-name-substring dispatch.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...ops.instance_post import (
    as_bool_mask,
    conditional_ratio_filter,
    conditional_score_filter,
    match_gt_top1,
    merge_by_class,
    unique_assignment,
)
from ..segmenter import MaskFormerSegmenter, SegmenterConfig
from .proposal import normalize_images

__all__ = ["PartRankingConfig", "RankingMode", "make_cluster_fn", "make_label_fn",
           "classifier_scores"]


class RankingMode(str, enum.Enum):
    CLUSTER = "cluster"
    SAVE = "save"
    MATCH = "match"
    EVAL = "eval"


@dataclasses.dataclass(frozen=True)
class PartRankingConfig:
    segmenter: SegmenterConfig = SegmenterConfig()
    num_clusters: int = 8
    classifier_metric: str = "l2"  # l2 | dot
    proposal_feature_norm: bool = True
    test_topk: int = 200
    min_ratio_1: float = 0.0
    min_score_1: float = 0.0
    min_ratio_2: float = 0.0
    min_score_2: float = 0.0
    use_unique_clustering: bool = True
    use_unique_labeling: bool = True
    apply_object_masking: bool = True
    fg_iou_threshold: float = 0.001


def _normed(feats, enable):
    if not enable:
        return feats
    return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)


def make_cluster_fn(cfg: PartRankingConfig):
    """fn(params, batch) -> per-image proposal features for clustering.

    batch: image (B,H,W,3); masks (B,T,H,W) bool (stage-2/3 proposals, the
    'GT' of the cluster phase); mask_valid (B,T); object_mask (B,H,W) bool.
    Returns: feats (B,K,D), scores (B,K), valid (B,K).
    """
    model = MaskFormerSegmenter(cfg.segmenter)
    topk = cfg.test_topk

    def cluster_one(logits, mask_logits, feats, tgt_masks, tgt_valid, obj_mask):
        h, w = tgt_masks.shape[-2:]
        mask_logits = jax.image.resize(mask_logits, (mask_logits.shape[0], h, w), "linear")
        scores = jax.nn.softmax(logits, axis=-1)[:, :-1].max(-1)
        scores, idx = jax.lax.top_k(scores, topk)
        mask_logits = jnp.take(mask_logits, idx, axis=0)
        feats = jnp.take(feats, idx, axis=0)

        valid = jnp.ones((topk,), bool)
        if cfg.use_unique_clustering:
            seg, obj_map, valid = unique_assignment(mask_logits, scores, valid)
            valid = conditional_ratio_filter(seg, valid, obj_map, cfg.min_ratio_1)
            valid = conditional_score_filter(scores, valid, cfg.min_score_1)
            masks_bool = seg
        else:
            masks_bool = mask_logits > 0.0
            obj_map = jnp.any(masks_bool, axis=0)
            valid = conditional_ratio_filter(masks_bool, valid, obj_map, cfg.min_ratio_1)
            valid = conditional_score_filter(scores, valid, cfg.min_score_1)

        if cfg.apply_object_masking:
            masks_bool = masks_bool & obj_mask[None]

        tgt_labels = jnp.zeros((tgt_masks.shape[0],), jnp.int32)
        _, _, valid = match_gt_top1(
            masks_bool, valid, tgt_masks, tgt_labels, tgt_valid, cfg.fg_iou_threshold
        )
        return masks_bool, scores, feats, valid

    def fn(params, batch):
        images = normalize_images(batch["image"])
        outputs = model.apply(params, images)
        feats = _normed(outputs["decoder_output"], cfg.proposal_feature_norm)
        masks, scores, pfeats, valid = jax.vmap(cluster_one)(
            outputs["pred_logits"], outputs["pred_masks"], feats,
            as_bool_mask(batch["masks"]), batch["mask_valid"],
            as_bool_mask(batch["object_mask"]),
        )
        return {"pred_masks": masks, "scores": scores, "feats": pfeats, "valid": valid}

    return fn


def classifier_scores(feats: jnp.ndarray, centroids: jnp.ndarray, metric: str) -> jnp.ndarray:
    """(Q, D) x (k, D) -> (Q, k): 'dot' or the reference's negative-l2 form
    (2ab - a^2 - b^2, part_ranking_model.py:448-463)."""
    ab = jnp.einsum("qd,kd->qk", feats, centroids)
    if metric == "dot":
        return ab
    aa = jnp.sum(feats * feats, axis=-1, keepdims=True)
    bb = jnp.sum(centroids * centroids, axis=-1)
    return 2.0 * ab - aa - bb[None, :]


def make_label_fn(cfg: PartRankingConfig, mode: RankingMode = RankingMode.SAVE,
                  num_label_space: Optional[int] = None):
    """fn(params, batch, centroids, mapping) -> labeled part masks.

    centroids: (num_object_classes, k, D) per-class classifier bank.
    mapping: (num_object_classes, k) int32 majority-vote mapping (EVAL mode).
    num_label_space: size of the label space after optional mapping — defaults
      to k (SAVE/MATCH); set to the GT part-class count for EVAL.
    batch: image; object_label (B,); masks/mask_valid (labeling targets or GT
    parts); object_mask (B,H,W).
    Output (after merge-by-label): pred_masks (B,L,H,W) bool,
    scores/labels/valid (B,L) with L = num_label_space.
    """
    model = MaskFormerSegmenter(cfg.segmenter)
    k = cfg.num_clusters
    topk = cfg.test_topk
    label_space = num_label_space or k

    def label_one(logits, mask_logits, feats, obj_label, centroids, mapping,
                  tgt_masks, tgt_labels, tgt_valid, obj_mask):
        h, w = tgt_masks.shape[-2:]
        q = logits.shape[0]
        mask_logits = jax.image.resize(mask_logits, (mask_logits.shape[0], h, w), "linear")
        object_scores = jax.nn.softmax(logits, axis=-1)[:, :1]  # (Q, 1) class-0
        cls_scores = jax.nn.softmax(
            classifier_scores(feats, centroids[obj_label], cfg.classifier_metric), axis=-1
        )  # (Q, k)
        scores = (object_scores * cls_scores).reshape(-1)  # (Q*k,)
        cluster_ids = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (q, 1)).reshape(-1)

        top_scores, top_idx = jax.lax.top_k(scores, topk)
        top_labels = cluster_ids[top_idx]
        if mode == RankingMode.EVAL:
            top_labels = mapping[obj_label][top_labels]
        query_idx = top_idx // k
        masks = jnp.take(mask_logits, query_idx, axis=0)

        if cfg.apply_object_masking:
            masks = masks * obj_mask[None].astype(masks.dtype)

        valid = jnp.ones((topk,), bool)
        num_out = label_space
        if cfg.use_unique_labeling:
            seg, obj_map, valid = unique_assignment(masks, top_scores, valid)
            cmasks, cscores, cvalid = merge_by_class(seg, top_scores, top_labels, valid,
                                                     num_out)
            clabels = jnp.arange(num_out, dtype=jnp.int32)
            cvalid = conditional_ratio_filter(cmasks, cvalid, obj_map, cfg.min_ratio_2)
            cvalid = conditional_score_filter(cscores, cvalid, cfg.min_score_2)
        else:
            cmasks = masks > 0.0
            cscores, clabels, cvalid = top_scores, top_labels, valid
            obj_map = jnp.any(cmasks, axis=0)
            cvalid = conditional_ratio_filter(cmasks, cvalid, obj_map, cfg.min_ratio_2)
            cvalid = conditional_score_filter(cscores, cvalid, cfg.min_score_2)

        matched_labels, _, matched_valid = match_gt_top1(
            cmasks, cvalid, tgt_masks, tgt_labels, tgt_valid, cfg.fg_iou_threshold
        )
        use_match = mode in (RankingMode.MATCH, RankingMode.EVAL)
        final_valid = matched_valid if use_match else cvalid
        return {
            "pred_masks": cmasks,
            "scores": cscores,
            "pred_labels": clabels,
            "gt_matched_labels": matched_labels,
            "valid": final_valid,
        }

    def fn(params, batch, centroids, mapping: Optional[jnp.ndarray] = None):
        images = normalize_images(batch["image"])
        outputs = model.apply(params, images)
        feats = _normed(outputs["decoder_output"], cfg.proposal_feature_norm)
        if mapping is None:
            mapping = jnp.zeros((centroids.shape[0], k), jnp.int32)
        return jax.vmap(
            lambda lg, ml, ft, ol, tm, tl, tv, om: label_one(
                lg, ml, ft, ol, centroids, mapping, tm, tl, tv, om
            )
        )(
            outputs["pred_logits"], outputs["pred_masks"], feats,
            batch["object_label"], as_bool_mask(batch["masks"]),
            batch["mask_labels"], batch["mask_valid"],
            as_bool_mask(batch["object_mask"]),
        )

    return fn
