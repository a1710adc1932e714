"""Stage-5 PartDistillationModel: self-training with the per-object-class
part classifier.

Capability parity with the reference PartDistillationModel
(part_distillation/part_distillation_model.py:33-529):
  * training: targets are stage-4 ranked part masks + cluster labels in
    [0, num_parts); the class head is the gradient-masked
    num_object_classes*num_parts+1 classifier, sliced per image by
    gt_object_class (part_distillation_model.py:405-428; decoder head
    part_distillation_transformer_decoder.py:107,215-230); matching/CE run in
    the sliced (P+1)-logit space (criterion num_classes = NUM_PART_CLASSES)
  * inference: scores = softmax over P+1 drop-no-object, flattened (Q*P) topk,
    optional majority-vote mapping cluster->GT-part (eval mode), object-mask
    gating, unique assignment + merge-by-class, top-1-IoU GT match; oracle
    classifier option (part_distillation_model.py:460-529)
  * save mode: emit final per-image part masks + labels for the dataset
    distillation output (part_distillation_model.py:290-311)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...losses.criterion import CriterionConfig, set_criterion
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

__all__ = ["PartDistillationConfig", "make_loss_fn", "make_inference_fn"]


@dataclasses.dataclass(frozen=True)
class PartDistillationConfig:
    segmenter: SegmenterConfig = SegmenterConfig()
    criterion: CriterionConfig = CriterionConfig(num_classes=8)
    num_parts: int = 8
    test_topk: int = 200
    use_unique_per_pixel_label: bool = True
    min_score: float = -1.0
    min_ratio: float = -1.0
    apply_object_masking: bool = True
    match_iou_threshold: float = 0.001
    use_oracle_classifier: bool = False


def make_loss_fn(cfg: PartDistillationConfig):
    """loss_fn(params, batch, key) for stage-5 self-training.

    batch: image (B,H,W,3); masks (B,T,H,W) bool part pseudo-masks;
    labels (B,T) int32 in [0, num_parts); valid (B,T);
    gt_object_class (B,) int32.
    """
    model = MaskFormerSegmenter(cfg.segmenter)

    def loss_fn(params, batch, key, axis_name=None):
        k_drop, k_crit = jax.random.split(key)
        images = normalize_images(batch["image"])
        outputs = model.apply(
            params, images, train=True,
            gt_object_class=batch["gt_object_class"],
            rngs={"dropout": k_drop},
        )
        targets = {
            "labels": batch["labels"].astype(jnp.int32),
            "masks": batch["masks"].astype(jnp.float32),
            "valid": batch["valid"],
        }
        total, losses = set_criterion(outputs, targets, k_crit, cfg.criterion, axis_name)
        return total, losses

    return loss_fn


def make_inference_fn(cfg: PartDistillationConfig, mode: str = "save"):
    """infer_fn(params, batch, majority_vote_mapping) -> fixed-capacity parts.

    mode: "save" (raw cluster labels) | "eval" (majority-vote mapped labels).
    majority_vote_mapping: (num_object_classes, num_parts) int32 or None.
    batch (eval): part_masks/part_labels/part_valid (GT), object_masks/
    object_valid, gt_object_class; (save): object from pseudo-masks.
    """
    model = MaskFormerSegmenter(cfg.segmenter)
    p = cfg.num_parts
    topk = cfg.test_topk

    def infer_one(logits, mask_logits, obj_class, mapping,
                  part_masks, part_labels, part_valid, object_masks, object_valid):
        h, w = part_masks.shape[-2:]
        q = logits.shape[0]
        mask_logits = jax.image.resize(
            mask_logits, (mask_logits.shape[0], h, w), method="linear"
        )
        scores = jax.nn.softmax(logits, axis=-1)[:, :-1]  # (Q, P)
        flat_scores = scores.reshape(-1)
        labels_flat = jnp.tile(jnp.arange(p, dtype=jnp.int32)[None], (q, 1)).reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat_scores, topk)
        top_labels = labels_flat[top_idx]
        if mode == "eval":
            top_labels = mapping[obj_class][top_labels]
        query_idx = top_idx // p
        masks = jnp.take(mask_logits, query_idx, axis=0)

        if cfg.apply_object_masking:
            obj = jnp.any(object_masks & object_valid[:, None, None], axis=0)
            masks = masks * obj[None].astype(masks.dtype)

        valid = jnp.ones((topk,), bool)
        if cfg.use_unique_per_pixel_label:
            seg, obj_map, valid = unique_assignment(masks, top_scores, valid)
            cmasks, cscores, cvalid = merge_by_class(seg, top_scores, top_labels, valid, p)
            clabels = jnp.arange(p, dtype=jnp.int32)
            cvalid = conditional_ratio_filter(cmasks, cvalid, obj_map, cfg.min_ratio)
            cvalid = conditional_score_filter(cscores, cvalid, cfg.min_score)
        else:
            cmasks = masks > 0.0
            cscores, clabels, cvalid = top_scores, top_labels, valid
            obj_map = jnp.any(cmasks, axis=0)
            cvalid = conditional_ratio_filter(cmasks, cvalid, obj_map, cfg.min_ratio)
            cvalid = conditional_score_filter(cscores, cvalid, cfg.min_score)

        gt_labels, gt_idx, matched_valid = match_gt_top1(
            cmasks, cvalid, part_masks, part_labels, part_valid, cfg.match_iou_threshold
        )
        out_labels = gt_labels if cfg.use_oracle_classifier else clabels
        return {
            "pred_masks": cmasks,
            "scores": cscores,
            "pred_labels": out_labels,
            "gt_matched_labels": gt_labels,
            "valid": matched_valid if mode == "eval" else cvalid,
        }

    def infer_fn(params, batch, majority_vote_mapping: Optional[jnp.ndarray] = None):
        images = normalize_images(batch["image"])
        outputs = model.apply(params, images, gt_object_class=batch["gt_object_class"])
        if majority_vote_mapping is None:
            majority_vote_mapping = jnp.zeros((1, p), jnp.int32)  # unused in save mode
        return jax.vmap(
            lambda *a: infer_one(*a[:3], majority_vote_mapping, *a[3:])
        )(
            outputs["pred_logits"],
            outputs["pred_masks"],
            batch["gt_object_class"],
            as_bool_mask(batch["part_masks"]),
            batch["part_labels"],
            batch["part_valid"],
            as_bool_mask(batch["object_masks"]),
            batch["object_valid"],
        )

    return infer_fn
