"""Stage-3 ProposalModel: class-agnostic part-proposal Mask2Former.

Capability parity with the reference ProposalModel
(part_distillation/proposal_model.py:31-475):
  * training: Hungarian + SetCriterion against dCRF-smoothed pseudo part masks
    with all-zero labels (proposal_model.py:313-338 — "each image has one
    object", labels are all class 0)
  * inference: upsample mask logits to image resolution, score = class-0
    softmax prob, top-k, object-mask gating, optional unique per-pixel
    assignment, conditional area-ratio/score filters, top-1-IoU GT matching
    for the AR evaluator (proposal_model.py:371-430, 267-302)

TPU design: the loss is a pure function of (params, batch, rng) over a global
padded batch — it jits/pjits as one program (matcher included, via the
on-device LSAP). Inference returns fixed-capacity (K slots + validity) arrays;
host code converts to ragged instances for evaluation/saving.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...losses.criterion import CriterionConfig, set_criterion
from ...ops.instance_post import (
    as_bool_mask,
    conditional_ratio_filter,
    conditional_score_filter,
    match_gt_top1,
    unique_assignment,
)
from ..segmenter import MaskFormerSegmenter, PIXEL_MEAN, PIXEL_STD, SegmenterConfig

__all__ = ["ProposalModelConfig", "normalize_images", "make_loss_fn", "make_inference_fn"]


@dataclasses.dataclass(frozen=True)
class ProposalModelConfig:
    segmenter: SegmenterConfig = SegmenterConfig()
    criterion: CriterionConfig = CriterionConfig(num_classes=1)
    test_topk: int = 200
    use_unique_per_pixel_label: bool = True
    min_score: float = -1.0
    min_ratio: float = 0.0
    apply_object_masking: bool = True
    match_iou_threshold: float = 0.001


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """uint8/float (B, H, W, 3) RGB -> ImageNet-normalized float."""
    mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(PIXEL_STD, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


def make_loss_fn(cfg: ProposalModelConfig):
    """Returns loss_fn(params, batch, key) -> (total_loss, metrics).

    batch: image (B,H,W,3), masks (B,T,H,W) bool, valid (B,T) bool.
    Labels are implicitly all-zero (class-agnostic).
    """
    model = MaskFormerSegmenter(cfg.segmenter)

    def loss_fn(params, batch, key, axis_name=None):
        k_drop, k_crit = jax.random.split(key)
        images = normalize_images(batch["image"])
        outputs = model.apply(params, images, train=True, rngs={"dropout": k_drop})
        targets = {
            "labels": jnp.zeros(batch["valid"].shape, jnp.int32),
            "masks": batch["masks"].astype(jnp.float32),
            "valid": batch["valid"],
        }
        total, losses = set_criterion(outputs, targets, k_crit, cfg.criterion, axis_name)
        return total, losses

    return loss_fn


def make_inference_fn(cfg: ProposalModelConfig):
    """Returns infer_fn(params, batch) -> fixed-capacity proposals + GT match.

    batch: image (B,H,W,3); part_masks (B,T,H,W) bool + part_labels (B,T) +
    part_valid (B,T) (GT parts, evaluation); object_masks (B,O,H,W) bool +
    object_valid (B,O).
    """
    model = MaskFormerSegmenter(cfg.segmenter)
    topk = cfg.test_topk

    def infer_one(logits, mask_logits, part_masks, part_labels, part_valid, object_masks, object_valid):
        h, w = part_masks.shape[-2:]
        mask_logits = jax.image.resize(
            mask_logits, (mask_logits.shape[0], h, w), method="linear"
        )
        # class scores: softmax over classes incl. no-object, drop no-object,
        # top-1 over remaining classes (proposal_model.py:385-389)
        probs = jax.nn.softmax(logits, axis=-1)[:, :-1]
        scores = jnp.max(probs, axis=-1)  # (Q,)
        scores, idx = jax.lax.top_k(scores, topk)
        mask_logits = jnp.take(mask_logits, idx, axis=0)

        if cfg.apply_object_masking:
            obj = jnp.any(object_masks & object_valid[:, None, None], axis=0)
            mask_logits = mask_logits * obj[None].astype(mask_logits.dtype)

        valid = jnp.ones((topk,), bool)
        if cfg.use_unique_per_pixel_label:
            seg, obj_map, valid = unique_assignment(mask_logits, scores, valid)
            valid = conditional_ratio_filter(seg, valid, obj_map, cfg.min_ratio)
            valid = conditional_score_filter(scores, valid, cfg.min_score)
            masks_bool = seg
        else:
            masks_bool = mask_logits > 0.0
            obj_map = jnp.any(masks_bool, axis=0)
            valid = conditional_ratio_filter(masks_bool, valid, obj_map, cfg.min_ratio)
            valid = conditional_score_filter(scores, valid, cfg.min_score)

        gt_labels, gt_idx, valid = match_gt_top1(
            masks_bool, valid, part_masks, part_labels, part_valid, cfg.match_iou_threshold
        )
        return {
            "pred_masks": masks_bool,
            "scores": scores,
            "pred_labels": gt_labels,
            "matched_gt": gt_idx,
            "valid": valid,
        }

    def infer_fn(params, batch):
        images = normalize_images(batch["image"])
        outputs = model.apply(params, images)
        return jax.vmap(infer_one)(
            outputs["pred_logits"],
            outputs["pred_masks"],
            as_bool_mask(batch["part_masks"]),
            batch["part_labels"],
            batch["part_valid"],
            as_bool_mask(batch["object_masks"]),
            batch["object_valid"],
        )

    return infer_fn
