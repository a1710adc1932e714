"""Instance post-processing toolkit: the reference's ragged per-image
topk -> unique-assignment -> filter -> merge -> GT-match chains, re-designed as
fixed-capacity masked computations that stay jittable on TPU.

Reference behaviors mirrored (with validity masks instead of shape changes):
  * unique per-pixel assignment: each pixel goes to its best-scoring query
    (score * sigmoid(mask logit)), gated by the "object map" (any mask logit
    positive); slots that own no pixels become invalid
    (proposal_model.py:267-302, part_ranking_model.py:359-399)
  * the reference's conditional filters — a filter is applied only if at least
    one candidate survives it (`if loc_valid_idxs.any()`, proposal_model.py:281-289)
  * merge-by-class: slots sharing a class label are unioned, keeping the max
    score (part_ranking_model.py:519-537 "merging")
  * top-1 IoU GT matching with a foreground threshold
    (proposal_model.py:418-430 match_gt_labels)

All functions operate on one image; vmap for batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "as_bool_mask",
    "unique_assignment",
    "conditional_ratio_filter",
    "conditional_score_filter",
    "merge_by_class",
    "match_gt_top1",
    "mask_iou_matrix",
]


def as_bool_mask(m: jnp.ndarray) -> jnp.ndarray:
    """Normalize a mask array to bool. Loader batches carry mask stacks as
    f32 (bool device inputs take a packed TPU layout whose conversion copy
    dominates step time — data/loader.py), so every jitted consumer with
    boolean semantics thresholds at entry; bool passes through unchanged."""
    return m if m.dtype == jnp.bool_ else m > 0.5


def unique_assignment(mask_logits: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray):
    """Per-pixel winner-take-all segmentation over K candidate masks.

    Args:
      mask_logits: (K, H, W) mask logits.
      scores: (K,) candidate scores.
      valid: (K,) bool candidate validity.

    Returns:
      (seg (K, H, W) bool, obj_map (H, W) bool, valid (K,) bool): seg[k] is the
      set of pixels whose argmax_{valid k'} score*sigmoid is k, intersected
      with obj_map = any-mask-positive; slots owning no pixels become invalid.
    """
    k = mask_logits.shape[0]
    obj_map = jnp.any(jnp.where(valid[:, None, None], mask_logits > 0.0, False), axis=0)
    scored = scores[:, None, None] * jax.nn.sigmoid(mask_logits)
    scored = jnp.where(valid[:, None, None], scored, -jnp.inf)
    winner = jnp.argmax(scored, axis=0)  # (H, W)
    seg = (winner[None] == jnp.arange(k)[:, None, None]) & obj_map[None]
    new_valid = valid & jnp.any(seg, axis=(1, 2))
    return seg, obj_map, new_valid


def conditional_ratio_filter(
    masks: jnp.ndarray, valid: jnp.ndarray, obj_map: jnp.ndarray, min_ratio: float
) -> jnp.ndarray:
    """valid &= area(mask)/area(obj_map) > min_ratio — but only if at least one
    candidate passes (the reference's `.any()` guard)."""
    area = jnp.sum(masks, axis=(1, 2)).astype(jnp.float32)
    obj_area = jnp.maximum(jnp.sum(obj_map).astype(jnp.float32), 1.0)
    keep = (area / obj_area) > min_ratio
    keep_any = jnp.any(keep & valid)
    return jnp.where(keep_any, valid & keep, valid)


def conditional_score_filter(
    scores: jnp.ndarray, valid: jnp.ndarray, min_score: float
) -> jnp.ndarray:
    keep = scores > min_score
    keep_any = jnp.any(keep & valid)
    return jnp.where(keep_any, valid & keep, valid)


def merge_by_class(
    masks: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray,
    num_classes: int,
):
    """Union all valid slots per class label; per-class score = max.

    Returns (class_masks (C, H, W) bool, class_scores (C,), class_valid (C,)).
    """
    onehot = (labels[:, None] == jnp.arange(num_classes)[None]) & valid[:, None]  # (K, C)
    class_masks = jnp.einsum(
        "kc,khw->chw", onehot.astype(jnp.float32), masks.astype(jnp.float32)
    ) > 0.0
    class_scores = jnp.max(
        jnp.where(onehot.T, scores[None, :], -jnp.inf), axis=1
    )
    class_valid = jnp.any(onehot, axis=0)
    class_scores = jnp.where(class_valid, class_scores, 0.0)
    return class_masks, class_scores, class_valid


def mask_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(K, H, W) x (T, H, W) boolean masks -> (K, T) IoU."""
    af = a.reshape(a.shape[0], -1).astype(jnp.float32)
    bf = b.reshape(b.shape[0], -1).astype(jnp.float32)
    inter = af @ bf.T
    union = af.sum(-1)[:, None] + bf.sum(-1)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


def match_gt_top1(
    masks: jnp.ndarray,
    valid: jnp.ndarray,
    gt_masks: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    iou_threshold: float = 0.001,
):
    """Top-1 IoU match each candidate to GT; drop candidates below threshold.

    Returns (matched_labels (K,), matched_idx (K,), valid (K,)).
    """
    iou = mask_iou_matrix(masks, gt_masks)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    top1_idx = jnp.argmax(iou, axis=1)
    top1_iou = jnp.take_along_axis(iou, top1_idx[:, None], axis=1)[:, 0]
    new_valid = valid & (top1_iou > iou_threshold)
    matched_labels = gt_labels[top1_idx]
    return matched_labels, top1_idx.astype(jnp.int32), new_valid
