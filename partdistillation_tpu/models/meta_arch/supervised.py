"""Supervised / fewshot part-segmentation model (the reference's ablation).

Capability parity with part_distillation/supervised_model.py:1-478: the same
Mask2Former skeleton trained on *real* part ground truth, with the reference's
two switches:

* ``class_agnostic_learning`` — train with all-zero labels (num_classes=1),
  like the stage-3 proposal model (supervised_model.py:85-87,229-234);
* ``class_agnostic_inference`` — at eval, score by the class-agnostic max
  and take GT-matched labels, vs. classified inference over the part-class
  softmax (:386-389).

Fewshot learning (the reference's FEWSHOT_LEARNING config namespace) is the
same model trained on a ``label_percentage`` subset of the GT dataset —
handled by the data layer (load_part_imagenet(label_percentage=...), seed
1234 parity with register_part_imagenet.py:15-29).

Evaluation pairs with SupervisedMIoUEvaluator (single global confusion).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...losses.criterion import CriterionConfig, set_criterion
from ...ops.instance_post import (
    conditional_ratio_filter,
    conditional_score_filter,
    merge_by_class,
    unique_assignment,
)
from ..segmenter import MaskFormerSegmenter, SegmenterConfig
from .proposal import normalize_images

__all__ = ["SupervisedModelConfig", "make_loss_fn", "make_inference_fn"]


@dataclasses.dataclass(frozen=True)
class SupervisedModelConfig:
    segmenter: SegmenterConfig = SegmenterConfig()
    criterion: CriterionConfig = CriterionConfig(num_classes=1)
    num_part_classes: int = 40
    class_agnostic_learning: bool = False
    class_agnostic_inference: bool = False
    test_topk: int = 200
    use_unique_per_pixel_label: bool = True
    min_score: float = -1.0
    min_ratio: float = -1.0
    apply_object_masking: bool = True


def make_loss_fn(cfg: SupervisedModelConfig):
    """loss_fn(params, batch, key): batch has image, masks (B,T,H,W),
    labels (B,T) GT part classes, valid (B,T)."""
    model = MaskFormerSegmenter(cfg.segmenter)

    def loss_fn(params, batch, key, axis_name=None):
        k_drop, k_crit = jax.random.split(key)
        images = normalize_images(batch["image"])
        outputs = model.apply(params, images, train=True, rngs={"dropout": k_drop})
        labels = (jnp.zeros(batch["valid"].shape, jnp.int32)
                  if cfg.class_agnostic_learning
                  else batch["labels"].astype(jnp.int32))
        targets = {
            "labels": labels,
            "masks": batch["masks"].astype(jnp.float32),
            "valid": batch["valid"],
        }
        total, losses = set_criterion(outputs, targets, k_crit, cfg.criterion, axis_name)
        return total, losses

    return loss_fn


def make_inference_fn(cfg: SupervisedModelConfig):
    """infer_fn(params, batch) -> {pred_masks, pred_labels, scores, valid}
    with L = num_part_classes merged channels (semantic-style output for the
    Supervised_mIOU_Evaluator protocol)."""
    model = MaskFormerSegmenter(cfg.segmenter)
    topk = cfg.test_topk
    n_cls = cfg.num_part_classes

    def infer_one(logits, mask_logits, object_mask):
        h, w = object_mask.shape
        q = logits.shape[0]
        mask_logits = jax.image.resize(mask_logits, (q, h, w), method="linear")
        probs = jax.nn.softmax(logits, axis=-1)[:, :-1]  # (Q, C)

        if cfg.class_agnostic_inference:
            scores = jnp.max(probs, axis=-1)
            labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            top_scores, idx = jax.lax.top_k(scores, min(topk, q))
            top_labels = labels[idx]
            masks = jnp.take(mask_logits, idx, axis=0)
        else:
            flat = probs.reshape(-1)  # (Q*C,)
            k = min(topk, flat.shape[0])
            top_scores, flat_idx = jax.lax.top_k(flat, k)
            top_labels = (flat_idx % probs.shape[-1]).astype(jnp.int32)
            masks = jnp.take(mask_logits, flat_idx // probs.shape[-1], axis=0)

        if cfg.apply_object_masking:
            masks = masks * object_mask[None].astype(masks.dtype)

        valid = jnp.ones(top_scores.shape, bool)
        if cfg.use_unique_per_pixel_label:
            seg, obj_map, valid = unique_assignment(masks, top_scores, valid)
            cmasks, cscores, cvalid = merge_by_class(seg, top_scores, top_labels,
                                                     valid, n_cls)
            clabels = jnp.arange(n_cls, dtype=jnp.int32)
            cvalid = conditional_ratio_filter(cmasks, cvalid, obj_map, cfg.min_ratio)
            cvalid = conditional_score_filter(cscores, cvalid, cfg.min_score)
        else:
            cmasks, cscores, clabels, cvalid = masks > 0, top_scores, top_labels, valid
            obj_map = jnp.any(cmasks, axis=0)
            cvalid = conditional_ratio_filter(cmasks, cvalid, obj_map, cfg.min_ratio)
            cvalid = conditional_score_filter(cscores, cvalid, cfg.min_score)

        return {"pred_masks": cmasks, "scores": cscores,
                "pred_labels": clabels, "valid": cvalid}

    def infer_fn(params, batch):
        images = normalize_images(batch["image"])
        outputs = model.apply(params, images)
        return jax.vmap(infer_one)(
            outputs["pred_logits"], outputs["pred_masks"], batch["object_mask"]
        )

    return infer_fn
