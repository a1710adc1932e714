"""Set criterion: Hungarian-matched classification + point-sampled mask losses.

Behavioral parity with the reference SetCriterion (modeling/criterion.py:94-270):
  * CE over all queries; unmatched queries get the no-object class, weighted by
    eos_coef=0.1 (criterion.py:126-145), with torch's weighted-mean
    normalization (sum of per-class weights in the denominator)
  * mask losses computed on `num_points` PointRend-style sampled points per
    matched mask: 75% importance-sampled by prediction uncertainty (-|logit|)
    from a 3x oversampled uniform pool, 25% fresh uniform
    (criterion.py:176-196; detectron2 get_uncertain_point_coords_with_randomness)
  * sigmoid-CE mean-per-point and dice (+1/+1 smoothing), each summed over
    masks and divided by the (globally averaged, clamped) number of target
    masks (criterion.py:39-74, 247-254)
  * deep supervision: the same losses for every decoder layer's aux outputs
    (criterion.py:262-268)

On TPU the batch is a fixed-capacity padded pytree (labels/masks/valid); the
global mask-count normalization is a `psum` when an `axis_name` is given
(replacing torch.distributed.all_reduce at criterion.py:253).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.sampling import grid_point_sample, point_sample
from .matcher import MatcherConfig, _grid_axes, hungarian_match

__all__ = ["CriterionConfig", "set_criterion"]


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 1
    matcher: MatcherConfig = MatcherConfig()
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    no_object_weight: float = 0.1
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    deep_supervision: bool = True
    # "grid": gather-free TPU-native point selection. With ratio==0 this is a
    # jittered regular sqrt(P)^2 grid (an unbiased, lower-variance estimator of
    # the same expected loss as iid uniform points); with ratio>0 the losses
    # run dense on the prediction's native grid with importance *weights*: the
    # ~ratio*P most uncertain pixels (sort-free threshold bisection) get
    # weight 1 and every pixel gets the uniform fraction's expected weight.
    # "random": exact reference semantics (criterion.py:176-196) via gathers.
    # "auto" (default): grid when importance_sample_ratio == 0, else random.
    # A/B evidence (tools/ab_point_mode.py, 2x300-step tiny stage-3 runs,
    # PERF.md): at ratio==0 grid and random converge to the same dense-mask
    # dice (0.028/0.036 vs 0.024/0.035 across seeds); at ratio==0.75 the
    # dense WEIGHTED estimator trains the point loss lower but yields ~2x
    # worse dense dice across 3 seeds — not equivalent, so ratio>0 keeps the
    # reference's sampled form.
    point_mode: str = "auto"

    def resolved_point_mode(self) -> str:
        if self.point_mode != "auto":
            return self.point_mode
        return "grid" if self.importance_sample_ratio == 0 else "random"


def _uncertainty_points(mask_logits: jnp.ndarray, key: jax.Array, cfg: CriterionConfig):
    """Per-mask point coords (num_points, 2): importance + random mix."""
    k1, k2 = jax.random.split(key)
    n_imp = int(cfg.importance_sample_ratio * cfg.num_points)
    n_rand = cfg.num_points - n_imp
    rand = jax.random.uniform(k2, (n_rand, 2))
    if n_imp == 0:
        return rand
    n_over = int(cfg.num_points * cfg.oversample_ratio)
    pts = jax.random.uniform(k1, (n_over, 2))
    vals = point_sample(mask_logits[..., None], pts)[:, 0]
    uncertainty = -jnp.abs(vals)
    _, idx = jax.lax.top_k(uncertainty, n_imp)
    imp = jnp.take(pts, idx, axis=0)
    return jnp.concatenate([imp, rand], axis=0)


def point_losses(logits: jnp.ndarray, labels: jnp.ndarray, weights=None):
    """Per-mask (sigmoid-CE weighted-mean over points, dice over points) — the
    loss formulas of reference criterion.py:25-74 on sampled/weighted points."""
    ce_pp = labels * jax.nn.softplus(-logits) + (1.0 - labels) * jax.nn.softplus(logits)
    probs = jax.nn.sigmoid(logits)
    if weights is None:
        ce = jnp.mean(ce_pp)
        inter, psum, tsum = jnp.sum(probs * labels), jnp.sum(probs), jnp.sum(labels)
    else:
        ce = jnp.sum(weights * ce_pp) / jnp.maximum(jnp.sum(weights), 1e-6)
        inter = jnp.sum(weights * probs * labels)
        psum = jnp.sum(weights * probs)
        tsum = jnp.sum(weights * labels)
    dice = 1.0 - (2.0 * inter + 1.0) / (psum + tsum + 1.0)
    return ce, dice


def _importance_weights(uncertainty: jnp.ndarray, k: int, uniform_w: float, iters: int = 12):
    """Sort-free top-k selection mask: bisect a threshold t so that
    ~k entries with uncertainty >= t get weight 1; all entries additionally
    carry `uniform_w` (the uniform fraction's expected per-point weight)."""
    lo = jnp.min(uncertainty)
    hi = jnp.max(uncertainty)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        count = jnp.sum(uncertainty >= mid)
        # too many selected -> raise threshold
        return jnp.where(count > k, mid, lo), jnp.where(count > k, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    sel = (uncertainty >= 0.5 * (lo + hi)).astype(jnp.float32)
    return sel + uniform_w


def _loss_masks_one(pred_mask, tgt_mask, key, cfg: CriterionConfig):
    """Per matched pair: point selection + point losses.

    pred_mask: (h, w) logits at the prediction's native (stride-4) resolution;
    tgt_mask: (H, W) binary at image resolution.
    """
    if cfg.resolved_point_mode() == "grid":
        n_imp = int(cfg.importance_sample_ratio * cfg.num_points)
        if n_imp == 0:
            # jittered regular grid, fully separable sampling (no gathers)
            ys, xs = _grid_axes(key, cfg.num_points)
            logits = grid_point_sample(pred_mask[..., None], ys, xs)[..., 0].reshape(-1)
            labels = jax.lax.stop_gradient(
                grid_point_sample(tgt_mask[..., None].astype(jnp.float32), ys, xs)[..., 0]
            ).reshape(-1)
            return point_losses(logits, labels)
        # dense importance weighting on the prediction's own pixel grid; the
        # target is brought onto that grid by one separable resample.
        h, w = pred_mask.shape
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        labels = jax.lax.stop_gradient(
            grid_point_sample(tgt_mask[..., None].astype(jnp.float32), ys, xs)[..., 0]
        ).reshape(-1)
        logits = pred_mask.reshape(-1)
        uncertainty = jax.lax.stop_gradient(-jnp.abs(logits))
        n_rand = cfg.num_points - n_imp
        weights = _importance_weights(uncertainty, n_imp, uniform_w=n_rand / (h * w))
        return point_losses(logits, labels, weights)

    coords = jax.lax.stop_gradient(_uncertainty_points(pred_mask, key, cfg))
    logits = point_sample(pred_mask[..., None], coords)[:, 0]
    labels = jax.lax.stop_gradient(
        point_sample(tgt_mask[..., None].astype(jnp.float32), coords)[:, 0]
    )
    return point_losses(logits, labels)


def _single_layer_losses(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: CriterionConfig,
    num_masks: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    pred_logits = outputs["pred_logits"].astype(jnp.float32)
    pred_masks = outputs["pred_masks"].astype(jnp.float32)
    b, q, k = pred_logits.shape
    t = targets["labels"].shape[1]
    valid = targets["valid"]

    k_match, k_pts = jax.random.split(key)
    matched = hungarian_match(outputs, targets, k_match, cfg.matcher)  # (B, T)

    # ---- classification loss (weighted CE over all queries) ----
    no_object = cfg.num_classes
    b_idx = jnp.arange(b)[:, None]
    target_classes = jnp.full((b, q), no_object, jnp.int32)
    scatter_vals = jnp.where(valid, targets["labels"], no_object).astype(jnp.int32)
    target_classes = target_classes.at[b_idx, matched].set(scatter_vals)

    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    class_w = jnp.where(target_classes == no_object, cfg.no_object_weight, 1.0)
    loss_ce = jnp.sum(class_w * nll) / jnp.maximum(jnp.sum(class_w), 1e-6)

    # ---- mask losses on matched pairs ----
    pred_m = pred_masks[b_idx, matched]  # (B, T, h, w)
    keys = jax.random.split(k_pts, (b, t))
    loss_one = lambda pm, tm, kk: _loss_masks_one(pm, tm, kk, cfg)
    ce_per, dice_per = jax.vmap(jax.vmap(loss_one))(
        pred_m, targets["masks"].astype(jnp.float32), keys
    )
    vmask = valid.astype(jnp.float32)
    loss_mask = jnp.sum(ce_per * vmask) / num_masks
    loss_dice = jnp.sum(dice_per * vmask) / num_masks

    return {"loss_ce": loss_ce, "loss_mask": loss_mask, "loss_dice": loss_dice}


def set_criterion(
    outputs: Dict,
    targets: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: CriterionConfig,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full criterion with deep supervision.

    Args:
      outputs: {pred_logits, pred_masks, aux_outputs: [{...}, ...]}.
      targets: {labels (B,T) int, masks (B,T,H,W), valid (B,T) bool}.
      key: PRNG key (point sampling + matcher points).
      axis_name: optional mapped axis for cross-device mask-count psum.

    Returns:
      (total_loss, dict of individual losses).
    """
    num_local = jnp.sum(targets["valid"].astype(jnp.float32))
    if axis_name is not None:
        total = jax.lax.psum(num_local, axis_name)
        world = jax.lax.psum(jnp.float32(1.0), axis_name)
        num_masks = jnp.maximum(total / world, 1.0)
    else:
        num_masks = jnp.maximum(num_local, 1.0)

    layers = [outputs] + list(outputs.get("aux_outputs", []) if cfg.deep_supervision else [])
    keys = jax.random.split(key, len(layers))
    losses: Dict[str, jnp.ndarray] = {}
    total_loss = jnp.float32(0.0)
    for i, (layer_out, k) in enumerate(zip(layers, keys)):
        ld = _single_layer_losses(layer_out, targets, k, cfg, num_masks)
        suffix = "" if i == 0 else f"_{i - 1}"
        for name, val in ld.items():
            losses[name + suffix] = val
        total_loss = total_loss + (
            cfg.class_weight * ld["loss_ce"]
            + cfg.mask_weight * ld["loss_mask"]
            + cfg.dice_weight * ld["loss_dice"]
        )
    return total_loss, losses
