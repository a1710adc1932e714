"""Hungarian matcher with point-sampled mask costs, fully on device.

Behavioral parity with the reference HungarianMatcher
(modeling/matcher.py:74-191):
  * class cost = -prob[target] (sigmoid when the head has 1 logit, softmax
    otherwise — matcher.py:109-112)
  * mask cost = per-point sigmoid CE averaged over a single shared set of
    `num_points` points per image (matcher.py:128-140) — iid uniform in
    point_mode="random" (exact reference semantics), or a jittered regular
    grid in point_mode="grid" (default: same point count, equal-or-lower
    estimator variance, and gather-free separable sampling on the MXU)
  * dice cost with +1/+1 smoothing (matcher.py:19-34)
  * exact LSAP — here solved on device (losses/lsap.py) instead of a per-image
    scipy CPU round trip.

Padding convention: targets are fixed-capacity (B, T) with a validity mask;
invalid rows get a constant cost so they cannot distort the valid rows'
optimum (constant rows are assignment-indifferent).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.sampling import grid_point_sample, point_sample
from .lsap import solve_lsap


def _grid_axes(key: jax.Array, num_points: int):
    """One jittered regular (gy, gx) grid covering >= num_points points.

    gy*gx is the smallest grid of near-square aspect with at least num_points
    cells (exactly sqrt(P)^2 when P is square, e.g. the production 12544=112^2);
    a shared random offset per call keeps the estimator unbiased over steps.
    """
    gy = math.isqrt(num_points)
    if gy * gy < num_points:
        gy += 1
    gx = -(-num_points // gy)
    u = jax.random.uniform(key, (2,))
    ys = (jnp.arange(gy, dtype=jnp.float32) + u[0]) / gy
    xs = (jnp.arange(gx, dtype=jnp.float32) + u[1]) / gx
    return ys, xs

__all__ = ["MatcherConfig", "hungarian_match", "batch_dice_cost", "batch_sigmoid_ce_cost"]


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    cost_class: float = 2.0
    cost_mask: float = 5.0
    cost_dice: float = 5.0
    num_points: int = 12544
    # "grid": jittered regular sqrt(P) x sqrt(P) grid, sampled with the
    # separable gather-free MXU path (ops/sampling.grid_point_sample) — an
    # equal-coverage Monte-Carlo estimator of the same point costs, TPU-native.
    # "random": iid uniform points, exact reference semantics
    # (matcher.py:128-140) via per-point gathers.
    point_mode: str = "grid"


def batch_dice_cost(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """(Q, P) logits x (T, P) binary -> (Q, T) dice cost."""
    probs = jax.nn.sigmoid(inputs)
    numerator = 2.0 * jnp.einsum("qp,tp->qt", probs, targets)
    denominator = probs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def batch_sigmoid_ce_cost(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """(Q, P) logits x (T, P) binary -> (Q, T) mean-per-point BCE cost."""
    p = inputs.shape[1]
    # bce(x, 1) = softplus(-x); bce(x, 0) = softplus(x)
    pos = jax.nn.softplus(-inputs)
    neg = jax.nn.softplus(inputs)
    loss = jnp.einsum("qp,tp->qt", pos, targets) + jnp.einsum("qp,tp->qt", neg, 1.0 - targets)
    return loss / p


def _match_one(
    pred_logits: jnp.ndarray,  # (Q, K) — K == 1 -> sigmoid scoring
    pred_masks: jnp.ndarray,  # (Q, h, w) logits
    tgt_labels: jnp.ndarray,  # (T,)
    tgt_masks: jnp.ndarray,  # (T, H, W) binary
    tgt_valid: jnp.ndarray,  # (T,) bool
    key: jax.Array,  # per-image PRNG key for the shared point set
    cfg: MatcherConfig,
) -> jnp.ndarray:
    q = pred_logits.shape[0]
    t = tgt_labels.shape[0]

    if pred_logits.shape[-1] == 1:
        prob = jax.nn.sigmoid(pred_logits)  # (Q, 1)
    else:
        prob = jax.nn.softmax(pred_logits, axis=-1)
    cost_class = -jnp.take_along_axis(
        jnp.broadcast_to(prob, (q, prob.shape[-1])),
        jnp.broadcast_to(jnp.clip(tgt_labels, 0, prob.shape[-1] - 1)[None, :], (q, t)),
        axis=1,
    )  # (Q, T)

    if cfg.point_mode == "grid":
        ys, xs = _grid_axes(key, cfg.num_points)
        pred_pts = grid_point_sample(pred_masks.transpose(1, 2, 0), ys, xs)
        pred_pts = pred_pts.reshape(-1, q).T.astype(jnp.float32)  # (Q, P)
        tgt_pts = grid_point_sample(
            tgt_masks.transpose(1, 2, 0).astype(jnp.float32), ys, xs
        ).reshape(-1, t).T  # (T, P)
    else:
        points = jax.random.uniform(key, (cfg.num_points, 2))
        pred_pts = point_sample(
            pred_masks.transpose(1, 2, 0), points).T.astype(jnp.float32)  # (Q, P)
        tgt_pts = point_sample(
            tgt_masks.transpose(1, 2, 0).astype(jnp.float32), points).T  # (T, P)

    cost = (
        cfg.cost_mask * batch_sigmoid_ce_cost(pred_pts, tgt_pts)
        + cfg.cost_class * cost_class
        + cfg.cost_dice * batch_dice_cost(pred_pts, tgt_pts)
    )
    # constant row for padded targets: assignment-indifferent
    cost = jnp.where(tgt_valid[None, :], cost, 1e4)
    # rows = targets (T <= Q), cols = queries
    return solve_lsap(cost.T)  # (T,) query index per target slot


def hungarian_match(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: MatcherConfig,
) -> jnp.ndarray:
    """Batched matching.

    Args:
      outputs: pred_logits (B, Q, K), pred_masks (B, Q, h, w).
      targets: labels (B, T), masks (B, T, H, W), valid (B, T).
      key: PRNG key for the shared random point set (one per image).

    Returns:
      (B, T) int32 — matched query index for every target slot (padded slots
      get an arbitrary spare query; mask with targets["valid"]).
    """
    b = outputs["pred_logits"].shape[0]
    keys = jax.random.split(key, b)
    match_fn = lambda *args: _match_one(*args, cfg)  # cfg is static
    return jax.vmap(match_fn)(
        outputs["pred_logits"],
        outputs["pred_masks"],
        targets["labels"],
        targets["masks"],
        targets["valid"],
        keys,
    )
