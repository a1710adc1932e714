"""Bilinear sampling primitives (XLA-native grid_sample / point_sample).

These are the numerical core of (a) multi-scale deformable attention (reference
spec: ops/functions/ms_deform_attn_func.py:55-75, which uses
torch.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=False))
and (b) the PointRend-style point-sampled mask losses (reference
modeling/criterion.py:176-196 via detectron2 point_sample, align_corners=False).

Semantics match torch.nn.functional.grid_sample with align_corners=False and
zero padding: a normalized coordinate u in [-1, 1] maps to the pixel-space
coordinate ((u + 1) * S - 1) / 2, and out-of-range corner taps contribute zero.

Layout: images are channel-last (H, W, C) / (..., H, W, C) — the natural TPU
layout. Gathers are expressed as flat `jnp.take`, which XLA lowers to efficient
TPU dynamic-gathers and fuses with the surrounding elementwise work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bilinear_sample", "grid_sample", "point_sample",
           "separable_interp_weights", "grid_point_sample"]


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample `img` (H, W, C) at fractional pixel coords.

    Args:
      img: (H, W, C) array.
      x, y: arrays of identical shape `S` with pixel-space coordinates
        (0, 0) = center of the top-left pixel. Out-of-range taps read as zero.

    Returns:
      (*S, C) sampled values.
    """
    h, w, c = img.shape
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0f
    wy1 = y - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = img.reshape(h * w, c)

    def tap(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, c)
        return vals * (wgt * valid.astype(img.dtype))[..., None]

    return (
        tap(y0, x0, wy0 * wx0)
        + tap(y0, x1, wy0 * wx1)
        + tap(y1, x0, wy1 * wx0)
        + tap(y1, x1, wy1 * wx1)
    )


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch.grid_sample equivalent (bilinear, zeros, align_corners=False).

    Args:
      img: (H, W, C).
      grid: (..., 2) normalized coords in [-1, 1], last dim = (x, y).

    Returns:
      (..., C).
    """
    h, w, _ = img.shape
    x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5
    return bilinear_sample(img, x, y)


def point_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """detectron2-style point_sample: coords in [0, 1] (x, y), align_corners=False.

    Args:
      img: (H, W, C).
      coords: (..., 2) in [0, 1].

    Returns:
      (..., C).
    """
    return grid_sample(img, 2.0 * coords - 1.0)


# ------------------------------------------------------- separable (MXU) path


def separable_interp_weights(coords_1d: jnp.ndarray, size: int) -> jnp.ndarray:
    """Dense bilinear interpolation matrix for one axis.

    Args:
      coords_1d: (G,) normalized [0, 1] coordinates (align_corners=False).
      size: source extent S.

    Returns:
      (G, S) matrix W with at most two non-zeros per row such that
      ``W @ v`` equals 1-D linear interpolation of ``v`` at the coords, with
      zero padding outside [0, S-1] — the hat-function formulation
      ``w[g, s] = max(0, 1 - |p_g - s|)``.
    """
    p = coords_1d * size - 0.5  # pixel-space positions
    s = jnp.arange(size, dtype=p.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(p[:, None] - s[None, :]))


def grid_point_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling on a separable coordinate grid — gather-free.

    Exactly equals ``point_sample(img, outer_product_coords)`` but runs as two
    small dense matmuls (MXU work) instead of per-point gathers; on TPU the
    gather formulation is bandwidth-pathological for few-channel images (each
    scalar tap occupies a full lane transaction), while the interp matrices
    here are tiny ((G, S) with 2 non-zeros per row).

    Args:
      img: (H, W, C).
      ys: (Gy,) normalized [0, 1] y coords.
      xs: (Gx,) normalized [0, 1] x coords.

    Returns:
      (Gy, Gx, C).
    """
    h, w, _ = img.shape
    wy = separable_interp_weights(ys, h).astype(img.dtype)  # (Gy, H)
    wx = separable_interp_weights(xs, w).astype(img.dtype)  # (Gx, W)
    tmp = jnp.einsum("gh,hwc->gwc", wy, img, preferred_element_type=jnp.float32)
    return jnp.einsum("kw,gwc->gkc", wx, tmp.astype(img.dtype),
                      preferred_element_type=jnp.float32).astype(img.dtype)
