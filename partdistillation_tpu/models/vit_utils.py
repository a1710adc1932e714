"""ViT backbone helpers (window attention + decomposed relative positions).

Capability parity with the reference `modeling/backbone/utils.py`:
window_partition/unpartition (:13-61), get_rel_pos (:67-97),
add_decomposed_rel_pos (:100-129), get_abs_pos (:132-161), PatchEmbed
(:164-190). The reference keeps these for ViT-Det-style backbones even though
its shipped configs only use Swin; they are part of the public modeling
surface, so the TPU build carries them too.

All functions are jit-safe for static H/W (shapes are compile-time constants
in this framework), channel-last layout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "window_partition",
    "window_unpartition",
    "get_rel_pos",
    "add_decomposed_rel_pos",
    "get_abs_pos",
    "PatchEmbed",
]


def window_partition(x: jnp.ndarray, window_size: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nWin, ws, ws, C), zero-padding H/W up to multiples
    of `window_size`. Returns (windows, (Hp, Wp)) so unpartition can crop."""
    b, h, w, c = x.shape
    pad_h = (-h) % window_size
    pad_w = (-w) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, c)
    return windows, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, window_size: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of window_partition; crops back to the original (H, W)."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(b, hp // window_size, wp // window_size, window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Slice (and linearly resize if needed) a relative-position table to the
    (q_size, k_size) pairwise distances. rel_pos: (L, C) with
    L >= 2 * max(q, k) - 1 trained entries. Returns (q_size, k_size, C)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear")
    # Coordinate deltas, scaled when q and k grids have different sizes.
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative.astype(jnp.int32)]


def add_decomposed_rel_pos(
    attn: jnp.ndarray,
    q: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_size: Tuple[int, int],
    k_size: Tuple[int, int],
) -> jnp.ndarray:
    """Add decomposed (axial) relative position bias to attention logits
    (mvitv2 scheme). attn: (B, q_h*q_w, k_h*k_w); q: (B, q_h*q_w, C)."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = get_rel_pos(q_h, k_h, rel_pos_h)  # (q_h, k_h, C)
    rw = get_rel_pos(q_w, k_w, rel_pos_w)  # (q_w, k_w, C)

    r_q = q.reshape(q.shape[0], q_h, q_w, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)

    attn = attn.reshape(q.shape[0], q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(q.shape[0], q_h * q_w, k_h * k_w)


def get_abs_pos(abs_pos: jnp.ndarray, has_cls_token: bool, hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize a pretrained absolute position embedding (1, L[, +1], C) to the
    target (H, W) token grid; returns (1, H, W, C)."""
    h, w = hw
    if has_cls_token:
        abs_pos = abs_pos[:, 1:]
    num_pos = abs_pos.shape[1]
    size = int(round(num_pos**0.5))
    assert size * size == num_pos, f"abs_pos length {num_pos} is not square"
    grid = abs_pos.reshape(1, size, size, -1)
    if (size, size) != (h, w):
        grid = jax.image.resize(grid, (1, h, w, grid.shape[-1]), method="bicubic")
    return grid


class PatchEmbed(nn.Module):
    """Image-to-patch embedding via strided conv (reference utils.py:164-190)."""

    embed_dim: int = 768
    patch_size: Tuple[int, int] = (16, 16)
    stride: Tuple[int, int] = (16, 16)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True  # CLIP's patch conv is bias-free
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, H', W', embed_dim)."""
        return nn.Conv(
            self.embed_dim, self.patch_size, strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            use_bias=self.use_bias, dtype=self.dtype, name="proj")(x)
