"""2-D sine/cosine positional encoding (DETR-style).

Behavioral parity with the reference PositionEmbeddingSine
(modeling/transformer_decoder/position_encoding.py:16-66) with normalize=True,
scale=2*pi, temperature=10000 — the configuration every reference model uses.
Channel-last output for TPU-friendly fusion with the feature maps.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["position_embedding_sine"]


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int = 128, temperature: float = 10000.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns (H, W, 2*num_pos_feats) sine PE (y features first, then x)."""
    scale = 2.0 * math.pi
    eps = 1e-6
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]  # cumsum of ones
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    pos_x = x[:, :, None] / dim_t  # broadcast x over rows
    pos_y = y[:, :, None] / dim_t
    pos_x = jnp.broadcast_to(pos_x, (h, w, num_pos_feats))
    pos_y = jnp.broadcast_to(pos_y, (h, w, num_pos_feats))

    def interleave(p):
        sin = jnp.sin(p[..., 0::2])
        cos = jnp.cos(p[..., 1::2])
        return jnp.stack([sin, cos], axis=-1).reshape(h, w, -1)

    return jnp.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1).astype(dtype)
