"""Attention building blocks: plain MHA with additive masking and the
MSDeformAttn module (projections + sampling-offset prediction around the
ops.ms_deform_attn sampling core).

MSDeformAttn parity target: ops/modules/ms_deform_attn.py:38-131 — including
its characteristic initialization (sampling-offset bias laid out as a rotated
unit grid scaled by point index, zero-initialized attention weights).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.ms_deform_attn import ms_deform_attn

__all__ = ["MultiHeadAttention", "MSDeformAttn"]


class MultiHeadAttention(nn.Module):
    """Standard MHA with an optional boolean blocking mask.

    `block_mask` follows torch.nn.MultiheadAttention semantics: True = the
    (query, key) pair is NOT allowed to attend. Shape (B, num_heads, Q, K) or
    broadcastable. Softmax runs in f32 for stability regardless of dtype.
    """

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_fused: bool = False  # Pallas fused kernel on TPU (ops/fused_attention)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        key: jnp.ndarray,  # (B, K, C)
        value: jnp.ndarray,  # (B, K, C)
        block_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, q, _ = query.shape
        k = key.shape[1]
        hd = self.dim // self.num_heads

        def split(x, name):
            x = nn.Dense(self.dim, dtype=self.dtype, name=name)(x)
            return x.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh = split(query, "q_proj") * (hd**-0.5)
        kh = split(key, "k_proj")
        vh = split(value, "v_proj")

        if self.use_fused:
            from ..ops.fused_attention import fused_masked_attention

            mask = None
            if block_mask is not None:
                mask = jnp.broadcast_to(
                    block_mask, (b,) + block_mask.shape[-3:])
            out = fused_masked_attention(qh, kh, vh, mask)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                                preferred_element_type=jnp.float32)
            if block_mask is not None:
                logits = jnp.where(block_mask, jnp.float32(-1e9), logits)
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, q, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


def _sampling_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Rotated-grid bias: head h points along angle 2*pi*h/H, point p scaled by
    (p+1); normalized so max |coord| = 1 (ops/modules/ms_deform_attn.py:70-78)."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for p in range(n_points):
            grid[:, :, p, :] *= p + 1
        return jnp.asarray(grid.reshape(-1), dtype=dtype)

    return init


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention layer (encoder self-attention).

    Query predicts, per head/level, `n_points` fractional sampling locations
    relative to its reference point, plus softmax weights over all
    n_levels*n_points taps; values are bilinearly sampled and combined.
    """

    dim: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    # sampling-core formulation (ops.ms_deform_attn): None = backend default.
    # "banded" is exact while taps stay within band_radius rows of the
    # reference (true at the offset init; verify trained weights with
    # ops.ms_deform_attn.msda_band_oob_fraction).
    msda_mode: Optional[str] = None
    band_radius: int = 6
    band_tile_queries: int = 512
    # 2-D blocking for "banded" (tile edge cap; None = 1-D row bands)
    band_tile_x: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Lq, C)
        reference_points: jnp.ndarray,  # (B, Lq, n_levels, 2) in [0, 1]
        value_flatten: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],  # static
    ) -> jnp.ndarray:
        b, lq, _ = query.shape
        m, L, p = self.n_heads, self.n_levels, self.n_points
        d = self.dim // m

        value = nn.Dense(self.dim, dtype=self.dtype, name="value_proj")(value_flatten)
        value = value.reshape(b, -1, m, d)

        offsets = nn.Dense(
            m * L * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offset_bias_init(m, L, p),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(b, lq, m, L, p, 2)

        weights = nn.Dense(
            m * L * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(b, lq, m, L * p)
        weights = jax.nn.softmax(weights, axis=-1).reshape(b, lq, m, L, p)

        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=jnp.float32
        )  # (L, 2) as (W, H)
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )

        out = ms_deform_attn(value, tuple(spatial_shapes), locations, weights,
                             mode=self.msda_mode, band_radius=self.band_radius,
                             band_tile_queries=self.band_tile_queries,
                             band_tile_x=self.band_tile_x)
        return nn.Dense(self.dim, dtype=self.dtype, name="output_proj")(out)
