"""Deformable-attention pixel decoder (Mask2Former-style), TPU-native.

Capability parity with the reference MSDeformAttnPixelDecoder
(modeling/pixel_decoder/msdeformattn.py:27-362): a 6-layer deformable
transformer encoder over {res3, res4, res5} (processed high-stride first),
followed by a single FPN step onto res2 to produce stride-4 `mask_features`,
plus the three encoder feature maps for the masked transformer decoder.

All feature maps are channel-last; level geometry is static under jit, so the
flatten/split bookkeeping (the reference's level_start_index tensors) is free.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import MSDeformAttn
from .position_encoding import position_embedding_sine

__all__ = ["PixelDecoderConfig", "MSDeformAttnPixelDecoder"]


@dataclasses.dataclass(frozen=True)
class PixelDecoderConfig:
    conv_dim: int = 256
    mask_dim: int = 256
    transformer_layers: int = 6
    transformer_ffn_dim: int = 1024
    n_heads: int = 8
    n_points: int = 4
    transformer_in_features: Tuple[str, ...] = ("res3", "res4", "res5")
    fpn_in_feature: str = "res2"
    num_output_levels: int = 3
    dtype: jnp.dtype = jnp.float32
    # ops.ms_deform_attn sampling-core mode (None = backend default);
    # "banded" requires taps within msda_band_radius rows of the reference
    # (see msda_band_oob_fraction for the runtime counter)
    msda_mode: "str | None" = None
    msda_band_radius: int = 6
    # query-tile cap for "banded" (speed only, never exactness; 512 measured
    # best — larger tiles exceed the fused-dot VMEM budget, PERF.md round 3)
    msda_band_tile_queries: int = 512
    # 2-D blocking for "banded": cap on BOTH query-tile edges; each tile then
    # contracts against a (rows x cols) block instead of full-width rows.
    # None = 1-D row bands. Exactness contract applies per axis.
    msda_band_tile_x: "int | None" = None


def _reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """(S, L, 2) normalized per-level pixel-center reference points, each
    level's centers broadcast across all L level slots (valid ratios = 1)."""
    pts = []
    for h, w in spatial_shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
    ref = jnp.concatenate(pts, axis=0)  # (S, 2)
    return jnp.broadcast_to(ref[:, None, :], (ref.shape[0], len(spatial_shapes), 2))


class _EncoderLayer(nn.Module):
    cfg: PixelDecoderConfig

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        attn = MSDeformAttn(
            dim=self.cfg.conv_dim,
            n_levels=len(spatial_shapes),
            n_heads=self.cfg.n_heads,
            n_points=self.cfg.n_points,
            dtype=self.cfg.dtype,
            msda_mode=self.cfg.msda_mode,
            band_radius=self.cfg.msda_band_radius,
            band_tile_queries=self.cfg.msda_band_tile_queries,
            band_tile_x=self.cfg.msda_band_tile_x,
            name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.cfg.dtype, name="norm1")(src + attn)

        y = nn.Dense(self.cfg.transformer_ffn_dim, dtype=self.cfg.dtype, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dense(self.cfg.conv_dim, dtype=self.cfg.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.cfg.dtype, name="norm2")(src + y)


class MSDeformAttnPixelDecoder(nn.Module):
    """Returns (mask_features, encoder_feature, multi_scale_features).

    mask_features: (B, H/4, W/4, mask_dim)
    multi_scale_features: list of (B, H_l, W_l, conv_dim), strides [32, 16, 8].
    """

    cfg: PixelDecoderConfig = PixelDecoderConfig()

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        cfg = self.cfg
        xavier = nn.initializers.xavier_uniform()

        # High-stride first (res5, res4, res3), matching the reference's
        # reversed transformer_in_features ordering.
        keys = list(cfg.transformer_in_features)[::-1]
        srcs, poss, spatial_shapes = [], [], []
        for i, k in enumerate(keys):
            x = features[k]
            b, h, w, _ = x.shape
            proj = nn.Conv(
                cfg.conv_dim, (1, 1), kernel_init=xavier, dtype=cfg.dtype,
                name=f"input_proj{i}",
            )(x)
            proj = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=cfg.dtype, name=f"input_norm{i}")(proj)
            srcs.append(proj.reshape(b, h * w, cfg.conv_dim))
            poss.append(
                jnp.broadcast_to(
                    position_embedding_sine(h, w, cfg.conv_dim // 2, dtype=cfg.dtype).reshape(
                        1, h * w, cfg.conv_dim
                    ),
                    (b, h * w, cfg.conv_dim),
                )
            )
            spatial_shapes.append((h, w))

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (len(keys), cfg.conv_dim)
        )
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(
            [p + level_embed[i][None, None, :] for i, p in enumerate(poss)], axis=1
        )
        ref = _reference_points(spatial_shapes)[None]  # (1, S, L, 2)
        ref = jnp.broadcast_to(ref, (src.shape[0],) + ref.shape[1:])

        for li in range(cfg.transformer_layers):
            src = _EncoderLayer(cfg, name=f"layer{li}")(src, pos, ref, spatial_shapes)

        # Split back into per-level maps (stride 32, 16, 8).
        outs: List[jnp.ndarray] = []
        start = 0
        for h, w in spatial_shapes:
            outs.append(src[:, start : start + h * w].reshape(-1, h, w, cfg.conv_dim))
            start += h * w

        # FPN step: res2 lateral + upsampled stride-8 map -> stride-4 features.
        x2 = features[cfg.fpn_in_feature]
        lateral = nn.Conv(
            cfg.conv_dim, (1, 1), use_bias=False, kernel_init=xavier, dtype=cfg.dtype,
            name="fpn_lateral",
        )(x2)
        lateral = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=cfg.dtype, name="fpn_lateral_norm")(lateral)
        top = outs[-1]
        y = lateral + _resize_bilinear(top, lateral.shape[1], lateral.shape[2])
        y = nn.Conv(
            cfg.conv_dim, (3, 3), use_bias=False, kernel_init=xavier, dtype=cfg.dtype,
            name="fpn_output",
        )(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=cfg.dtype, name="fpn_output_norm")(y)
        y = nn.relu(y)

        mask_features = nn.Conv(
            cfg.mask_dim, (3, 3), kernel_init=xavier, dtype=cfg.dtype, name="mask_features"
        )(y)

        multi_scale = outs[: cfg.num_output_levels]
        return mask_features, outs[0], multi_scale


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize (half-pixel centers == align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="linear")
