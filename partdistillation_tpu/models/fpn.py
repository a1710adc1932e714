"""FPN pixel decoders (the MaskFormer-v1 alternative to the deformable one).

Capability parity with the reference `modeling/pixel_decoder/fpn.py`:
  * BasePixelDecoder (:42-164): plain top-down FPN over res2..res5 — 1x1
    lateral + 3x3 output convs (GroupNorm + ReLU), nearest upsampling, a 3x3
    mask_features conv on the finest map; returns the three coarsest decoded
    maps as multi_scale_features (coarse -> fine, matching the deformable
    decoder's contract).
  * TransformerEncoderPixelDecoder (:209-316): same FPN, but the coarsest
    level is first run through a DETR transformer encoder (input 1x1 proj +
    sine PE); the encoder output is also returned as
    `transformer_encoder_features` for the v1 StandardTransformerDecoder.
  * build_pixel_decoder (:25-37) -> factory `build_pixel_decoder` here,
    selecting by config name ("msdeform" | "fpn" | "transformer_fpn").

All maps channel-last; shapes static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .detr_transformer import DETRTransformerConfig, TransformerEncoder
from .position_encoding import position_embedding_sine

__all__ = ["FPNPixelDecoderConfig", "BasePixelDecoder", "TransformerEncoderPixelDecoder",
           "build_pixel_decoder"]


@dataclasses.dataclass(frozen=True)
class FPNPixelDecoderConfig:
    conv_dim: int = 256
    mask_dim: int = 256
    in_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")  # fine -> coarse
    num_output_levels: int = 3
    # TransformerEncoderPixelDecoder extras
    transformer_enc_layers: int = 6
    n_heads: int = 8
    transformer_ffn_dim: int = 2048
    transformer_pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32


def _upsample_nearest(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="nearest")


class _ConvGNReLU(nn.Module):
    dim: int
    kernel: int
    dtype: jnp.dtype
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (self.kernel, self.kernel), use_bias=False,
                    kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype,
                    name="conv")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.relu(x) if self.relu else x


class BasePixelDecoder(nn.Module):
    """Returns (mask_features, encoder_feature_or_None, multi_scale_features).

    multi_scale_features: the `num_output_levels` coarsest decoded maps in
    coarse->fine order (strides 32, 16, 8 for the default in_features) — the
    same contract as MSDeformAttnPixelDecoder so decoders are interchangeable.
    """

    cfg: FPNPixelDecoderConfig = FPNPixelDecoderConfig()

    def _coarsest(self, x: jnp.ndarray):
        """Hook: process the coarsest feature map. Returns (decoded, encoder_feature)."""
        y = _ConvGNReLU(self.cfg.conv_dim, 3, self.cfg.dtype, name="output_conv0")(x)
        return y, None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        cfg = self.cfg
        keys = list(cfg.in_features)[::-1]  # coarse -> fine
        multi_scale = []
        y = None
        encoder_feature = None
        for idx, k in enumerate(keys):
            x = features[k]
            if idx == 0:
                y, encoder_feature = self._coarsest(x)
            else:
                lateral = _ConvGNReLU(cfg.conv_dim, 1, cfg.dtype, relu=False,
                                      name=f"lateral_conv{idx}")(x)
                y = lateral + _upsample_nearest(y, lateral.shape[1], lateral.shape[2])
                y = _ConvGNReLU(cfg.conv_dim, 3, cfg.dtype, name=f"output_conv{idx}")(y)
            if len(multi_scale) < cfg.num_output_levels:
                multi_scale.append(y)
        mask_features = nn.Conv(cfg.mask_dim, (3, 3),
                                kernel_init=nn.initializers.xavier_uniform(),
                                dtype=cfg.dtype, name="mask_features")(y)
        return mask_features, encoder_feature, multi_scale


class TransformerEncoderPixelDecoder(BasePixelDecoder):
    """FPN whose coarsest level passes through a DETR transformer encoder
    first; that encoder output is the v1 decoder's memory."""

    def _coarsest(self, x: jnp.ndarray):  # runs inside __call__'s compact scope
        cfg = self.cfg
        b, h, w, _ = x.shape
        proj = nn.Conv(cfg.conv_dim, (1, 1),
                       kernel_init=nn.initializers.xavier_uniform(),
                       dtype=cfg.dtype, name="input_proj")(x)
        pos = position_embedding_sine(h, w, cfg.conv_dim // 2, dtype=cfg.dtype)
        pos = jnp.broadcast_to(pos.reshape(1, h * w, cfg.conv_dim), (b, h * w, cfg.conv_dim))
        enc_cfg = DETRTransformerConfig(
            d_model=cfg.conv_dim, num_heads=cfg.n_heads,
            dim_feedforward=cfg.transformer_ffn_dim,
            num_encoder_layers=cfg.transformer_enc_layers,
            pre_norm=cfg.transformer_pre_norm, dtype=cfg.dtype)
        mem = TransformerEncoder(enc_cfg, name="transformer")(
            proj.reshape(b, h * w, cfg.conv_dim), pos=pos)
        encoder_feature = mem.reshape(b, h, w, cfg.conv_dim)
        y = _ConvGNReLU(cfg.conv_dim, 3, cfg.dtype, name="output_conv0")(encoder_feature)
        return y, encoder_feature


def build_pixel_decoder(name: str, cfg):
    """Factory matching the reference's PIXEL_DECODER_NAME registry dispatch
    (fpn.py:25-37). `cfg` is the matching config dataclass for the decoder."""
    from .pixel_decoder import MSDeformAttnPixelDecoder

    table = {
        "msdeform": MSDeformAttnPixelDecoder,
        "fpn": BasePixelDecoder,
        "transformer_fpn": TransformerEncoderPixelDecoder,
    }
    if name not in table:
        raise ValueError(f"unknown pixel decoder {name!r}; options: {sorted(table)}")
    return table[name](cfg, name="pixel_decoder")
