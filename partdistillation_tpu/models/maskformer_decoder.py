"""MaskFormer-v1 DETR-style transformer decoder (single-scale).

Capability parity with the reference `modeling/transformer_decoder/
maskformer_transformer_decoder.py` (StandardTransformerDecoder :34-191): a
vanilla DETR transformer (optional encoder + decoder with learned query
embeddings) cross-attending one feature map, followed by a class head and a
3-layer mask-embed MLP whose output is einsum'd with stride-4 mask features.
Deep supervision returns every intermediate decoder layer's predictions.

Output dict uses the same keys as MultiScaleMaskedTransformerDecoder
(pred_logits, pred_masks, decoder_output, aux_outputs) so task models are
agnostic to which decoder the segmenter is configured with
(build_transformer_decoder factory, maskformer_transformer_decoder.py:25-30).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from .detr_transformer import DETRTransformerConfig, Transformer
from .position_encoding import position_embedding_sine

__all__ = ["StandardDecoderConfig", "StandardTransformerDecoder"]


@dataclasses.dataclass(frozen=True)
class StandardDecoderConfig:
    num_classes: int = 1
    hidden_dim: int = 256
    num_queries: int = 100
    num_heads: int = 8
    dim_feedforward: int = 2048
    enc_layers: int = 0
    dec_layers: int = 6
    pre_norm: bool = False
    deep_supervision: bool = True
    mask_dim: int = 256
    mask_classification: bool = True
    enforce_input_project: bool = False
    dtype: jnp.dtype = jnp.float32


class _MLP(nn.Module):
    hidden: int
    out: int
    layers: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"fc{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"fc{self.layers - 1}")(x)


class StandardTransformerDecoder(nn.Module):
    cfg: StandardDecoderConfig = StandardDecoderConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask_features: jnp.ndarray) -> dict:
        """x: (B, H, W, C) single feature map (the pixel decoder's encoder
        feature or coarsest map); mask_features: (B, H/4, W/4, mask_dim)."""
        cfg = self.cfg
        b, h, w, c = x.shape

        pos = position_embedding_sine(h, w, cfg.hidden_dim // 2, dtype=cfg.dtype)
        pos = jnp.broadcast_to(pos.reshape(1, h * w, cfg.hidden_dim),
                               (b, h * w, cfg.hidden_dim))

        if c != cfg.hidden_dim or cfg.enforce_input_project:
            x = nn.Conv(cfg.hidden_dim, (1, 1),
                        kernel_init=nn.initializers.xavier_uniform(),
                        dtype=cfg.dtype, name="input_proj")(x)
        src = x.reshape(b, h * w, cfg.hidden_dim)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (cfg.num_queries, cfg.hidden_dim))

        tx_cfg = DETRTransformerConfig(
            d_model=cfg.hidden_dim, num_heads=cfg.num_heads,
            dim_feedforward=cfg.dim_feedforward,
            num_encoder_layers=cfg.enc_layers, num_decoder_layers=cfg.dec_layers,
            pre_norm=cfg.pre_norm, return_intermediate=cfg.deep_supervision,
            dtype=cfg.dtype)
        hs, _ = Transformer(tx_cfg, name="transformer")(src, query_embed, pos=pos)
        # hs: (L, B, Q, C); L == dec_layers when deep supervision, else 1.

        mask_embed_mlp = _MLP(cfg.hidden_dim, cfg.mask_dim, 3, cfg.dtype, name="mask_embed")
        mask_embed = mask_embed_mlp(hs)  # (L, B, Q, mask_dim)
        masks = jnp.einsum("lbqc,bhwc->lbqhw", mask_embed, mask_features,
                           preferred_element_type=jnp.float32).astype(cfg.dtype)

        out = {"pred_masks": masks[-1], "decoder_output": hs[-1]}
        if cfg.mask_classification:
            logits = nn.Dense(cfg.num_classes + 1, dtype=cfg.dtype, name="class_embed")(hs)
            out["pred_logits"] = logits[-1]
            out["aux_outputs"] = [
                {"pred_logits": logits[i], "pred_masks": masks[i]}
                for i in range(hs.shape[0] - 1)
            ]
        else:
            out["aux_outputs"] = [{"pred_masks": masks[i]} for i in range(hs.shape[0] - 1)]
        return out
