"""Vanilla DETR-style transformer encoder/decoder stacks.

Capability parity with the reference's `modeling/transformer_decoder/
transformer.py` (Transformer :23, TransformerEncoder/Decoder(Layer)
:82,109,158,234): pre-/post-norm encoder and decoder layers with additive
positional embeddings injected at every attention, and a decoder that can
return all intermediate layer outputs for deep supervision.

These stacks back the v1 MaskFormer path (StandardTransformerDecoder,
maskformer_decoder.py) and the TransformerEncoderPixelDecoder FPN variant
(fpn.py). The Mask2Former production path uses the masked decoder in
transformer_decoder.py instead.

TPU notes: batch-first layout (B, S, C) throughout (the reference uses
sequence-first for torch MHA); dropout omitted — every production config in
the reference trains Mask2Former with DROPOUT 0.0, and eval-only stages never
enable it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .attention import MultiHeadAttention

__all__ = ["DETRTransformerConfig", "TransformerEncoder", "TransformerDecoder", "Transformer"]


@dataclasses.dataclass(frozen=True)
class DETRTransformerConfig:
    d_model: int = 256
    num_heads: int = 8
    dim_feedforward: int = 2048
    num_encoder_layers: int = 0  # v1 MaskFormer keeps the encoder in the pixel decoder
    num_decoder_layers: int = 6
    pre_norm: bool = False
    return_intermediate: bool = True
    dtype: jnp.dtype = jnp.float32


def _padding_block_mask(key_padding_mask: Optional[jnp.ndarray]):
    """(B, K) True=padded -> (B, 1, 1, K) blocking mask for MultiHeadAttention."""
    if key_padding_mask is None:
        return None
    return key_padding_mask[:, None, None, :]


class _FFN(nn.Module):
    cfg: DETRTransformerConfig

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.cfg.dim_feedforward, dtype=self.cfg.dtype, name="linear1")(x)
        return nn.Dense(self.cfg.d_model, dtype=self.cfg.dtype, name="linear2")(nn.relu(y))


class TransformerEncoderLayer(nn.Module):
    """Self-attention + FFN with PE added to q/k (reference transformer.py:158-231)."""

    cfg: DETRTransformerConfig

    @nn.compact
    def __call__(self, src, pos=None, key_padding_mask=None):
        cfg = self.cfg
        block = _padding_block_mask(key_padding_mask)
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm2")
        attn = MultiHeadAttention(cfg.d_model, cfg.num_heads, dtype=cfg.dtype, name="self_attn")
        ffn = _FFN(cfg, name="ffn")

        def with_pos(x):
            return x if pos is None else x + pos

        if cfg.pre_norm:
            x = norm1(src)
            src = src + attn(with_pos(x), with_pos(x), x, block)
            src = src + ffn(norm2(src))
        else:
            src = norm1(src + attn(with_pos(src), with_pos(src), src, block))
            src = norm2(src + ffn(src))
        return src


class TransformerDecoderLayer(nn.Module):
    """Self-attn over queries, cross-attn to memory, FFN
    (reference transformer.py:234-332)."""

    cfg: DETRTransformerConfig

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, pos=None, memory_key_padding_mask=None):
        cfg = self.cfg
        block = _padding_block_mask(memory_key_padding_mask)
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm2")
        norm3 = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm3")
        self_attn = MultiHeadAttention(cfg.d_model, cfg.num_heads, dtype=cfg.dtype,
                                       name="self_attn")
        cross_attn = MultiHeadAttention(cfg.d_model, cfg.num_heads, dtype=cfg.dtype,
                                        name="cross_attn")
        ffn = _FFN(cfg, name="ffn")

        def qp(x):
            return x if query_pos is None else x + query_pos

        def kp(x):
            return x if pos is None else x + pos

        if cfg.pre_norm:
            x = norm1(tgt)
            tgt = tgt + self_attn(qp(x), qp(x), x, None)
            x = norm2(tgt)
            tgt = tgt + cross_attn(qp(x), kp(memory), memory, block)
            tgt = tgt + ffn(norm3(tgt))
        else:
            tgt = norm1(tgt + self_attn(qp(tgt), qp(tgt), tgt, None))
            tgt = norm2(tgt + cross_attn(qp(tgt), kp(memory), memory, block))
            tgt = norm3(tgt + ffn(tgt))
        return tgt


class TransformerEncoder(nn.Module):
    cfg: DETRTransformerConfig

    @nn.compact
    def __call__(self, src, pos=None, key_padding_mask=None):
        for i in range(self.cfg.num_encoder_layers):
            src = TransformerEncoderLayer(self.cfg, name=f"layer{i}")(
                src, pos=pos, key_padding_mask=key_padding_mask)
        if self.cfg.pre_norm and self.cfg.num_encoder_layers > 0:
            src = nn.LayerNorm(epsilon=1e-5, dtype=self.cfg.dtype, name="norm")(src)
        return src


class TransformerDecoder(nn.Module):
    """Returns (L, B, Q, C) intermediates when return_intermediate, else
    (1, B, Q, C) of the final (normed) output — reference transformer.py:109-155."""

    cfg: DETRTransformerConfig

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, pos=None, memory_key_padding_mask=None):
        cfg = self.cfg
        norm = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm")
        intermediates = []
        for i in range(cfg.num_decoder_layers):
            tgt = TransformerDecoderLayer(cfg, name=f"layer{i}")(
                tgt, memory, query_pos=query_pos, pos=pos,
                memory_key_padding_mask=memory_key_padding_mask)
            if cfg.return_intermediate:
                intermediates.append(norm(tgt))
        if cfg.return_intermediate:
            return jnp.stack(intermediates, axis=0)
        return norm(tgt)[None]


class Transformer(nn.Module):
    """Full encoder+decoder over a flattened feature map
    (reference transformer.py:23-79).

    Args: src (B, S, C) flattened features; query_embed (Q, C) learned query
    positional embeddings; pos (B, S, C) sine PE. Returns (hs, memory) with
    hs (L_or_1, B, Q, C) and memory (B, S, C).
    """

    cfg: DETRTransformerConfig

    @nn.compact
    def __call__(self, src, query_embed, pos=None, key_padding_mask=None):
        b = src.shape[0]
        memory = TransformerEncoder(self.cfg, name="encoder")(
            src, pos=pos, key_padding_mask=key_padding_mask)
        q = query_embed.shape[0]
        query_pos = jnp.broadcast_to(query_embed[None], (b, q, query_embed.shape[1]))
        tgt = jnp.zeros_like(query_pos)
        hs = TransformerDecoder(self.cfg, name="decoder")(
            tgt, memory, query_pos=query_pos, pos=pos,
            memory_key_padding_mask=key_padding_mask)
        return hs, memory
