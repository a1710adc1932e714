"""Masked transformer decoder (Mask2Former-style) + PartDistillation variant.

Capability parity targets:
  * MultiScaleMaskedTransformerDecoder
    (modeling/transformer_decoder/mask2former_transformer_decoder.py:212-472):
    9 decoder layers cycling over 3 feature scales, each layer = masked
    cross-attention -> self-attention -> FFN (post-norm), with per-layer
    prediction heads producing class logits, mask logits
    (einsum query-embed x mask-features) and the <0.5-sigmoid attention mask
    consumed by the next layer. Deep supervision over all layers.
  * PartDistillationTransformerDecoder
    (modeling/transformer_decoder/part_distillation_transformer_decoder.py:22-254):
    same trunk, but the classification head is one giant
    `num_object_classes * num_parts + 1` linear layer whose gradient/logit
    window is sliced per image to that image's object class (8 part slots +
    no-object). The reference ran this head in float64 to keep a 176k-way
    softmax stable; here the slice-first design (gather 8+1 logits, then
    softmax) keeps everything in f32 on the MXU — SURVEY.md §7 "hard parts" #6.

TPU design notes: the attention mask is computed from the previous layer's mask
logits by average-pool-style bilinear resize, kept as a boolean block mask fed
to f32 softmax logits. All shapes static; queries padded to num_queries.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import MultiHeadAttention
from .position_encoding import position_embedding_sine

__all__ = [
    "TransformerDecoderConfig",
    "MultiScaleMaskedTransformerDecoder",
    "PartDistillationTransformerDecoder",
]


@dataclasses.dataclass(frozen=True)
class TransformerDecoderConfig:
    num_classes: int = 1
    hidden_dim: int = 256
    num_queries: int = 200
    num_heads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9  # DEC_LAYERS - 1 in reference accounting
    mask_dim: int = 256
    num_feature_levels: int = 3
    query_feature_normalize: bool = False
    # PartDistillation head
    num_object_classes: int = 0  # >0 enables the per-object-class part head
    num_parts: int = 8
    # How the giant head slices each image's P+1 live columns:
    #   "gather": jnp.take — backward is a scatter-add into the 176k-column
    #     kernel. Under DONATION on a single chip this scatter-add faults the
    #     TPU worker at first execution (reproduced round 3 AND round 4 via
    #     tools/repro_donation_fault.py's full-program harness; a faulted
    #     worker can also poison the NEXT gather program).
    #   "onehot": slice via a 0/1 matmul — backward is a dense matmul,
    #     measured crash-free WITH donation at identical speed (356.4 vs
    #     354.9 ms/step at bs8, PERF.md round 4). Gradient-parity-tested
    #     (tests/test_head_slice.py). PD_HEAD_SLICE env overrides for A/B.
    head_slice: str = "gather"
    dtype: jnp.dtype = jnp.float32
    # Pallas fused masked attention for the decoder's cross-attention
    # (TPU only; XLA composition elsewhere). ops/fused_attention.py.
    use_fused_attention: bool = True
    # Attention-block-mask construction (VERDICT r4 #2 layout-copy attack):
    #   False — reference-shaped: bilinearly resize each layer's full-res
    #     (B, Q, H/4, W/4) mask logits down to the next layer's key scale
    #     (10 resizes + their relayout copies per step, profiled ~1.1 ms x10).
    #   True  — resize `mask_features` ONCE per key scale and contract the
    #     query embed against the small resized features. Bilinear resize is
    #     linear in its input and the mask logits are linear in the features
    #     (masks = membed . features), so resize(membed . F) ==
    #     membed . resize(F) exactly up to float reassociation — the boolean
    #     block mask is identical except for values within float error of the
    #     0.5 sigmoid threshold (equivalence tested in
    #     tests/test_models.py::test_attn_mask_from_features_equivalent).
    #     A/B knob: BENCH_MASK_MAJOR.
    # Default True since round 5: interleaved repeat A/B measured a
    # reproducible -2.7 ms/step on the stage-3 bench (630.6/630.9 vs
    # 633.8/633.0 ms), additive with qkv_layout="bfn" (combined 629.9/629.8
    # ms = 25.40 img/s — PERF.md round 5).
    attn_mask_from_features: bool = True
    # Cast the per-layer mask logits from the einsum's f32 accumulate down to
    # the compute dtype. The cast existed to feed the bf16 resize chain of
    # the reference-shaped attention-mask path; with attn_mask_from_features
    # the only consumers are the criterion (recasts to f32) and the outputs —
    # the round-5 profile showed the casts as 7.2 ms/step of convert copies
    # (predictor scope). A/B knob: BENCH_MASK_CAST.
    cast_mask_logits: bool = True


class _MLP(nn.Module):
    hidden: int
    out: int
    layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"fc{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"fc{self.layers - 1}")(x)


class _DecoderLayer(nn.Module):
    """Masked cross-attention -> self-attention -> FFN, post-norm."""

    cfg: TransformerDecoderConfig

    @nn.compact
    def __call__(self, q, q_pos, src, src_pos, block_mask):
        cfg = self.cfg
        ca = MultiHeadAttention(cfg.hidden_dim, cfg.num_heads, dtype=cfg.dtype,
                                use_fused=cfg.use_fused_attention, name="cross_attn")(
            q + q_pos, src + src_pos, src, block_mask
        )
        q = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm_cross")(q + ca)

        sa = MultiHeadAttention(cfg.hidden_dim, cfg.num_heads, dtype=cfg.dtype, name="self_attn")(
            q + q_pos, q + q_pos, q, None
        )
        q = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm_self")(q + sa)

        y = nn.Dense(cfg.dim_feedforward, dtype=cfg.dtype, name="ffn1")(q)
        y = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype, name="ffn2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm_ffn")(q + y)


def _threshold_block_mask(m: jnp.ndarray):
    """(B, Q, h, w) mask logits at the key scale -> (B, 1, Q, h*w) boolean
    block mask; rows that would block everything are fully unblocked
    (reference mask2former_transformer_decoder.py:385, 452-455)."""
    b, q, h, w = m.shape
    blocked = jax.nn.sigmoid(m).reshape(b, q, h * w) < 0.5
    all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
    blocked = jnp.where(all_blocked, False, blocked)
    blocked = jax.lax.stop_gradient(blocked)
    # (B, 1, Q, K): heads share the mask — keep it unbroadcast so the fused
    # kernel DMAs one copy per query tile instead of one per head.
    return blocked[:, None]


def _attn_block_mask(mask_logits: jnp.ndarray, hw: Tuple[int, int], num_heads: int):
    """(B, Q, H, W) mask logits -> (B, 1, Q, h*w) boolean block mask at the
    next layer's scale (the reference-shaped path: resize-then-threshold)."""
    b, q = mask_logits.shape[:2]
    h, w = hw
    # antialias=False: plain bilinear point-sampling at half-pixel centers,
    # exactly torch F.interpolate(mode="bilinear", align_corners=False)
    # (mask2former_transformer_decoder.py:452) — the default antialiased
    # downsample would shift sigmoid values across the 0.5 threshold
    m = jax.image.resize(mask_logits, (b, q, h, w), method="linear",
                         antialias=False)
    del num_heads
    return _threshold_block_mask(m)


class MultiScaleMaskedTransformerDecoder(nn.Module):
    cfg: TransformerDecoderConfig

    def _build_class_head(self):
        """Returns fn(dec, gt_object_class) -> logits; params created once."""
        dense = nn.Dense(self.cfg.num_classes + 1, dtype=self.cfg.dtype, name="class_embed")
        return lambda dec, gt: dense(dec)

    @nn.compact
    def __call__(
        self,
        multi_scale_features: List[jnp.ndarray],  # [(B, H_l, W_l, C)], stride 32,16,8
        mask_features: jnp.ndarray,  # (B, H/4, W/4, mask_dim)
        gt_object_class: Optional[jnp.ndarray] = None,  # (B,) for the PD head
    ) -> dict:
        cfg = self.cfg
        assert len(multi_scale_features) == cfg.num_feature_levels
        b = mask_features.shape[0]

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (cfg.num_feature_levels, cfg.hidden_dim)
        )
        srcs, poss, sizes = [], [], []
        for i, x in enumerate(multi_scale_features):
            _, h, w, c = x.shape
            sizes.append((h, w))
            if c != cfg.hidden_dim:
                x = nn.Conv(cfg.hidden_dim, (1, 1), dtype=cfg.dtype, name=f"input_proj{i}")(x)
            srcs.append(x.reshape(b, h * w, cfg.hidden_dim) + level_embed[i][None, None])
            poss.append(
                jnp.broadcast_to(
                    position_embedding_sine(h, w, cfg.hidden_dim // 2, dtype=cfg.dtype).reshape(
                        1, h * w, cfg.hidden_dim
                    ),
                    (b, h * w, cfg.hidden_dim),
                )
            )

        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (cfg.num_queries, cfg.hidden_dim)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (cfg.num_queries, cfg.hidden_dim)
        )
        output = jnp.broadcast_to(query_feat[None], (b, cfg.num_queries, cfg.hidden_dim))
        q_pos = jnp.broadcast_to(query_embed[None], (b, cfg.num_queries, cfg.hidden_dim))

        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="decoder_norm")
        mask_embed_mlp = _MLP(cfg.hidden_dim, cfg.mask_dim, 3, dtype=cfg.dtype, name="mask_embed")
        class_head = self._build_class_head()

        if cfg.attn_mask_from_features:
            # one bilinear resize of the (B, H/4, W/4, mask_dim) features per
            # key scale, shared by all 10 prediction-head calls — replaces 10
            # full-res (B, Q, H/4, W/4) mask-logit resizes + their relayouts
            fc = mask_features.shape[-1]
            feats_small = {
                (h, w): jax.lax.stop_gradient(jax.image.resize(
                    mask_features, (b, h, w, fc), method="linear",
                    antialias=False))
                for (h, w) in set(sizes)
            }

        def prediction_heads(out, attn_size):
            dec = decoder_norm(out)  # (B, Q, C)
            logits = class_head(dec, gt_object_class)
            membed = mask_embed_mlp(dec)
            if cfg.query_feature_normalize:
                membed = membed / (jnp.linalg.norm(membed, axis=-1, keepdims=True) + 1e-12)
            masks = jnp.einsum(
                "bqc,bhwc->bqhw", membed, mask_features, preferred_element_type=jnp.float32
            )
            if cfg.cast_mask_logits or not cfg.attn_mask_from_features:
                # the reference-shaped path NEEDS the compute-dtype masks
                # (the bf16 resize chain consumes them)
                masks = masks.astype(cfg.dtype)
            if cfg.attn_mask_from_features:
                m_small = jnp.einsum(
                    "bqc,bhwc->bqhw", jax.lax.stop_gradient(membed),
                    feats_small[attn_size], preferred_element_type=jnp.float32
                ).astype(cfg.dtype)
                bmask = _threshold_block_mask(m_small)
            else:
                bmask = _attn_block_mask(masks, attn_size, cfg.num_heads)
            return logits, masks, bmask, dec

        pred_classes, pred_masks = [], []
        logits, masks, bmask, dec = prediction_heads(output, sizes[0])
        pred_classes.append(logits)
        pred_masks.append(masks)

        for i in range(cfg.dec_layers):
            lvl = i % cfg.num_feature_levels
            output = _DecoderLayer(cfg, name=f"layer{i}")(
                output, q_pos, srcs[lvl], poss[lvl], bmask
            )
            logits, masks, bmask, dec = prediction_heads(
                output, sizes[(i + 1) % cfg.num_feature_levels]
            )
            pred_classes.append(logits)
            pred_masks.append(masks)

        return {
            "pred_logits": pred_classes[-1],
            "pred_masks": pred_masks[-1],
            "decoder_output": dec,
            "aux_outputs": [
                {"pred_logits": c, "pred_masks": m}
                for c, m in zip(pred_classes[:-1], pred_masks[:-1])
            ],
        }

class PartDistillationTransformerDecoder(MultiScaleMaskedTransformerDecoder):
    """Decoder with the per-object-class giant part classifier.

    The head owns a (hidden, num_object_classes * num_parts + 1) weight; for an
    image whose object class is c, only columns [c*P, (c+1)*P) plus the final
    no-object column receive logits/gradients. Rather than materializing all
    176k logits and masking gradients (reference apply_gradient_mask,
    part_distillation_transformer_decoder.py:215-230), we gather the P+1 live
    columns per image and run the (P+1)-way head directly — numerically
    equivalent for loss/softmax purposes and f32-safe.
    """

    def _build_class_head(self):
        cfg = self.cfg
        assert cfg.num_object_classes > 0
        total = cfg.num_object_classes * cfg.num_parts + 1
        kernel = self.param(
            "part_class_kernel",
            nn.initializers.lecun_normal(),
            (cfg.hidden_dim, total),
        )
        bias = self.param("part_class_bias", nn.initializers.zeros, (total,))

        def head(dec, gt_object_class):
            if gt_object_class is None:
                raise ValueError(
                    "PartDistillationTransformerDecoder requires gt_object_class"
                )
            # per-image live columns: this object's P part slots + no-object
            base = gt_object_class[:, None] * cfg.num_parts
            cols = base + jnp.arange(cfg.num_parts, dtype=base.dtype)[None, :]
            cols = jnp.concatenate(
                [cols, jnp.full((cols.shape[0], 1), total - 1, cols.dtype)], axis=-1
            )
            import os

            env_slice = os.environ.get("PD_HEAD_SLICE")
            if env_slice is not None and env_slice != cfg.head_slice:
                import logging

                logging.getLogger("partdistillation_tpu").warning(
                    "PD_HEAD_SLICE=%s OVERRIDES config head_slice=%r; "
                    "'gather' + donation on an unsharded giant head is the "
                    "known TPU-worker-crashing configuration (PERF.md round "
                    "4) — unset a leftover A/B env var unless intentional",
                    env_slice, cfg.head_slice)
            if (env_slice or cfg.head_slice) == "onehot":
                # scatter-free formulation: slice the live columns via a 0/1
                # matmul so the BACKWARD is a dense (hidden, B*(P+1)) x
                # (B*(P+1), total) matmul instead of a scatter-add into the
                # 176k-column kernel — dodges the donation kernel fault
                # (see head_slice in TransformerDecoderConfig).
                # ~25 MB one-hot + ~6.5 GFLOP extra per step.
                oh = jax.nn.one_hot(cols, total, dtype=kernel.dtype)
                k = jnp.einsum("hc,bpc->bhp", kernel, oh)  # (B, hidden, P+1)
                b_ = jnp.einsum("c,bpc->bp", bias, oh)
                return jnp.einsum("bqc,bcp->bqp", dec, k) + b_[:, None, :]
            k = jnp.take(kernel, cols, axis=1)  # (hidden, B, P+1)
            k = jnp.transpose(k, (1, 0, 2))  # (B, hidden, P+1)
            b_ = jnp.take(bias, cols, axis=0)  # (B, P+1)
            return jnp.einsum("bqc,bcp->bqp", dec, k) + b_[:, None, :]

        return head
