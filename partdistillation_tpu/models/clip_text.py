"""CLIP text tower (TPU-native, Flax) for stage-1 open-vocabulary labels.

The reference swaps Detic's classifier head for CLIP *text* embeddings of the
target class names (detic_labeling_net.py:50-68, ``reset_cls_test``). The
vision side already runs on device (models/clip_vit.py); this module is the
text side, so the whole open-vocabulary classifier — prompt embeddings AND
region embeddings — can be produced by jitted TPU programs, with torch needed
only to read the HF checkpoint file.

Architecture (matches HF ``CLIPTextModelWithProjection`` exactly): token
embedding + learned absolute positions → L × pre-LN transformer blocks with a
CAUSAL attention mask (shared ``_Block`` from clip_vit, quick_gelu MLP) →
final LayerNorm → pool the End-Of-Text token's hidden state (the first
position holding ``eos_token_id`` — HF semantics, equivalent to the OpenAI
argmax-of-ids convention on CLIP's own vocabulary) → linear projection
(no bias).

Padding needs no mask here: CLIP pads AFTER the EOT token, and under the
causal mask the EOT position never attends to later (padded) positions, so
the pooled embedding is pad-independent.

``convert_clip_text_state_dict`` maps an HF torch checkpoint into this
module's params; parity vs transformers is tested in tests/test_clip_text.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .clip_vit import _Block, _t

__all__ = [
    "CLIPTextTowerConfig",
    "CLIPTextTower",
    "convert_clip_text_state_dict",
    "text_config_from_hf",
]


@dataclasses.dataclass(frozen=True)
class CLIPTextTowerConfig:
    """Defaults = CLIP ViT-B/32's text encoder (the reference's checkpoint)."""

    vocab_size: int = 49408
    max_positions: int = 77
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    # EOT pooling position: first token equal to this id (HF semantics). CLIP's
    # EOT is the top vocabulary id, but tokenizers whose EOS is not the vocab
    # max would silently pool the wrong position under plain argmax(token_ids).
    eos_token_id: int = 49407
    dtype: Any = jnp.float32


class CLIPTextTower(nn.Module):
    """(B, T) int32 token ids -> (B, projection_dim) text embeddings
    (L2-unnormalized; callers normalize before the cosine-similarity matmul).

    T may be any length <= max_positions. Pooling takes the hidden state at
    the FIRST position equal to ``cfg.eos_token_id`` (HF semantics; every
    prompt contains exactly one EOT followed only by padding)."""

    cfg: CLIPTextTowerConfig

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, t = token_ids.shape

        x = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                     name="token_embedding")(token_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.max_positions, c.hidden_size))
        x = x + pos[None, :t].astype(c.dtype)

        # additive causal mask, (1, 1, T, T): query q sees keys k <= q
        causal = jnp.where(
            jnp.tril(jnp.ones((t, t), bool)), 0.0, -jnp.inf
        ).astype(jnp.float32)[None, None]

        for i in range(c.num_layers):
            x = _Block(c, name=f"block_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         name="final_layer_norm")(x)

        # first position holding eos_token_id (argmax of the equality mask
        # returns the first True) — matches HF CLIPTextModel pooling for any
        # vocabulary, not just ones where EOT is the top id
        eot = jnp.argmax((token_ids == c.eos_token_id).astype(jnp.int32),
                         axis=-1)  # (B,)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return nn.Dense(c.projection_dim, use_bias=False, dtype=c.dtype,
                        name="text_projection")(pooled)


def convert_clip_text_state_dict(
    sd: Dict[str, Any], cfg: CLIPTextTowerConfig
) -> Dict[str, Any]:
    """HF ``CLIPTextModelWithProjection`` (or full ``CLIPModel``) state dict
    -> CLIPTextTower params (the {'params': ...} pytree).

    Key map mirrors clip_vit.convert_clip_vision_state_dict: Linear weights
    transpose (O, I) -> (I, O); embeddings copy as-is."""
    p = "text_model."
    out: Dict[str, Any] = {}

    out["token_embedding"] = {
        "embedding": _t(sd[p + "embeddings.token_embedding.weight"])}
    out["position_embedding"] = _t(
        sd[p + "embeddings.position_embedding.weight"])

    def dense(prefix):
        return {"kernel": _t(sd[prefix + ".weight"]).T,
                "bias": _t(sd[prefix + ".bias"])}

    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layers.{i}."
        out[f"block_{i}"] = {
            "layer_norm1": {"scale": _t(sd[lp + "layer_norm1.weight"]),
                            "bias": _t(sd[lp + "layer_norm1.bias"])},
            "layer_norm2": {"scale": _t(sd[lp + "layer_norm2.weight"]),
                            "bias": _t(sd[lp + "layer_norm2.bias"])},
            "self_attn": {k: dense(lp + f"self_attn.{k}")
                          for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "fc1": dense(lp + "mlp.fc1"),
            "fc2": dense(lp + "mlp.fc2"),
        }

    out["final_layer_norm"] = {"scale": _t(sd[p + "final_layer_norm.weight"]),
                               "bias": _t(sd[p + "final_layer_norm.bias"])}
    out["text_projection"] = {"kernel": _t(sd["text_projection.weight"]).T}
    return {"params": out}


def text_config_from_hf(hf_cfg) -> CLIPTextTowerConfig:
    """Build the tower config from a transformers CLIPTextConfig."""
    return CLIPTextTowerConfig(
        vocab_size=hf_cfg.vocab_size,
        max_positions=hf_cfg.max_position_embeddings,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        projection_dim=hf_cfg.projection_dim,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        eos_token_id=hf_cfg.eos_token_id,
    )
