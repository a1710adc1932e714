"""CLIP ViT vision tower (TPU-native, Flax) for stage-1 region scoring.

The reference's stage-1 detector composes Detic proposals with a CLIP text
classifier head (detic_labeling_net.py:50-68); region/image embeddings come
from CLIP's ViT image encoder. Here the vision tower runs jitted on TPU so
open-vocabulary region scoring sits in the device hot loop instead of a
host-side torch call per image (models/meta_arch/labeling.py
clip_region_scorer, the CPU fallback).

Architecture (matches HF `CLIPVisionModelWithProjection` exactly):
patch-embed conv (no bias) + class token + learned absolute positions →
pre-LayerNorm → L × (LN → MHA → residual, LN → MLP(quick_gelu) → residual) →
post-LayerNorm on the class token → linear projection (no bias) → embedding.

Builds on the ViT helpers in `models/vit_utils.py` (PatchEmbed, get_abs_pos)
— the reference keeps the same helpers for ViT backbones
(modeling/backbone/utils.py:132-190); position embeddings are bicubicly
resized so the tower accepts any patch-multiple input size, not just the
pretraining 224².

`convert_clip_vision_state_dict` maps an HF torch checkpoint into this
module's params; parity vs transformers is tested in tests/test_clip_vit.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .vit_utils import PatchEmbed, get_abs_pos

__all__ = [
    "CLIPVisionTowerConfig",
    "CLIPVisionTower",
    "convert_clip_vision_state_dict",
    "CLIP_PIXEL_MEAN",
    "CLIP_PIXEL_STD",
]

# CLIP's preprocessing constants (OpenAI release; HF CLIPProcessor defaults),
# in [0, 1] pixel scale.
CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionTowerConfig:
    """Defaults = CLIP ViT-B/32 (the checkpoint the reference's Detic uses)."""

    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x) (HF hidden_act='quick_gelu')."""
    return x * nn.sigmoid(1.702 * x)


class _Attention(nn.Module):
    cfg: Any  # CLIPVisionTowerConfig | clip_text.CLIPTextTowerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        hd = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, dtype=c.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=c.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=c.dtype, name="v_proj")(x)
        b, n, _ = x.shape
        q = q.reshape(b, n, c.num_heads, hd) * (hd ** -0.5)
        k = k.reshape(b, n, c.num_heads, hd)
        v = v.reshape(b, n, c.num_heads, hd)
        # sequence is short (50 tokens at 224/32, <=77 for text): plain einsum
        # attention with f32 softmax; no flash/fused kernel needed at this size
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias  # e.g. causal mask for the text tower
        probs = nn.softmax(logits, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, -1)
        return nn.Dense(c.hidden_size, dtype=c.dtype, name="out_proj")(out)


class _Block(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         name="layer_norm1")(x)
        x = x + _Attention(c, name="self_attn")(y, bias)
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         name="layer_norm2")(x)
        y = nn.Dense(c.intermediate_size, dtype=c.dtype, name="fc1")(y)
        y = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(quick_gelu(y))
        return x + y


class CLIPVisionTower(nn.Module):
    """(B, H, W, 3) normalized pixels -> (B, projection_dim) L2-unnormalized
    image embeddings (callers normalize before the cosine-similarity matmul).

    H, W may be any multiples of patch_size: the position-embedding grid is
    resized via vit_utils.get_abs_pos (bicubic, class token kept exact)."""

    cfg: CLIPVisionTowerConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b = pixels.shape[0]
        grid = c.image_size // c.patch_size

        x = PatchEmbed(embed_dim=c.hidden_size,
                       patch_size=(c.patch_size, c.patch_size),
                       stride=(c.patch_size, c.patch_size),
                       use_bias=False, dtype=c.dtype,
                       name="patch_embed")(pixels.astype(c.dtype))
        h, w = x.shape[1], x.shape[2]

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (grid * grid + 1, c.hidden_size))
        if (h, w) != (grid, grid):
            grid_pos = get_abs_pos(pos[None], True, (h, w)).reshape(
                1, h * w, c.hidden_size)
        else:
            grid_pos = pos[None, 1:]
        x = x.reshape(b, h * w, c.hidden_size) + grid_pos.astype(c.dtype)
        cls_tok = (cls + pos[0]).astype(c.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (b, 1, c.hidden_size)), x], axis=1)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         name="pre_layernorm")(x)
        for i in range(c.num_layers):
            x = _Block(c, name=f"block_{i}")(x)
        cls_out = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                               name="post_layernorm")(x[:, 0])
        return nn.Dense(c.projection_dim, use_bias=False, dtype=c.dtype,
                        name="visual_projection")(cls_out)


def _t(x) -> np.ndarray:
    try:  # torch tensor or numpy
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def convert_clip_vision_state_dict(
    sd: Dict[str, Any], cfg: CLIPVisionTowerConfig
) -> Dict[str, Any]:
    """HF `CLIPVisionModelWithProjection` (or full `CLIPModel`) state dict ->
    CLIPVisionTower params (the {'params': ...} pytree).

    Key map (HF torch layout -> flax): Linear weights transpose (O, I) ->
    (I, O); the patch conv (O, I, kh, kw) -> (kh, kw, I, O)."""
    p = "vision_model."
    out: Dict[str, Any] = {}

    out["patch_embed"] = {"proj": {"kernel": _t(
        sd[p + "embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)}}
    out["class_embedding"] = _t(sd[p + "embeddings.class_embedding"])
    out["position_embedding"] = _t(sd[p + "embeddings.position_embedding.weight"])
    out["pre_layernorm"] = {"scale": _t(sd[p + "pre_layrnorm.weight"]),
                            "bias": _t(sd[p + "pre_layrnorm.bias"])}

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

    out["post_layernorm"] = {"scale": _t(sd[p + "post_layernorm.weight"]),
                             "bias": _t(sd[p + "post_layernorm.bias"])}
    out["visual_projection"] = {
        "kernel": _t(sd["visual_projection.weight"]).T}
    return {"params": out}


def config_from_hf(hf_cfg) -> CLIPVisionTowerConfig:
    """Build the tower config from a transformers CLIPVisionConfig."""
    return CLIPVisionTowerConfig(
        image_size=hf_cfg.image_size,
        patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        projection_dim=hf_cfg.projection_dim,
        layer_norm_eps=hf_cfg.layer_norm_eps,
    )


def normalize_clip_pixels(images_01: jnp.ndarray) -> jnp.ndarray:
    """[0,1]-scaled (B, H, W, 3) -> CLIP-normalized pixels."""
    mean = jnp.asarray(CLIP_PIXEL_MEAN, images_01.dtype)
    std = jnp.asarray(CLIP_PIXEL_STD, images_01.dtype)
    return (images_01 - mean) / std
