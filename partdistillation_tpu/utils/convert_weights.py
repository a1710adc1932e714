"""Torch (detectron2/Mask2Former) checkpoint -> flax params converter.

The reference pipeline starts every stage from Mask2Former-COCO Swin-L / Detic
torch checkpoints (weights/README.md; configs/proposal_learning/*.yaml:8) and
ships state-dict key-migration shims (mask_former_head.py:27-56). To run
eval-parity checks and warm-start training, this module maps that torch
state-dict layout onto the MaskFormerSegmenter param tree:

  backbone.*                      -> params['backbone'] (Swin)
  sem_seg_head.pixel_decoder.*    -> params['pixel_decoder']
  sem_seg_head.predictor.*        -> params['predictor']

Conventions: torch Linear weight (out,in) -> flax kernel (in,out); torch
Conv2d (O,I,kh,kw) -> flax (kh,kw,I,O); torch fused MHA in_proj -> split
q/k/v Dense kernels; norm weight -> scale. Unmatched torch keys are returned
for inspection; unfilled flax leaves keep their initialized values (so a
class-head of a different size, e.g. stage-5's part classifier, survives).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = ["convert_mask2former_state_dict", "load_torch_checkpoint",
           "migrate_legacy_keys"]


def migrate_legacy_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rewrite legacy detectron2 state-dict keys to the modern layout.

    Mirrors the reference's in-place ``_load_from_state_dict`` shims:
    - ``sem_seg_head.pixel_decoder.pixel_decoder.*`` (an old double-nesting)
      -> ``sem_seg_head.pixel_decoder.*``
      (mask_former_head.py:48-55)
    - ``static_query`` -> ``query_feat`` (the pre-v2 name of the learned
      query features; mask2former_transformer_decoder.py:216-237)

    Modern keys win on collision (a checkpoint carrying both spellings keeps
    the modern one, matching the reference's delete-after-copy semantics
    applied to an already-migrated dict).
    """
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        nk = k.replace("sem_seg_head.pixel_decoder.pixel_decoder",
                       "sem_seg_head.pixel_decoder")
        nk = nk.replace("static_query", "query_feat")
        if nk != k and nk in sd:
            continue  # modern spelling also present; it wins
        out[nk] = v
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.pkl checkpoint into numpy arrays (CPU)."""
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
        return {k: np.asarray(v) for k, v in sd.items()}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data.get("state_dict", data))
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _set(tree: Dict, path: List[str], value: np.ndarray, strict_shape: bool = True):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    leaf = path[-1]
    if strict_shape and leaf in node and hasattr(node[leaf], "shape"):
        if tuple(node[leaf].shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: template "
                f"{tuple(node[leaf].shape)} vs checkpoint {tuple(value.shape)}")
    node[leaf] = value


def _dense(w=None, b=None):
    out = {}
    if w is not None:
        out["kernel"] = np.ascontiguousarray(w.T)
    if b is not None:
        out["bias"] = b
    return out


def convert_mask2former_state_dict(
    sd: Dict[str, np.ndarray],
    template: Dict[str, Any] | None = None,
) -> Tuple[Dict[str, Any], List[str]]:
    """Returns (flax params dict {'params': ...}, list of unmatched torch keys).

    When ``template`` (an initialized params tree) is given, converted leaves
    are shape-checked against it and merged over it; size-mismatched heads are
    skipped (returned as unmatched) rather than erroring.
    """
    sd = migrate_legacy_keys(sd)
    params: Dict[str, Any] = {}
    unmatched: List[str] = []

    def put(path: List[str], value):
        if template is not None:
            node = template.get("params", template)
            try:
                for p in path[:-1]:
                    node = node[p]
                tpl = node[path[-1]]
            except (KeyError, TypeError):
                raise ValueError(f"no template leaf at {'/'.join(path)}")
            if tuple(tpl.shape) != tuple(value.shape):
                raise ValueError("shape mismatch")
        _set(params, path, np.asarray(value), strict_shape=False)

    # group torch keys by module prefix so fused qkv / norms convert together
    for key in sorted(sd.keys()):
        val = np.asarray(sd[key])
        try:
            path = _map_key(key, val, sd, put)
            if path is None:
                unmatched.append(key)
        except ValueError:
            unmatched.append(key)

    out = {"params": params}
    if template is not None:
        out = _merge(template, out)
    return out, unmatched


def _merge(base: Dict, overlay: Dict) -> Dict:
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


# --------------------------------------------------------------- key rules


def _map_key(key: str, val: np.ndarray, sd: Dict[str, np.ndarray], put) -> bool:
    """Convert one torch key (possibly consuming siblings for fused weights).
    Returns True if handled, None if unknown."""
    k = key
    # strip d2 wrapper prefixes
    for prefix in ("model.", "module."):
        if k.startswith(prefix):
            k = k[len(prefix):]

    # -------- Swin backbone --------
    if k.startswith("backbone."):
        r = k[len("backbone."):]
        if r.startswith("patch_embed.proj."):
            leaf = "kernel" if r.endswith("weight") else "bias"
            v = val.transpose(2, 3, 1, 0) if leaf == "kernel" else val
            put(["backbone", "patch_embed", leaf], v)
            return True
        if r.startswith("patch_embed.norm."):
            put(["backbone", "patch_norm",
                 "scale" if r.endswith("weight") else "bias"], val)
            return True
        m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.*)", r)
        if m:
            s, b, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            blk = f"stage{s}_block{b}"
            return _map_swin_block(blk, rest, val, put)
        m = re.match(r"layers\.(\d+)\.downsample\.(.*)", r)
        if m:
            s, rest = int(m.group(1)), m.group(2)
            ds = f"downsample{s}"
            if rest == "reduction.weight":
                put(["backbone", ds, "reduction", "kernel"], val.T)
                return True
            if rest.startswith("norm."):
                put(["backbone", ds, "norm",
                     "scale" if rest.endswith("weight") else "bias"], val)
                return True
            return None
        m = re.match(r"norm(\d+)\.(weight|bias)", r)
        if m:
            res = f"res{int(m.group(1)) + 2}"
            put(["backbone", f"norm_{res}",
                 "scale" if m.group(2) == "weight" else "bias"], val)
            return True
        return None

    # -------- pixel decoder --------
    if k.startswith("sem_seg_head.pixel_decoder."):
        r = k[len("sem_seg_head.pixel_decoder."):]
        m = re.match(r"input_proj\.(\d+)\.0\.(weight|bias)", r)
        if m:
            i, leaf = int(m.group(1)), m.group(2)
            v = val.transpose(2, 3, 1, 0) if leaf == "weight" else val
            put(["pixel_decoder", f"input_proj{i}",
                 "kernel" if leaf == "weight" else "bias"], v)
            return True
        m = re.match(r"input_proj\.(\d+)\.1\.(weight|bias)", r)
        if m:
            put(["pixel_decoder", f"input_norm{int(m.group(1))}",
                 "scale" if m.group(2) == "weight" else "bias"], val)
            return True
        if r == "transformer.level_embed":
            put(["pixel_decoder", "level_embed"], val)
            return True
        m = re.match(r"transformer\.encoder\.layers\.(\d+)\.(.*)", r)
        if m:
            return _map_encoder_layer(int(m.group(1)), m.group(2), val, put)
        m = re.match(r"adapter_(\d+)\.(weight|norm\.weight|norm\.bias)", r)
        if m:
            leaf = m.group(2)
            if leaf == "weight":
                put(["pixel_decoder", "fpn_lateral", "kernel"],
                    val.transpose(2, 3, 1, 0))
            else:
                put(["pixel_decoder", "fpn_lateral_norm",
                     "scale" if leaf.endswith("weight") else "bias"], val)
            return True
        m = re.match(r"layer_(\d+)\.(weight|norm\.weight|norm\.bias)", r)
        if m:
            leaf = m.group(2)
            if leaf == "weight":
                put(["pixel_decoder", "fpn_output", "kernel"],
                    val.transpose(2, 3, 1, 0))
            else:
                put(["pixel_decoder", "fpn_output_norm",
                     "scale" if leaf.endswith("weight") else "bias"], val)
            return True
        if r.startswith("mask_features."):
            leaf = "kernel" if r.endswith("weight") else "bias"
            v = val.transpose(2, 3, 1, 0) if leaf == "kernel" else val
            put(["pixel_decoder", "mask_features", leaf], v)
            return True
        return None

    # -------- transformer decoder (predictor) --------
    if k.startswith("sem_seg_head.predictor."):
        r = k[len("sem_seg_head.predictor."):]
        if r == "query_feat.weight":
            put(["predictor", "query_feat"], val)
            return True
        if r == "query_embed.weight":
            put(["predictor", "query_embed"], val)
            return True
        if r == "level_embed.weight":
            put(["predictor", "level_embed"], val)
            return True
        m = re.match(r"input_proj\.(\d+)\.(weight|bias)", r)
        if m:
            i, leaf = int(m.group(1)), m.group(2)
            v = val.transpose(2, 3, 1, 0) if leaf == "weight" else val
            put(["predictor", f"input_proj{i}",
                 "kernel" if leaf == "weight" else "bias"], v)
            return True
        m = re.match(r"transformer_(self|cross)_attention_layers\.(\d+)\.(.*)", r)
        if m:
            kind, i, rest = m.group(1), int(m.group(2)), m.group(3)
            layer = f"layer{i}"
            attn = f"{kind}_attn"
            norm = f"norm_{kind}"
            return _map_torch_mha(["predictor", layer, attn],
                                  ["predictor", layer, norm], rest, val, put)
        m = re.match(r"transformer_ffn_layers\.(\d+)\.(.*)", r)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            layer = f"layer{i}"
            if rest.startswith("linear1."):
                put(["predictor", layer, "ffn1",
                     "kernel" if rest.endswith("weight") else "bias"],
                    val.T if rest.endswith("weight") else val)
                return True
            if rest.startswith("linear2."):
                put(["predictor", layer, "ffn2",
                     "kernel" if rest.endswith("weight") else "bias"],
                    val.T if rest.endswith("weight") else val)
                return True
            if rest.startswith("norm."):
                put(["predictor", layer, "norm_ffn",
                     "scale" if rest.endswith("weight") else "bias"], val)
                return True
            return None
        if r.startswith("decoder_norm."):
            put(["predictor", "decoder_norm",
                 "scale" if r.endswith("weight") else "bias"], val)
            return True
        if r.startswith("class_embed."):
            put(["predictor", "class_embed",
                 "kernel" if r.endswith("weight") else "bias"],
                val.T if r.endswith("weight") else val)
            return True
        m = re.match(r"mask_embed\.layers\.(\d+)\.(weight|bias)", r)
        if m:
            i, leaf = int(m.group(1)), m.group(2)
            put(["predictor", "mask_embed", f"fc{i}",
                 "kernel" if leaf == "weight" else "bias"],
                val.T if leaf == "weight" else val)
            return True
        return None

    return None


def _map_swin_block(blk: str, rest: str, val: np.ndarray, put) -> bool:
    base = ["backbone", blk]
    if rest.startswith("norm1."):
        put(base + ["norm1", "scale" if rest.endswith("weight") else "bias"], val)
        return True
    if rest.startswith("norm2."):
        put(base + ["norm2", "scale" if rest.endswith("weight") else "bias"], val)
        return True
    if rest == "attn.relative_position_bias_table":
        put(base + ["attn", "relative_position_bias_table"], val)
        return True
    if rest == "attn.relative_position_index":
        return True  # recomputed buffer
    if rest.startswith("attn.qkv."):
        leaf = "kernel" if rest.endswith("weight") else "bias"
        put(base + ["attn", "qkv", leaf], val.T if leaf == "kernel" else val)
        return True
    if rest.startswith("attn.proj."):
        leaf = "kernel" if rest.endswith("weight") else "bias"
        put(base + ["attn", "proj", leaf], val.T if leaf == "kernel" else val)
        return True
    if rest.startswith("mlp.fc1."):
        leaf = "kernel" if rest.endswith("weight") else "bias"
        put(base + ["mlp_fc1", leaf], val.T if leaf == "kernel" else val)
        return True
    if rest.startswith("mlp.fc2."):
        leaf = "kernel" if rest.endswith("weight") else "bias"
        put(base + ["mlp_fc2", leaf], val.T if leaf == "kernel" else val)
        return True
    if "attn_mask" in rest:
        return True  # buffer
    return None


def _map_encoder_layer(i: int, rest: str, val: np.ndarray, put) -> bool:
    base = ["pixel_decoder", f"layer{i}"]
    deform = {"self_attn.sampling_offsets.": "sampling_offsets",
              "self_attn.attention_weights.": "attention_weights",
              "self_attn.value_proj.": "value_proj",
              "self_attn.output_proj.": "output_proj"}
    for torch_name, flax_name in deform.items():
        if rest.startswith(torch_name):
            leaf = "kernel" if rest.endswith("weight") else "bias"
            put(base + ["self_attn", flax_name, leaf],
                val.T if leaf == "kernel" else val)
            return True
    for torch_name, flax_name in (("linear1.", "linear1"), ("linear2.", "linear2")):
        if rest.startswith(torch_name):
            leaf = "kernel" if rest.endswith("weight") else "bias"
            put(base + [flax_name, leaf], val.T if leaf == "kernel" else val)
            return True
    for torch_name, flax_name in (("norm1.", "norm1"), ("norm2.", "norm2")):
        if rest.startswith(torch_name):
            put(base + [flax_name,
                        "scale" if rest.endswith("weight") else "bias"], val)
            return True
    return None


def _map_torch_mha(attn_path: List[str], norm_path: List[str],
                   rest: str, val: np.ndarray, put) -> bool:
    """torch nn.MultiheadAttention (fused in_proj) -> q/k/v/out Dense."""
    if rest == "multihead_attn.in_proj_weight" or rest == "self_attn.in_proj_weight":
        d = val.shape[0] // 3
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            put(attn_path + [name, "kernel"], val[i * d:(i + 1) * d].T)
        return True
    if rest == "multihead_attn.in_proj_bias" or rest == "self_attn.in_proj_bias":
        d = val.shape[0] // 3
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            put(attn_path + [name, "bias"], val[i * d:(i + 1) * d])
        return True
    if rest.endswith("out_proj.weight"):
        put(attn_path + ["out_proj", "kernel"], val.T)
        return True
    if rest.endswith("out_proj.bias"):
        put(attn_path + ["out_proj", "bias"], val)
        return True
    if rest.startswith("norm."):
        put(norm_path + ["scale" if rest.endswith("weight") else "bias"], val)
        return True
    return None
