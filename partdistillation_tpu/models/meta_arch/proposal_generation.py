"""Stage-2 pixel grouping: k-means "superpixel" part proposals from frozen
backbone features.

Capability parity with the reference ProposalGenerationModel
(part_distillation/proposal_generation_model.py:100-265) and PixelGroupingModel
(pixel_grouping_model.py:129-246), which share the same core:
  * concatenate chosen backbone feature maps, all bilinearly resized to the
    first key's (1/8) resolution; optional l2 normalization
    (_prepare_features, proposal_generation_model.py:117-127)
  * per image: k-means (k=4) over features inside the object mask at 1/8 res
  * full-resolution labels: nearest centroid ('dot' or 'l2') over the
    bilinearly upsampled features inside the full-res object mask
    (generate_pseudo_labels, :222-237); cluster id -> binary part mask
  * ProposalGeneration saves {part RLEs, object_ratio, class info} per image
    (:185-199); PixelGrouping feeds the same proposals to the AR evaluator

TPU redesign: the whole pipeline — backbone forward, masked k-means (MXU
matmuls inside lax loops), full-res labeling — is ONE jitted program batched
over images. The reference ran this as 40 x 8-GPU jobs with a per-image
sklearn-on-CPU hop (SURVEY.md §3.3); here the only host work is RLE encoding
of the result.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.kmeans import masked_kmeans
from ..swin import SwinConfig, SwinTransformer
from .proposal import normalize_images

__all__ = ["ProposalGenerationConfig", "make_generation_fn"]


@dataclasses.dataclass(frozen=True)
class ProposalGenerationConfig:
    swin: SwinConfig = SwinConfig()
    feature_keys: Tuple[str, ...] = ("res3", "res4")
    num_clusters: int = 4
    distance_metric: str = "dot"  # dot | l2 (labeling only; k-means is l2)
    feature_normalize: bool = False
    kmeans_iters: int = 30


def make_generation_fn(cfg: ProposalGenerationConfig):
    """Returns fn(params, batch, key) -> stage-2 proposals.

    batch: image (B,H,W,3), object_mask (B,H,W) bool (from stage 1).
    Output: part_masks (B,k,H,W) bool, part_valid (B,k) bool,
    object_ratio (B,) float.
    """
    model = SwinTransformer(cfg.swin)
    k = cfg.num_clusters

    def prepare_features(feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        base = feats[cfg.feature_keys[0]]
        b, h, w, _ = base.shape
        gathered = [base] + [
            jax.image.resize(feats[key], (b, h, w, feats[key].shape[-1]), method="linear")
            for key in cfg.feature_keys[1:]
        ]
        out = jnp.concatenate(gathered, axis=-1)
        if cfg.feature_normalize:
            out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
        return out

    def generate_one(feat_lo, feat_hi, obj_lo, obj_hi, key):
        """feat_lo (h,w,D) 1/8-res, feat_hi (H,W,D) full-res, masks likewise."""
        h, w, d = feat_lo.shape
        pts = feat_lo.reshape(h * w, d)
        centroids, _ = masked_kmeans(pts, obj_lo.reshape(-1), k, key, iters=cfg.kmeans_iters)

        if cfg.distance_metric == "dot":
            scores = jnp.einsum("hwd,kd->hwk", feat_hi, centroids)
        else:  # l2: 2ab - a^2 - b^2 (reference _measure_distance)
            ab = jnp.einsum("hwd,kd->hwk", feat_hi, centroids)
            aa = jnp.sum(feat_hi * feat_hi, axis=-1, keepdims=True)
            bb = jnp.sum(centroids * centroids, axis=-1)
            scores = 2.0 * ab - aa - bb[None, None, :]
        labels = jnp.argmax(scores, axis=-1)  # (H, W)

        part_masks = (labels[None] == jnp.arange(k)[:, None, None]) & obj_hi[None]
        # enough in-mask feature pixels for k-means (reference requires
        # len(data) > k, proposal_generation_model.py:206) and non-empty output
        enough = jnp.sum(obj_lo) > k
        part_valid = jnp.any(part_masks, axis=(1, 2)) & enough
        object_ratio = jnp.mean(obj_hi.astype(jnp.float32))
        return part_masks, part_valid, object_ratio

    def fn(params, batch, key):
        images = normalize_images(batch["image"])
        feats = model.apply(params, images)
        feat_lo = prepare_features(feats)
        b, h, w, d = feat_lo.shape
        hh, ww = batch["image"].shape[1:3]
        feat_hi = jax.image.resize(feat_lo, (b, hh, ww, d), method="linear")

        from ...ops.instance_post import as_bool_mask

        obj_hi = as_bool_mask(batch["object_mask"])
        obj_lo = jax.image.resize(
            obj_hi.astype(jnp.float32), (b, h, w), method="nearest"
        ) > 0.5

        keys = jax.random.split(key, b)
        part_masks, part_valid, object_ratio = jax.vmap(generate_one)(
            feat_lo, feat_hi, obj_lo, obj_hi, keys
        )
        return {
            "part_masks": part_masks,
            "part_valid": part_valid,
            "object_ratio": object_ratio,
        }

    return fn
