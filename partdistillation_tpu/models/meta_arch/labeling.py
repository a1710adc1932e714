"""Stage-1 object labeling harness (the reference's LabelingDetic).

Capability parity with part_distillation/labeling_detic.py:25-119 and
detic_labeling_net.py:50-68:

* run an open-vocabulary detector over each ImageNet image;
* keep detections whose predicted class matches the image's synset class,
  falling back to ALL detections when none match (labeling_detic.py:64-77);
* keep the top-``topk`` (=10) by score and save
  ``{object_masks (RLE), boxes, scores, pred_names}`` per image (:99-115);
* the detector's classifier head is swapped for CLIP text embeddings of the
  target class names (``reset_cls_test``, detic_labeling_net.py:50-68).

The detector itself is *external* in the reference too (Detic is a sibling
clone; the repo ships only the harness). Here the detector is a pluggable
callable ``detector(image) -> {masks (N,H,W), scores (N,), class_ids (N,)}``;
``clip_text_classifier`` builds the text-embedding head from a local CLIP
checkpoint (zero-egress environments must pass a local path), and
``precomputed_detector`` adapts a detections store — the WITH_GIVEN_MASK
contract (register_imagenet.py:49-55).

The selection core is a fixed-shape jittable op (valid-mask semantics instead
of boolean indexing) so it can fuse into the detector's jitted forward.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["LabelingConfig", "select_class_matched_topk", "clip_text_classifier",
           "precomputed_detector", "run_labeling"]


@dataclasses.dataclass(frozen=True)
class LabelingConfig:
    topk: int = 10
    score_threshold: float = 0.0
    match_classes: bool = True  # class-match filter with keep-all fallback


def select_class_matched_topk(
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    valid: jnp.ndarray,
    target_class: jnp.ndarray,
    cfg: LabelingConfig = LabelingConfig(),
):
    """(N,) detections -> (topk,) selection indices + validity.

    Matches labeling_detic.py:64-77: prefer detections whose class equals the
    image's class; if none match, fall back to all detections; rank by score.
    """
    valid = valid & (scores >= cfg.score_threshold)
    if cfg.match_classes:
        matched = valid & (class_ids == target_class)
        use_matched = jnp.any(matched)
        pool = jnp.where(use_matched, matched, valid)
    else:
        pool = valid
    import jax.lax

    ranked = jnp.where(pool, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(ranked, cfg.topk)
    return top_idx, top_scores, top_scores > -jnp.inf


def clip_text_classifier(class_names, clip_model_path: str,
                         template: str = "a {}") -> np.ndarray:
    """(C, D) L2-normalized CLIP text embeddings — the classifier weight the
    reference swaps into Detic per shard (detic_labeling_net.py:50-68).

    Requires a *local* CLIP checkpoint directory (transformers format).
    """
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(clip_model_path)
    processor = CLIPProcessor.from_pretrained(clip_model_path)
    prompts = [template.format(n.replace("_", " ")) for n in class_names]
    with torch.no_grad():
        inputs = processor(text=prompts, return_tensors="pt", padding=True)
        emb = model.get_text_features(**inputs)
        emb = emb / emb.norm(dim=-1, keepdim=True)
    return emb.numpy()


def precomputed_detector(detections_store_dir: str) -> Callable[[dict], Optional[dict]]:
    """Adapt a store of precomputed detections into a detector callable.

    Records: {image_id, masks (RLE list), scores, class_ids | pred_names}.
    """
    from ...data.pseudo_store import PseudoLabelStore
    from ...utils import rle as rle_codec

    store = PseudoLabelStore(detections_store_dir)

    def detector(item: dict) -> Optional[dict]:
        record = store.get(item["image_id"])
        if record is None:
            return None
        masks = np.stack([rle_codec.decode(r) for r in record["masks"]]).astype(bool)
        return {
            "masks": masks,
            "scores": np.asarray(record["scores"], np.float32),
            "class_ids": np.asarray(
                record.get("class_ids", [-1] * len(masks)), np.int32),
            "pred_names": record.get("pred_names"),
        }

    return detector


def run_labeling(
    detector: Callable[[dict], Optional[dict]],
    items,
    writer,
    cfg: LabelingConfig = LabelingConfig(),
    class_names=None,
) -> Dict[str, int]:
    """Host loop of stage 1: detect -> class-match -> top-k -> save RLE.

    ``writer`` is a ShardWriter; resume is automatic (already-written ids are
    skipped by the store). Returns counters.
    """
    from ...utils import rle as rle_codec

    n_saved = n_skipped = n_empty = 0
    for item in items:
        if item["image_id"] in writer:
            n_skipped += 1
            continue
        det = detector(item)
        if det is None or len(det["scores"]) == 0:
            n_empty += 1
            continue
        scores = np.asarray(det["scores"], np.float32)
        class_ids = np.asarray(det["class_ids"], np.int32)
        target = int(item.get("class_id", -1))

        # threshold BEFORE the class-match/fallback decision, matching the
        # jit selection core (select_class_matched_topk): a below-threshold
        # matched detection must not suppress the keep-all fallback
        valid = scores >= cfg.score_threshold
        if cfg.match_classes:
            matched = valid & (class_ids == target)
            pool = matched if matched.any() else valid
        else:
            pool = valid
        if not pool.any():
            n_empty += 1
            continue
        ranked = np.where(pool, scores, -np.inf)
        order = np.argsort(-ranked)[: cfg.topk]
        order = order[ranked[order] > -np.inf]

        names = det.get("pred_names")
        record = {
            "image_id": item["image_id"],
            "object_masks": [rle_codec.encode(det["masks"][i]) for i in order],
            "scores": [float(scores[i]) for i in order],
            "pred_classes": [int(class_ids[i]) for i in order],
            "pred_names": [names[i] for i in order] if names else None,
            "class_code": item.get("class_code"),
        }
        writer.write(record)
        n_saved += 1
    writer.flush()
    return {"saved": n_saved, "skipped": n_skipped, "empty": n_empty}
