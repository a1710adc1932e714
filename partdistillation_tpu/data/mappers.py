"""Dataset mappers: item dict -> fixed-shape model-input example (numpy).

One mapper per pipeline stage, mirroring the reference's
``data/dataset_mappers/`` inventory (SURVEY.md §2.4) but emitting
fixed-capacity padded arrays (the TPU contract) instead of detectron2
Instances:

* ``ProposalGenerationMapper``  — stage 1/2 inference: image + stage-1 object
  mask (proposal_generation_mapper.py:19-106).
* ``ProposalTrainMapper``       — stage 3 training: dCRF'd part-proposal RLEs
  -> (T,S,S) masks + valid, augmented (proposal_dataset_mapper.py:113-235).
* ``PartRankingMapper``         — stage 4 labeling: parts summed into ONE
  object mask (imagenet_part_ranking_dataset_mapper.py:109-113).
* ``PartDistillationTrainMapper`` — stage 5 training: class-labeled part
  masks + per-part score/ratio filters
  (part_distillation_dataset_mapper.py:56-67,129-164).
* ``PartEvalMapper``            — PartImageNet/Pascal/Cityscapes eval: object
  instances + part instances, optional merged-GT per part class
  (part_imagenet_mapper.py:182-190, voc_parts_mapper.py:185-196).

All mappers return ``None`` for unusable items (unreadable image, no valid
masks) — the loader skips them, as the reference's loaders do.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..utils import rle as rle_codec
from .pseudo_store import PseudoLabelStore
from .transforms import (
    AugmentConfig,
    apply_crop_flip,
    load_image,
    pad_stack,
    random_augment,
    resize_image,
    resize_mask,
)

__all__ = [
    "ProposalGenerationMapper",
    "ProposalTrainMapper",
    "PartRankingMapper",
    "PartDistillationTrainMapper",
    "PartDistillationSaveMapper",
    "PartEvalMapper",
]


class _StoreCache:
    """Lazy per-directory PseudoLabelStore cache shared by mappers."""

    def __init__(self):
        self._stores: Dict[str, PseudoLabelStore] = {}

    def get(self, store_dir: str) -> PseudoLabelStore:
        if store_dir not in self._stores:
            self._stores[store_dir] = PseudoLabelStore(store_dir)
        return self._stores[store_dir]


_STORES = _StoreCache()


def invalidate_store_cache(store_dir: str = None):
    """Drop cached store views so late-arriving shards/records become
    visible. Continuous consumers (``dcrf --watch``) call this per rescan;
    one-shot stage CLIs never need it (their stores are immutable inputs)."""
    if store_dir is None:
        _STORES._stores.clear()
    else:
        _STORES._stores.pop(store_dir, None)


def _decode_rles(rles: List[dict]) -> List[np.ndarray]:
    return [rle_codec.decode(r).astype(bool) for r in rles]


@dataclasses.dataclass
class ProposalGenerationMapper:
    """Stage-2 input: {image (S,S,3) f32, object_mask (S,S), image_id, class_id}."""

    image_size: int = 640
    object_mask_index: int = 0  # which of the top-10 stage-1 masks to use

    def __call__(self, item: dict) -> Optional[dict]:
        image = load_image(item["file_name"])
        if image is None:
            return None
        size = (self.image_size, self.image_size)
        image = resize_image(image, size)

        record = None
        if "object_store" in item:
            record = _STORES.get(item["object_store"]).get(item["image_id"])
        if record is None or not record.get("object_masks"):
            return None
        idx = min(self.object_mask_index, len(record["object_masks"]) - 1)
        mask = rle_codec.decode(record["object_masks"][idx]).astype(bool)
        mask = resize_mask(mask, size)
        if not mask.any():
            return None
        return {
            "image": image.astype(np.float32),
            "object_mask": mask,
            "image_id": item["image_id"],
            "class_id": np.int32(item.get("class_id", 0)),
        }


@dataclasses.dataclass
class ProposalTrainMapper:
    """Stage-3 train: {image, masks (T,S,S), valid (T,)} with augmentation."""

    image_size: int = 640
    capacity: int = 8
    min_area_ratio: float = 0.0
    augment: AugmentConfig = AugmentConfig()
    seed: int = 0

    def _item_rng(self, item: dict) -> np.random.RandomState:
        # Per-item generator: the loader's thread pool calls mappers
        # concurrently and np.random.RandomState is not thread-safe (a shared
        # state yields correlated/corrupted augmentations). Seeding by
        # (seed, image_id, epoch) is both thread-safe and reproducible, with
        # fresh augmentations each epoch (the loader injects ``_epoch``).
        import zlib

        key = zlib.crc32(str(item.get("image_id", "")).encode())
        return np.random.RandomState(
            (self.seed & 0xFFFFFFFF, key, item.get("_epoch", 0) & 0xFFFFFFFF))

    def __call__(self, item: dict) -> Optional[dict]:
        image = load_image(item["file_name"])
        if image is None:
            return None
        record = item.get("proposals")
        if record is None and "proposal_store" in item:
            record = _STORES.get(item["proposal_store"]).get(item["image_id"])
        if record is None:
            return None
        masks = _decode_rles(record.get("part_masks", []))
        if not masks:
            return None

        size = self.image_size
        union = np.zeros(masks[0].shape, bool)
        for m in masks:
            union |= m
        scale, cy, cx, flip = random_augment(self._item_rng(item), self.augment, size, union)
        image = apply_crop_flip(image, scale, cy, cx, flip, size, is_mask=False)
        masks = [apply_crop_flip(m, scale, cy, cx, flip, size, is_mask=True)
                 for m in masks]
        # area-ratio filter after aug (proposal_dataset_mapper.py:228-235)
        min_px = self.min_area_ratio * size * size
        masks = [m for m in masks if m.sum() > max(min_px, 0)]
        if not masks:
            return None
        stacked, valid = pad_stack(masks, self.capacity, size)
        return {
            "image": image.astype(np.float32),
            "masks": stacked,
            "valid": valid,
            "image_id": item["image_id"],
        }


@dataclasses.dataclass
class PartRankingMapper:
    """Stage-4 labeling input: parts summed into one object mask + the raw
    part proposals for re-ranking."""

    image_size: int = 640
    capacity: int = 8

    def __call__(self, item: dict) -> Optional[dict]:
        image = load_image(item["file_name"])
        if image is None:
            return None
        record = item.get("proposals")
        if record is None and "proposal_store" in item:
            record = _STORES.get(item["proposal_store"]).get(item["image_id"])
        if record is None:
            return None
        masks = _decode_rles(record.get("part_masks", []))
        if not masks:
            return None
        size = (self.image_size, self.image_size)
        image = resize_image(image, size)
        masks = [resize_mask(m, size) for m in masks]
        object_mask = np.zeros(size, bool)
        for m in masks:
            object_mask |= m
        stacked, valid = pad_stack(masks, self.capacity, self.image_size)
        return {
            "image": image.astype(np.float32),
            "object_mask": object_mask,
            "part_masks": stacked,
            "part_valid": valid,
            "image_id": item["image_id"],
            "class_id": np.int32(item.get("class_id", 0)),
        }


@dataclasses.dataclass
class PartDistillationTrainMapper:
    """Stage-5 train: {image, masks, labels, valid, gt_object_class}."""

    image_size: int = 640
    capacity: int = 8
    min_score: float = 0.0
    min_area_ratio: float = 0.0
    augment: AugmentConfig = AugmentConfig()
    seed: int = 0

    def _item_rng(self, item: dict) -> np.random.RandomState:
        # Per-item generator: the loader's thread pool calls mappers
        # concurrently and np.random.RandomState is not thread-safe (a shared
        # state yields correlated/corrupted augmentations). Seeding by
        # (seed, image_id, epoch) is both thread-safe and reproducible, with
        # fresh augmentations each epoch (the loader injects ``_epoch``).
        import zlib

        key = zlib.crc32(str(item.get("image_id", "")).encode())
        return np.random.RandomState(
            (self.seed & 0xFFFFFFFF, key, item.get("_epoch", 0) & 0xFFFFFFFF))

    def __call__(self, item: dict) -> Optional[dict]:
        image = load_image(item["file_name"])
        if image is None:
            return None
        record = item.get("part_labels")
        if record is None and "part_label_store" in item:
            record = _STORES.get(item["part_label_store"]).get(item["image_id"])
        if record is None:
            return None

        masks = _decode_rles(record.get("part_masks", []))
        labels = list(record.get("part_labels", []))
        scores = list(record.get("part_scores", [1.0] * len(masks)))
        keep = [i for i, (m, s) in enumerate(zip(masks, scores))
                if s >= self.min_score and m.any()]
        if not keep:
            return None
        masks = [masks[i] for i in keep]
        labels = [labels[i] for i in keep]

        size = self.image_size
        union = np.zeros(masks[0].shape, bool)
        for m in masks:
            union |= m
        scale, cy, cx, flip = random_augment(self._item_rng(item), self.augment, size, union)
        image = apply_crop_flip(image, scale, cy, cx, flip, size, is_mask=False)
        masks = [apply_crop_flip(m, scale, cy, cx, flip, size, is_mask=True)
                 for m in masks]
        min_px = self.min_area_ratio * size * size
        pairs = [(m, l) for m, l in zip(masks, labels) if m.sum() > max(min_px, 0)]
        if not pairs:
            return None
        masks = [m for m, _ in pairs]
        labels = [l for _, l in pairs]
        stacked, valid = pad_stack(masks, self.capacity, size)
        padded_labels = np.zeros((self.capacity,), np.int32)
        padded_labels[: len(labels[: self.capacity])] = labels[: self.capacity]
        return {
            "image": image.astype(np.float32),
            "masks": stacked,
            "labels": padded_labels,
            "valid": valid,
            "gt_object_class": np.int32(record.get("object_class", item.get("class_id", 0))),
            "image_id": item["image_id"],
        }


@dataclasses.dataclass
class PartDistillationSaveMapper:
    """Stage-5 save/inference input: image + stage-4 class-labeled part masks
    (their union is the object region) + gt_object_class, deterministic resize
    (the part_distillation_model.py:290-311 save pass reads the stage-4 store
    un-augmented)."""

    image_size: int = 640
    capacity: int = 8

    def __call__(self, item: dict) -> Optional[dict]:
        image = load_image(item["file_name"])
        if image is None:
            return None
        record = item.get("part_labels")
        if record is None and "part_label_store" in item:
            record = _STORES.get(item["part_label_store"]).get(item["image_id"])
        if record is None:
            return None
        masks = _decode_rles(record.get("part_masks", []))
        if not masks:
            return None
        labels = list(record.get("part_labels", [0] * len(masks)))
        size = (self.image_size, self.image_size)
        image = resize_image(image, size)
        masks = [resize_mask(m, size) for m in masks]
        object_mask = np.zeros(size, bool)
        for m in masks:
            object_mask |= m
        if not object_mask.any():
            return None
        stacked, valid = pad_stack(masks, self.capacity, self.image_size)
        padded = np.zeros((self.capacity,), np.int32)
        padded[: len(labels[: self.capacity])] = labels[: self.capacity]
        return {
            "image": image.astype(np.float32),
            "object_mask": object_mask,
            "part_masks": stacked,
            "part_labels": padded,
            "part_valid": valid,
            "gt_object_class": np.int32(record.get("object_class",
                                                   item.get("class_id", 0))),
            "image_id": item["image_id"],
        }


@dataclasses.dataclass
class PartEvalMapper:
    """Eval sets: {image, object_mask, gt_part_masks (T,S,S), gt_part_labels,
    gt_valid, object_class}. ``merge_parts_by_class`` merges all instances of
    one part class into a single GT mask (part_imagenet_mapper.py:182-190)."""

    image_size: int = 640
    capacity: int = 16
    merge_parts_by_class: bool = True
    # Dataset-global part-name -> id vocabulary for Pascal-Parts items. Label
    # ids index accumulated confusion matrices, so they MUST be consistent
    # across images — build with PartEvalMapper.pascal_vocab(items) (the
    # pascal_info canonical table analog), never per image.
    part_vocab: Optional[Dict[str, int]] = None

    @staticmethod
    def pascal_vocab(items: List[dict]) -> Dict[str, int]:
        names = sorted({
            f"{o['class_name']}:{p['name']}"
            for it in items for o in it.get("objects", []) for p in o["parts"]
        })
        return {n: i for i, n in enumerate(names)}

    def __call__(self, item: dict) -> Optional[dict]:
        image = load_image(item["file_name"])
        if image is None:
            return None
        size = (self.image_size, self.image_size)
        image = resize_image(image, size)

        parts: List[np.ndarray] = []
        labels: List[int] = []
        object_mask = np.zeros(size, bool)

        if "annotations" in item:  # PartImageNet COCO anns
            from .datasets.part_imagenet import ann_to_mask

            h, w = item.get("height"), item.get("width")
            by_class: Dict[int, np.ndarray] = {}
            for ann in item["annotations"]:
                m = resize_mask(ann_to_mask(ann, h, w), size)
                cid = int(ann["category_id"])
                if self.merge_parts_by_class:
                    by_class[cid] = by_class.get(cid, np.zeros(size, bool)) | m
                else:
                    parts.append(m)
                    labels.append(cid)
            for cid, m in sorted(by_class.items()):
                parts.append(m)
                labels.append(cid)
        elif "objects" in item:  # Pascal-Parts
            if self.part_vocab is None:
                raise ValueError(
                    "Pascal-Parts items need a dataset-global part vocabulary: "
                    "PartEvalMapper(part_vocab=PartEvalMapper.pascal_vocab(items))")
            name_to_id = self.part_vocab
            by_class = {}
            for obj in item["objects"]:
                object_mask |= resize_mask(obj["mask"], size)
                for p in obj["parts"]:
                    m = resize_mask(p["mask"], size)
                    cid = name_to_id[f"{obj['class_name']}:{p['name']}"]
                    if self.merge_parts_by_class:
                        by_class[cid] = by_class.get(cid, np.zeros(size, bool)) | m
                    else:
                        parts.append(m)
                        labels.append(cid)
            for cid, m in sorted(by_class.items()):
                parts.append(m)
                labels.append(cid)
        elif "part_png" in item:  # Cityscapes panoptic parts
            from .datasets.cityscapes_part import (CITYSCAPES_PART_BASE,
                                                   decode_panoptic_parts)

            # NOT load_image: the uid PNGs are 16/32-bit integer images and an
            # RGB-uint8 conversion would clamp the encoded ids
            from PIL import Image

            try:
                with Image.open(item["part_png"]) as im:
                    uids = np.asarray(im)
            except Exception:
                return None
            if uids.ndim == 3:
                uids = uids[..., 0]
            uids = uids.astype(np.int64)
            # item["sid"] restricts to one object class (per-object-class eval
            # keying); labels use the global PART_BASE_ID offsets so ids from
            # different classes never collide (cityscapes_part_mapper.py:74).
            want_sid = item.get("sid")
            by_class = {}
            for obj in decode_panoptic_parts(uids):
                if want_sid is not None and obj["sid"] != want_sid:
                    continue
                object_mask |= resize_mask(obj["object_mask"], size)
                base = CITYSCAPES_PART_BASE.get(obj["sid"], 0)
                for p in obj["parts"]:
                    m = resize_mask(p["mask"], size)
                    cid = base + p["pid"] - 1
                    if self.merge_parts_by_class:
                        by_class[cid] = by_class.get(cid, np.zeros(size, bool)) | m
                    else:
                        parts.append(m)
                        labels.append(cid)
            for cid, m in sorted(by_class.items()):
                parts.append(m)
                labels.append(cid)
        else:
            return None

        for m in parts:
            object_mask |= m
        if not parts or not object_mask.any():
            return None
        stacked, valid = pad_stack(parts, self.capacity, self.image_size)
        padded = np.zeros((self.capacity,), np.int32)
        padded[: len(labels[: self.capacity])] = labels[: self.capacity]
        return {
            "image": image.astype(np.float32),
            "object_mask": object_mask,
            "gt_part_masks": stacked,
            "gt_part_labels": padded,
            "gt_valid": valid,
            "object_class": np.int32(item.get("class_id", 0)),
            "image_id": item["image_id"],
        }
