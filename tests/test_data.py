"""Data layer: pseudo-label store, registrars, mappers, loader."""

import os

import numpy as np
import pytest

from partdistillation_tpu.data.catalog import DatasetCatalog
from partdistillation_tpu.data.datasets.cityscapes_part import decode_panoptic_parts
from partdistillation_tpu.data.datasets.imagenet import (
    load_imagenet,
    load_imagenet_with_proposals,
)
from partdistillation_tpu.data.datasets.pascal_parts import canonical_part_name
from partdistillation_tpu.data.datasets.part_imagenet import load_part_imagenet
from partdistillation_tpu.data.loader import DataLoader, batch_iterator, host_shard
from partdistillation_tpu.data.mappers import (
    ProposalGenerationMapper,
    ProposalTrainMapper,
)
from partdistillation_tpu.data.pseudo_store import PseudoLabelStore, ShardWriter
from partdistillation_tpu.utils import rle as rle_codec


def _write_jpeg(path, h=32, w=32, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(path)


@pytest.fixture
def mini_imagenet(tmp_path):
    root = tmp_path / "imagenet"
    for ci, code in enumerate(["n01440764", "n01443537", "n01484850"]):
        d = root / code
        d.mkdir(parents=True)
        for j in range(4):
            _write_jpeg(str(d / f"{code}_{j}.JPEG"), seed=ci * 10 + j)
    (root / "labels.txt").write_text(
        "n01440764 tench\nn01443537 goldfish\nn01484850 great white shark\n"
    )
    return str(root)


class TestPseudoStore:
    def test_roundtrip_and_resume(self, tmp_path):
        store_dir = str(tmp_path / "store")
        mask = np.zeros((16, 16), bool)
        mask[4:9, 2:11] = True
        with ShardWriter(store_dir, 0, 2) as w:
            assert w.write({"image_id": "a", "part_masks": [rle_codec.encode(mask)]})
            assert w.write({"image_id": "b", "x": 1})
            assert not w.write({"image_id": "a"})  # dedup
        # reopen: resume skips written ids
        with ShardWriter(store_dir, 0, 2) as w:
            assert "a" in w and "b" in w
            assert w.write({"image_id": "c", "x": 2})
        store = PseudoLabelStore(store_dir)
        assert set(store.ids()) == {"a", "b", "c"}
        rec = store.get("a")
        np.testing.assert_array_equal(rle_codec.decode(rec["part_masks"][0]), mask)
        assert store.get("zzz") is None
        assert len(list(iter(store))) == 3

    def test_truncated_tail_recovery(self, tmp_path):
        store_dir = str(tmp_path / "store")
        with ShardWriter(store_dir, 0, 1) as w:
            w.write({"image_id": "a", "x": 1})
            w.write({"image_id": "b", "x": 2})
        path = os.path.join(store_dir, os.listdir(store_dir)[0].replace(".idx", ""))
        shard = [p for p in os.listdir(store_dir) if p.endswith(".pdrec")][0]
        path = os.path.join(store_dir, shard)
        os.remove(path + ".idx")
        with open(path, "r+b") as f:
            f.truncate(os.path.getsize(path) - 3)  # corrupt record "b"
        w = ShardWriter(store_dir, 0, 1)
        assert "a" in w and "b" not in w
        assert w.write({"image_id": "b", "x": 3})
        w.close()
        assert PseudoLabelStore(store_dir).get("b")["x"] == 3


class TestRegistrars:
    def test_imagenet_walk_and_partition(self, mini_imagenet):
        items = load_imagenet(mini_imagenet)
        assert len(items) == 12
        assert items[0]["class_name"] == "tench"
        # partition: 3 classes over 2 partitions -> 2 + 1 classes, disjoint
        p0 = load_imagenet(mini_imagenet, partition_index=0, total_partitions=2)
        p1 = load_imagenet(mini_imagenet, partition_index=1, total_partitions=2)
        assert {i["image_id"] for i in p0} | {i["image_id"] for i in p1} == {
            i["image_id"] for i in items
        }
        assert not ({i["image_id"] for i in p0} & {i["image_id"] for i in p1})
        # skip_ids resume
        done = {items[0]["image_id"], items[1]["image_id"]}
        rest = load_imagenet(mini_imagenet, skip_ids=done)
        assert len(rest) == 10

    def test_manifest_cache(self, mini_imagenet, tmp_path):
        """The cached manifest must produce the identical item list (including
        class ids) and be built exactly once (startup O(1) listdirs after)."""
        from partdistillation_tpu.data.datasets.imagenet import global_code_to_id

        mpath = str(tmp_path / "manifest.json")
        direct = load_imagenet(mini_imagenet)
        via = load_imagenet(mini_imagenet, manifest=mpath)
        assert via == direct
        assert os.path.exists(mpath)
        # second load reads the cache (identical result, ids included)
        again = load_imagenet(mini_imagenet, manifest=mpath)
        assert again == direct
        assert global_code_to_id(mini_imagenet, manifest=mpath) == \
            global_code_to_id(mini_imagenet)
        # the manifest survives new files appearing on disk (it is a snapshot:
        # the point is identical enumeration across every host and restart)
        extra_dir = os.path.join(mini_imagenet, direct[0]["class_code"])
        open(os.path.join(extra_dir, "zzz_new.jpg"), "wb").close()
        try:
            assert load_imagenet(mini_imagenet, manifest=mpath) == direct
        finally:
            os.unlink(os.path.join(extra_dir, "zzz_new.jpg"))

    def test_supplied_vocabulary_mapping(self, mini_imagenet, tmp_path):
        """A JSON vocab file replaces the derived mapping (the reference's
        imagenet1k_to_22k_mapping.pkl contract, part_imagenet_mapper.py
        :100-103): ids come from the file, and vocab entries without a class
        dir on disk don't enumerate."""
        import json

        from partdistillation_tpu.data.datasets.imagenet import global_code_to_id

        vocab = {"n01440764": 100, "n01443537": 205, "n09999999": 7}
        vpath = tmp_path / "vocab.json"
        vpath.write_text(json.dumps(vocab))
        assert global_code_to_id(mini_imagenet, str(vpath)) == vocab
        items = load_imagenet(mini_imagenet, vocab_map=str(vpath))
        by_code = {i["class_code"]: i["class_id"] for i in items}
        # n01484850 is on disk but not in the vocabulary; n09999999 has no dir
        assert by_code == {"n01440764": 100, "n01443537": 205}

    def test_imagenet_with_object_store_filter(self, mini_imagenet, tmp_path):
        items = load_imagenet(mini_imagenet)
        store_dir = str(tmp_path / "stage1")
        mask = np.ones((32, 32), bool)
        with ShardWriter(store_dir, 0, 1) as w:
            for it in items[:5]:
                w.write({"image_id": it["image_id"],
                         "object_masks": [rle_codec.encode(mask)]})
        kept = load_imagenet(mini_imagenet, object_mask_store=store_dir)
        assert len(kept) == 5 and all("object_store" in it for it in kept)

    def test_proposal_join_ratio_filter(self, mini_imagenet, tmp_path):
        items = load_imagenet(mini_imagenet)
        store_dir = str(tmp_path / "stage2")
        m = np.zeros((32, 32), bool)
        m[:16] = True
        with ShardWriter(store_dir, 0, 1) as w:
            w.write({"image_id": items[0]["image_id"], "object_ratio": 0.5,
                     "part_masks": [rle_codec.encode(m)]})
            w.write({"image_id": items[1]["image_id"], "object_ratio": 0.01,
                     "part_masks": [rle_codec.encode(m)]})
        out = load_imagenet_with_proposals(items, store_dir, min_object_area_ratio=0.1)
        assert [o["image_id"] for o in out] == [items[0]["image_id"]]

    def test_part_imagenet_json(self, tmp_path):
        import json

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        _write_jpeg(str(img_dir / "n02084071_1.JPEG"))
        coco = {
            "images": [{"id": 7, "file_name": "n02084071_1.JPEG",
                        "height": 32, "width": 32}],
            "annotations": [
                {"id": 1, "image_id": 7, "category_id": 2,
                 "segmentation": [[2.0, 2.0, 20.0, 2.0, 20.0, 20.0, 2.0, 20.0]]},
            ],
            "categories": [{"id": 2, "name": "dog:head"}],
        }
        jf = tmp_path / "ann.json"
        jf.write_text(json.dumps(coco))
        items = load_part_imagenet(str(jf), str(img_dir))
        assert len(items) == 1
        assert items[0]["class_code"] == "n02084071"
        assert len(items[0]["annotations"]) == 1

    def test_pascal_canonicalization(self):
        assert canonical_part_name("lfleg") == "leg"
        assert canonical_part_name("rbleg") == "leg"
        assert canonical_part_name("reye") == "eye"
        assert canonical_part_name("leye") == "eye"
        assert canonical_part_name("wheel_2") == "wheel"
        assert canonical_part_name("frontside") == "side"
        assert canonical_part_name("head") == "head"
        assert canonical_part_name("torso") == "torso"

    def test_cityscapes_uid_decode(self):
        uids = np.zeros((8, 8), np.int64)
        uids[:4, :4] = 24001 * 100 + 1    # person 1, part 1  (sid_iid_pid)
        uids[:4, 4:] = 24001 * 100 + 2    # person 1, part 2
        uids[4:, :] = 26002               # car 2, no parts (sid_iid)
        objs = decode_panoptic_parts(uids)
        names = {(o["class_name"], o["iid"], len(o["parts"])) for o in objs}
        assert ("person", 1, 2) in names and ("car", 2, 0) in names

    def test_catalog(self, mini_imagenet):
        cat = DatasetCatalog()
        spec = cat.register("in_mini", lambda: load_imagenet(mini_imagenet))
        assert len(cat.get("in_mini").items()) == 12
        with pytest.raises(ValueError):
            cat.register("in_mini", lambda: [])
        assert "in_mini" in cat and spec.name == "in_mini"


class TestMappersAndLoader:
    def test_generation_mapper_and_loader(self, mini_imagenet, tmp_path):
        items = load_imagenet(mini_imagenet)
        store_dir = str(tmp_path / "stage1")
        mask = np.zeros((32, 32), bool)
        mask[8:24, 8:24] = True
        with ShardWriter(store_dir, 0, 1) as w:
            for it in items:
                w.write({"image_id": it["image_id"],
                         "object_masks": [rle_codec.encode(mask)]})
        items = load_imagenet(mini_imagenet, object_mask_store=store_dir)
        mapper = ProposalGenerationMapper(image_size=64)
        batches = list(batch_iterator(items, mapper, batch_size=5))
        assert len(batches) == 3  # 12 items -> 5,5,2(padded)
        b = batches[0]
        assert b["image"].shape == (5, 64, 64, 3)
        assert b["object_mask"].shape == (5, 64, 64)
        assert b["batch_valid"].all()
        assert batches[-1]["batch_valid"].sum() == 2

    def test_train_mapper_fixed_capacity(self, mini_imagenet, tmp_path):
        items = load_imagenet(mini_imagenet)
        store_dir = str(tmp_path / "stage2")
        rng = np.random.RandomState(0)
        with ShardWriter(store_dir, 0, 1) as w:
            for it in items:
                masks = [rle_codec.encode(rng.rand(32, 32) < 0.3) for _ in range(4)]
                w.write({"image_id": it["image_id"], "object_ratio": 0.4,
                         "part_masks": masks})
        joined = load_imagenet_with_proposals(items, store_dir)
        mapper = ProposalTrainMapper(image_size=64, capacity=8, seed=3)
        ex = mapper(joined[0])
        assert ex["image"].shape == (64, 64, 3)
        assert ex["masks"].shape == (8, 64, 64)
        assert ex["valid"].dtype == bool and ex["valid"].sum() <= 8

    def test_host_shard_and_prefetch_loader(self, mini_imagenet):
        items = load_imagenet(mini_imagenet)
        s0 = host_shard(items, 0, 2)
        s1 = host_shard(items, 1, 2)
        assert len(s0) + len(s1) == len(items)

        def mapper(item):
            return {"x": np.float32(item["class_id"])}

        loader = DataLoader(items, mapper, batch_size=4, shuffle=True, seed=1)
        batches = list(loader)
        assert len(batches) == 3 and batches[0]["x"].shape == (4,)


def test_class_ids_global_across_partitions(tmp_path):
    """class_id must be identical for a class regardless of which partition
    slice enumerates it (stages 4/5 key centroid banks by it)."""
    import numpy as np
    from PIL import Image

    from partdistillation_tpu.data.datasets.imagenet import (
        global_code_to_id, load_imagenet)

    root = tmp_path / "im"
    codes = ["n001", "n002", "n003", "n004"]
    for c in codes:
        d = root / c
        d.mkdir(parents=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(str(d / f"{c}_0.JPEG"))

    full = {it["class_code"]: it["class_id"] for it in load_imagenet(str(root))}
    for pi in range(2):
        part = load_imagenet(str(root), partition_index=pi, total_partitions=2)
        for it in part:
            assert it["class_id"] == full[it["class_code"]]
    assert global_code_to_id(str(root)) == full


def test_mapper_rng_is_per_item_and_epoch(tmp_path):
    """Same (item, epoch) -> same augmentation; different epoch -> different."""
    import numpy as np

    from partdistillation_tpu.data.mappers import ProposalTrainMapper

    m = ProposalTrainMapper(image_size=16, seed=3)
    r1 = m._item_rng({"image_id": "a", "_epoch": 0}).rand(4)
    r2 = m._item_rng({"image_id": "a", "_epoch": 0}).rand(4)
    r3 = m._item_rng({"image_id": "a", "_epoch": 1}).rand(4)
    r4 = m._item_rng({"image_id": "b", "_epoch": 0}).rand(4)
    np.testing.assert_array_equal(r1, r2)
    assert not np.array_equal(r1, r3)
    assert not np.array_equal(r1, r4)


def test_pascal_part_vocab_is_global():
    from partdistillation_tpu.data.mappers import PartEvalMapper

    items = [
        {"objects": [{"class_name": "cow",
                      "parts": [{"name": "head"}, {"name": "leg"}]}]},
        {"objects": [{"class_name": "cow",
                      "parts": [{"name": "ear"}, {"name": "head"}]}]},
    ]
    vocab = PartEvalMapper.pascal_vocab(items)
    assert vocab == {"cow:ear": 0, "cow:head": 1, "cow:leg": 2}
    # mapper without a vocab must refuse Pascal items rather than invent
    # per-image label ids
    import tempfile

    import pytest
    from PIL import Image

    with tempfile.NamedTemporaryFile(suffix=".png") as f:
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(f.name)
        m = PartEvalMapper(image_size=16)
        with pytest.raises(ValueError, match="global part vocabulary"):
            m({"file_name": f.name, "image_id": "x", "objects": [
                {"class_name": "cow", "mask": np.ones((16, 16), bool),
                 "parts": [{"name": "head", "mask": np.ones((16, 16), bool)}]}]})


def test_batch_iterator_bounded_window_preserves_order_and_epoch():
    """The bounded in-flight rewrite must keep deterministic order, inject
    _epoch, and still fill batches across epochs under heavy rejection."""
    from partdistillation_tpu.data.loader import batch_iterator

    items = [{"image_id": f"i{k}", "v": k} for k in range(10)]
    seen_epochs = []

    def mapper(item):
        seen_epochs.append(item["_epoch"])
        if item["v"] % 2:  # reject odd items
            return None
        return {"x": np.asarray([item["v"]], np.int64), "image_id": item["image_id"]}

    batches = list(batch_iterator(items, mapper, batch_size=4, num_workers=3,
                                  epochs=2, drop_last=False))
    vals = np.concatenate([b["x"][b["batch_valid"]] for b in batches])[:, 0]
    # two epochs of the 5 even items, unshuffled order preserved
    np.testing.assert_array_equal(vals, [0, 2, 4, 6, 8] * 2)
    assert set(seen_epochs) == {0, 1}
    # partial final batch padded by repetition, marked invalid
    assert batches[-1]["batch_valid"].sum() == len(vals) % 4 or batches[-1]["batch_valid"].all()


def test_dataloader_surfaces_worker_errors():
    """A crash in the prefetch thread must raise in the consumer, not end the
    stream silently (the r3 'steps: 0' bug: num_workers=0 killed the thread)."""
    from partdistillation_tpu.data.loader import DataLoader

    def bad_mapper(item):
        raise KeyError("boom")

    loader = DataLoader([{"image_id": "a"}], bad_mapper, batch_size=1)
    with pytest.raises(RuntimeError, match="DataLoader worker failed"):
        list(loader)


def test_dataloader_num_workers_zero_still_loads():
    from partdistillation_tpu.data.loader import DataLoader

    items = [{"v": k} for k in range(4)]
    loader = DataLoader(items, lambda it: {"x": np.asarray([it["v"]])},
                        batch_size=2, num_workers=0)
    batches = list(loader)
    assert len(batches) == 2
