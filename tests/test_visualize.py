"""Visualization utils + CLI collage + config system."""

import json
import os

import numpy as np
import pytest

from partdistillation_tpu.config import (
    DataConfig,
    PipelineConfig,
    apply_overrides,
    dataclass_from_dict,
    load_config,
)
from partdistillation_tpu.utils.visualize import (
    color_palette,
    make_collage,
    overlay_masks,
)


class TestVisualize:
    def test_overlay_and_contour(self):
        img = np.full((20, 20, 3), 128, np.uint8)
        masks = np.zeros((2, 20, 20), bool)
        masks[0, 2:10, 2:10] = True
        masks[1, 12:18, 12:18] = True
        out = overlay_masks(img, masks, valid=np.array([True, False]))
        assert out.shape == (20, 20, 3) and out.dtype == np.uint8
        # mask 0 area recolored, mask 1 (invalid) untouched
        assert not (out[5, 5] == 128).all()
        assert (out[14, 14] == 128).all()
        # contour pixels are white
        assert (out[2, 5] == 255).all()

    def test_label_keyed_colors_consistent(self):
        img = np.zeros((8, 8, 3), np.uint8)
        m = np.zeros((1, 8, 8), bool)
        m[0, 2:6, 2:6] = True
        a = overlay_masks(img, m, labels=[3], draw_contours=False)
        b = overlay_masks(img, m, labels=[3], draw_contours=False)
        np.testing.assert_array_equal(a, b)

    def test_collage_grid(self):
        panels = [np.full((10, 12, 3), i * 30, np.uint8) for i in range(5)]
        grid = make_collage(panels, cols=3, pad=2)
        assert grid.shape == (2 * 10 + 2, 3 * 12 + 2 * 2, 3)

    def test_palette_distinct(self):
        pal = color_palette(16)
        assert pal.shape == (16, 3)
        assert len({tuple(c) for c in pal}) == 16


class TestConfigSystem:
    def test_nested_overrides_and_types(self):
        cfg = load_config(PipelineConfig, overrides=[
            "data.batch_size=16", "data.image_size=320", "max_iters=77",
            "data.imagenet_root=/x/y", "n_model_shards=2"])
        assert cfg.data.batch_size == 16 and cfg.data.image_size == 320
        assert cfg.max_iters == 77 and cfg.n_model_shards == 2
        assert cfg.data.imagenet_root == "/x/y"

    def test_unknown_key_rejected(self):
        with pytest.raises(KeyError):
            dataclass_from_dict(DataConfig, {"nope": 1})

    def test_yaml_base_inheritance(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "data:\n  batch_size: 4\n  image_size: 64\nmax_iters: 10\n")
        (tmp_path / "child.yaml").write_text(
            "_BASE_: base.yaml\ndata:\n  batch_size: 8\n")
        cfg = load_config(PipelineConfig, str(tmp_path / "child.yaml"))
        assert cfg.data.batch_size == 8      # child wins
        assert cfg.data.image_size == 64     # inherited
        assert cfg.max_iters == 10

    def test_override_scalar_parsing(self):
        out = apply_overrides({}, ["a.b=true", "a.c=1.5", "a.d=none", "a.e=[1,2]"])
        assert out["a"] == {"b": True, "c": 1.5, "d": None, "e": [1, 2]}

    def test_stage_paths(self):
        cfg = load_config(PipelineConfig, overrides=["paths.root=/tmp/pl"])
        assert cfg.paths.object_labels == "/tmp/pl/object_labels"
        assert cfg.paths.proposals_dcrf == "/tmp/pl/proposals_dcrf"


def test_visualize_cli(tmp_path, capsys):
    from PIL import Image

    from partdistillation_tpu import run as cli
    from partdistillation_tpu.data.pseudo_store import ShardWriter
    from partdistillation_tpu.utils import rle as rle_codec

    root = tmp_path / "imagenet" / "n01440764"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    store_dir = tmp_path / "store"
    with ShardWriter(str(store_dir), 0, 1) as w:
        for j in range(3):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                str(root / f"n01440764_{j}.JPEG"))
            m = np.zeros((32, 32), bool)
            m[4:20, 4:20] = True
            w.write({"image_id": f"n01440764_{j}",
                     "part_masks": [rle_codec.encode(m)], "part_labels": [j]})
    out_png = tmp_path / "collage.png"
    cli.main(["visualize", "--store", str(store_dir), "--output", str(out_png),
              "--cols", "2",
              "--set", f"data.imagenet_root={tmp_path}/imagenet",
              "data.image_size=32"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["panels"] == 3 and os.path.exists(out_png)
    arr = np.asarray(Image.open(out_png))
    assert arr.ndim == 3 and arr.shape[2] == 3
