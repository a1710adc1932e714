"""Native C++ RLE codec: parity with the numpy implementation + speed sanity."""

import os
import time

import numpy as np
import pytest

from partdistillation_tpu.utils import native_lib
from partdistillation_tpu.utils import rle as rle_codec
from partdistillation_tpu.utils.rle import (
    _compress_counts,
    _decompress_counts,
    _mask_to_runs,
)

pytestmark = pytest.mark.skipif(
    not native_lib.native_available(), reason="native lib not built (no g++?)")


def _random_masks(rng, n=8, h=97, w=123, p=0.35):
    return [rng.rand(h, w) < p for _ in range(n)]


class TestNativeParity:
    def test_encode_matches_numpy(self):
        rng = np.random.RandomState(0)
        for mask in _random_masks(rng):
            native = native_lib.encode_counts(mask.astype(np.uint8))
            ref = _compress_counts(_mask_to_runs(mask))
            assert native == ref

    def test_decode_roundtrip(self):
        rng = np.random.RandomState(1)
        for mask in _random_masks(rng):
            rle = rle_codec.encode(mask)  # native path
            out = rle_codec.decode(rle)
            np.testing.assert_array_equal(out.astype(bool), mask)

    def test_edge_masks(self):
        for mask in [np.zeros((5, 7), bool), np.ones((5, 7), bool),
                     np.eye(6, dtype=bool)]:
            counts = native_lib.encode_counts(mask.astype(np.uint8))
            assert counts == _compress_counts(_mask_to_runs(mask))
            dec = native_lib.decode_counts(counts, *mask.shape)
            np.testing.assert_array_equal(dec.astype(bool), mask)

    def test_area(self):
        rng = np.random.RandomState(2)
        for mask in _random_masks(rng, n=4):
            rle = rle_codec.encode(mask)
            assert rle_codec.area(rle) == int(mask.sum())

    def test_iou_matrix_matches_dense(self):
        rng = np.random.RandomState(3)
        dets = [rle_codec.encode(m) for m in _random_masks(rng, n=5, h=40, w=40)]
        gts = [rle_codec.encode(m) for m in _random_masks(rng, n=3, h=40, w=40)]
        native = rle_codec.iou_matrix(dets, gts)
        # dense reference
        d = np.stack([rle_codec.decode(r).astype(bool).ravel() for r in dets])
        g = np.stack([rle_codec.decode(r).astype(bool).ravel() for r in gts])
        inter = d.astype(np.int64) @ g.T.astype(np.int64)
        union = d.sum(-1)[:, None] + g.sum(-1)[None] - inter
        ref = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        np.testing.assert_allclose(native, ref, atol=1e-12)

    def test_interop_with_python_fallback(self, monkeypatch):
        """Records written with native counts decode via numpy path and back."""
        rng = np.random.RandomState(4)
        mask = rng.rand(64, 64) < 0.4
        rle = rle_codec.encode(mask)
        runs = _decompress_counts(rle["counts"])
        assert int(runs.sum()) == 64 * 64

    def test_speedup_over_numpy(self):
        rng = np.random.RandomState(5)
        masks = [rng.rand(640, 640) < 0.3 for _ in range(10)]
        t0 = time.perf_counter()
        for m in masks:
            native_lib.encode_counts(m.astype(np.uint8))
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        for m in masks:
            _compress_counts(_mask_to_runs(m))
        t_numpy = time.perf_counter() - t0
        # don't assert hard ratios on shared CI boxes, just sanity
        assert t_native < t_numpy * 2.0, (t_native, t_numpy)
