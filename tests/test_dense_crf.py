"""Dense-CRF mean-field: kernel components vs brute force + end-to-end effect."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partdistillation_tpu.ops.dense_crf import (
    DenseCRFParams,
    bilateral_filter,
    bilateral_filter_conv,
    dense_crf,
    gaussian_blur,
    unary_from_masks,
)


def brute_force_bilateral(image, values, sxy, srgb):
    h, w, c = values.shape
    pos = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1)
    pos = pos.reshape(-1, 2).astype(np.float64)
    col = image.reshape(-1, 3).astype(np.float64)
    v = values.reshape(-1, c).astype(np.float64)
    d_pos = ((pos[:, None] - pos[None]) ** 2).sum(-1) / (2 * sxy**2)
    d_col = ((col[:, None] - col[None]) ** 2).sum(-1) / (2 * srgb**2)
    k = np.exp(-d_pos - d_col)
    return (k @ v).reshape(h, w, c)


class TestKernels:
    def test_gaussian_blur_matches_dense_kernel(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(12, 14, 2).astype(np.float32))
        out = gaussian_blur(x, sigma=1.5)
        # brute force over the same truncated support
        xs = np.asarray(x)
        ref = np.zeros_like(xs)
        radius = int(np.ceil(2 * 1.5))
        for i in range(12):
            for j in range(14):
                acc = np.zeros(2)
                for di in range(-radius, radius + 1):
                    for dj in range(-radius, radius + 1):
                        ii, jj = i + di, j + dj
                        if 0 <= ii < 12 and 0 <= jj < 14:
                            wgt = np.exp(-(di**2 + dj**2) / (2 * 1.5**2))
                            acc += wgt * xs[ii, jj]
                ref[i, j] = acc
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    def test_bilateral_grid_correlates_with_brute_force(self):
        rng = np.random.RandomState(1)
        h = w = 16
        image = np.zeros((h, w, 3), np.float32)
        image[:, : w // 2] = 30.0
        image[:, w // 2 :] = 220.0
        image += rng.randn(h, w, 3).astype(np.float32) * 3
        values = rng.rand(h, w, 2).astype(np.float32)

        ours = np.asarray(bilateral_filter(jnp.asarray(image), jnp.asarray(values),
                                           sxy=4.0, srgb=40.0))
        ref = brute_force_bilateral(image, values, 4.0, 40.0)
        # grid is an approximation: check strong correlation, not equality
        corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
        assert corr > 0.9, f"bilateral grid corr {corr}"

    def test_bilateral_conv_matches_brute_force(self):
        """Windowed-conv bilateral (the production default): near-exact at
        stride 1, and still tighter than the grid at stride 2."""
        rng = np.random.RandomState(1)
        h = w = 24
        image = np.zeros((h, w, 3), np.float32)
        image[:, : w // 2] = 30.0
        image[:, w // 2 :] = 220.0
        image += rng.randn(h, w, 3).astype(np.float32) * 3
        values = rng.rand(h, w, 2).astype(np.float32)
        ref = brute_force_bilateral(image, values, 4.0, 40.0)

        for stride, min_corr, max_rel in ((1, 0.999, 0.02), (2, 0.98, 0.06)):
            ours = np.asarray(bilateral_filter_conv(
                jnp.asarray(image), jnp.asarray(values), 4.0, 40.0,
                stride=stride))
            corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
            rel = np.abs(ours - ref).mean() / np.abs(ref).mean()
            assert corr > min_corr and rel < max_rel, (stride, corr, rel)

    def test_bilateral_conv_respects_color_edges(self):
        h = w = 20
        image = np.zeros((h, w, 3), np.float32)
        image[:, : w // 2] = 10.0
        image[:, w // 2 :] = 245.0
        values = np.zeros((h, w, 1), np.float32)
        values[:, : w // 2] = 1.0
        out = np.asarray(bilateral_filter_conv(
            jnp.asarray(image), jnp.asarray(values), sxy=5.0, srgb=13.0))
        left = out[:, : w // 2 - 2].mean()
        right = out[:, w // 2 + 2 :].mean()
        assert left > 10 * max(right, 1e-6)

    def test_bilateral_conv_odd_sizes_and_stride_padding(self):
        # non-divisible H/W exercises the pad + crop path
        rng = np.random.RandomState(2)
        image = jnp.asarray(rng.rand(23, 17, 3).astype(np.float32) * 255)
        values = jnp.asarray(rng.rand(23, 17, 2).astype(np.float32))
        out = bilateral_filter_conv(image, values, sxy=10.0, srgb=13.0)
        assert out.shape == (23, 17, 2)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_bilateral_respects_color_edges(self):
        # values on the left half must not bleed across a hard color edge
        h = w = 20
        image = np.zeros((h, w, 3), np.float32)
        image[:, : w // 2] = 10.0
        image[:, w // 2 :] = 245.0
        values = np.zeros((h, w, 1), np.float32)
        values[:, : w // 2] = 1.0
        out = np.asarray(bilateral_filter(jnp.asarray(image), jnp.asarray(values),
                                          sxy=5.0, srgb=13.0))
        left = out[:, : w // 2 - 2].mean()
        right = out[:, w // 2 + 2 :].mean()
        assert left > 10 * max(right, 1e-6)


class TestDenseCRF:
    def test_unary_from_masks(self):
        masks = jnp.zeros((2, 4, 4), bool).at[0, :2].set(True).at[1, 2:].set(True)
        valid = jnp.asarray([True, False])
        u = unary_from_masks(masks, valid, gt_prob=0.7)
        assert u.shape == (4, 4, 3)
        probs = np.exp(-np.asarray(u))
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
        assert probs[0, 0, 1] == pytest.approx(0.7)   # mask 0 region -> label 1
        assert probs[3, 3, 0] == pytest.approx(0.7)   # invalid mask 1 -> background

    def test_crf_snaps_noisy_mask_to_color_edge(self):
        rng = np.random.RandomState(0)
        h = w = 48
        image = np.zeros((h, w, 3), np.float32)
        image[:, : w // 2] = [200, 40, 40]
        image[:, w // 2 :] = [40, 40, 200]
        image += rng.randn(h, w, 3) * 5

        # noisy unary: mask is the left half but with a ragged, wrong boundary
        noisy = np.zeros((1, h, w), bool)
        noisy[0, :, : w // 2] = True
        flip = rng.rand(h, w) < 0.15
        band = np.zeros((h, w), bool)
        band[:, w // 2 - 6 : w // 2 + 6] = True
        noisy[0] ^= flip & band

        unary = unary_from_masks(jnp.asarray(noisy), jnp.asarray([True]), 0.7)
        params = DenseCRFParams(iters=5, bilateral_sxy=8.0, bilateral_srgb=13.0)
        q = dense_crf(jnp.asarray(image), unary, params)
        refined = np.asarray(q.argmax(-1) == 1)

        target = np.zeros((h, w), bool)
        target[:, : w // 2] = True
        err_before = (noisy[0] != target).mean()
        err_after = (refined != target).mean()
        assert err_after < err_before * 0.5, (err_before, err_after)

    def test_crf_jits_and_batches(self):
        rng = np.random.RandomState(0)
        image = jnp.asarray(rng.rand(4, 24, 24, 3).astype(np.float32) * 255)
        masks = jnp.asarray(rng.rand(4, 2, 24, 24) < 0.4)
        valid = jnp.ones((4, 2), bool)
        params = DenseCRFParams(iters=2)

        def one(img, m, v):
            return dense_crf(img, unary_from_masks(m, v, 0.7), params)

        out = jax.jit(jax.vmap(one))(image, masks, valid)
        assert out.shape == (4, 24, 24, 3)
        assert bool(jnp.all(jnp.isfinite(out)))
