"""Bilinear sampling vs torch.grid_sample golden oracle, and deformable
attention vs a naive numpy composition (the ops/test.py pattern of the
reference: compare the fast path against a slow, obviously-correct one)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from partdistillation_tpu.ops.sampling import grid_sample, point_sample
from partdistillation_tpu.ops.ms_deform_attn import ms_deform_attn

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("seed", range(3))
def test_grid_sample_matches_torch(seed):
    rng = np.random.RandomState(seed)
    h, w, c = 13, 17, 5
    img = rng.randn(h, w, c).astype(np.float32)
    grid = (rng.rand(9, 11, 2).astype(np.float32) * 2.4 - 1.2)  # includes OOB

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]  # (1, C, H, W)
    t_grid = torch.from_numpy(grid)[None]  # (1, 9, 11, 2)
    ref = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_point_sample_matches_torch():
    rng = np.random.RandomState(0)
    h, w = 24, 24
    img = rng.randn(h, w, 1).astype(np.float32)
    pts = rng.rand(100, 2).astype(np.float32)

    ours = np.asarray(point_sample(jnp.asarray(img), jnp.asarray(pts)))[..., 0]

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    t_grid = torch.from_numpy(2.0 * pts - 1.0)[None, :, None]  # (1, N, 1, 2)
    ref = F.grid_sample(t_img, t_grid, align_corners=False)[0, 0, :, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def naive_ms_deform_attn(value, shapes, loc, weights):
    """Slow numpy oracle: explicit per-sample bilinear interpolation."""
    b, s, m, d = value.shape
    _, lq, _, nl, p, _ = loc.shape
    out = np.zeros((b, lq, m, d), np.float64)
    starts = np.cumsum([0] + [h * w for h, w in shapes])
    for bi in range(b):
        for qi in range(lq):
            for mi in range(m):
                for li, (h, w) in enumerate(shapes):
                    img = value[bi, starts[li] : starts[li + 1], mi].reshape(h, w, d)
                    for pi in range(p):
                        x = loc[bi, qi, mi, li, pi, 0] * w - 0.5
                        y = loc[bi, qi, mi, li, pi, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        acc = np.zeros(d)
                        for dy in (0, 1):
                            for dx in (0, 1):
                                yy, xx = y0 + dy, x0 + dx
                                if 0 <= yy < h and 0 <= xx < w:
                                    wgt = (1 - abs(x - xx)) * (1 - abs(y - yy))
                                    acc += wgt * img[yy, xx]
                        out[bi, qi, mi] += acc * weights[bi, qi, mi, li, pi]
    return out.reshape(b, lq, m * d)


def test_ms_deform_attn_matches_naive():
    rng = np.random.RandomState(1)
    shapes = ((6, 8), (3, 4))
    s = sum(h * w for h, w in shapes)
    b, m, d, lq, p = 2, 2, 4, 5, 3
    value = rng.randn(b, s, m, d).astype(np.float32)
    loc = rng.rand(b, lq, m, len(shapes), p, 2).astype(np.float32) * 1.2 - 0.1
    w = rng.rand(b, lq, m, len(shapes), p).astype(np.float32)
    w /= w.reshape(b, lq, m, -1).sum(-1)[..., None, None]

    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    want = naive_ms_deform_attn(value, shapes, loc, w)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ms_deform_attn_grads_flow():
    shapes = ((4, 4),)
    b, m, d, lq, p = 1, 2, 4, 3, 2
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    value = jax.random.normal(ks[0], (b, 16, m, d))
    loc = jax.random.uniform(ks[1], (b, lq, m, 1, p, 2))
    w = jax.nn.softmax(jax.random.normal(ks[2], (b, lq, m, 1, p)).reshape(b, lq, m, -1)).reshape(
        b, lq, m, 1, p
    )

    def f(value, loc, w):
        return jnp.sum(ms_deform_attn(value, shapes, loc, w) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(value, loc, w)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    # numerical gradcheck on a few coordinates (reference ops/test.py pattern)
    eps = 1e-3
    g_val = np.asarray(grads[0])
    f0 = float(f(value, loc, w))
    for idx in [(0, 0, 0, 0), (0, 7, 1, 2)]:
        vp = value.at[idx].add(eps)
        vm = value.at[idx].add(-eps)
        num = (float(f(vp, loc, w)) - float(f(vm, loc, w))) / (2 * eps)
        np.testing.assert_allclose(g_val[idx], num, rtol=1e-2, atol=1e-3)
