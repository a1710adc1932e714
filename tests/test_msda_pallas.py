"""Pallas separable-sampling kernel vs its XLA reference (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from partdistillation_tpu.ops.msda_pallas import _xla_reference, sample_level


def _case(bm=2, h=8, w=8, d=32, n=50, seed=0):
    rng = np.random.RandomState(seed)
    v = jnp.asarray(rng.randn(bm, w, h * d).astype(np.float32))
    x = jnp.asarray((rng.rand(bm, n) * (w + 2) - 1.5).astype(np.float32))
    y = jnp.asarray((rng.rand(bm, n) * (h + 2) - 1.5).astype(np.float32))
    aw = jnp.asarray(rng.rand(bm, n).astype(np.float32))
    return v, x, y, aw, h, w


def test_forward_matches_xla_reference():
    v, x, y, aw, h, w = _case()
    out = sample_level(v, x, y, aw, h, w)
    ref = _xla_reference(v, x, y, aw, h, w)
    assert out.shape == ref.shape == (2, 50, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_xla_reference_matches_take_path():
    """The kernel's reference equals ms_deform_attn's take formulation."""
    from partdistillation_tpu.ops.ms_deform_attn import ms_deform_attn

    bm, h, w, d, n = 2, 6, 5, 32, 21
    v, x, y, aw, _, _ = _case(bm=bm, h=h, w=w, d=d, n=n, seed=1)
    ref = _xla_reference(v, x, y, aw, h, w)

    # repackage into ms_deform_attn's (B, S, M, D) single-level single-head form
    vy = v.reshape(bm, w, h, d).transpose(0, 2, 1, 3).reshape(bm, h * w, 1, d)
    loc = jnp.stack([(x + 0.5) / w, (y + 0.5) / h], axis=-1).reshape(bm, n, 1, 1, 1, 2)
    weights = aw.reshape(bm, n, 1, 1, 1)
    out = ms_deform_attn(vy, ((h, w),), loc, weights, mode="take")
    np.testing.assert_allclose(np.asarray(out.reshape(bm, n, d)),
                               np.asarray(ref), atol=1e-4)


def test_out_of_range_taps_are_zero():
    v, x, y, aw, h, w = _case(seed=2)
    x = x.at[:, :5].set(-5.0)  # far outside: all hats zero
    out = np.asarray(sample_level(v, x, y, aw, h, w))
    np.testing.assert_allclose(out[:, :5], 0.0, atol=1e-6)


def test_custom_vjp_matches_xla_grads():
    v, x, y, aw, h, w = _case(n=30, seed=3)

    def loss_k(v, x, y, aw):
        return jnp.sum(sample_level(v, x, y, aw, h, w) ** 2)

    def loss_r(v, x, y, aw):
        return jnp.sum(_xla_reference(v, x, y, aw, h, w) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(v, x, y, aw)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(v, x, y, aw)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)
        assert np.abs(np.asarray(a)).sum() > 0


# ---- P-folded thin-hat kernel (sample_level_folded) ----

def _case_folded(bm=2, h=8, w=8, d=32, n=50, p=4, seed=0):
    rng = np.random.RandomState(seed)
    v = jnp.asarray(rng.randn(bm, h * w, d).astype(np.float32))
    x = jnp.asarray((rng.rand(bm, p, n) * (w + 2) - 1.5).astype(np.float32))
    y = jnp.asarray((rng.rand(bm, p, n) * (h + 2) - 1.5).astype(np.float32))
    aw = jnp.asarray(rng.rand(bm, p, n).astype(np.float32))
    return v, x, y, aw, h, w


def test_folded_forward_matches_reference():
    from partdistillation_tpu.ops.msda_pallas import (
        _xla_reference_folded, sample_level_folded)

    for seed, (h, w) in enumerate([(8, 8), (10, 6)]):
        v, x, y, aw, h, w = _case_folded(h=h, w=w, seed=seed)
        out = sample_level_folded(v, x, y, aw, h, w)
        ref = _xla_reference_folded(v, x, y, aw, h, w)
        assert out.shape == ref.shape == (2, 50, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_folded_equals_ms_deform_attn_take():
    """Folded kernel == the take-path op on a single level with P points."""
    from partdistillation_tpu.ops.ms_deform_attn import ms_deform_attn
    from partdistillation_tpu.ops.msda_pallas import sample_level_folded

    bm, h, w, d, n, p = 2, 6, 5, 32, 21, 4
    v, x, y, aw, _, _ = _case_folded(bm=bm, h=h, w=w, d=d, n=n, p=p, seed=3)
    out = sample_level_folded(v, x, y, aw, h, w)

    vy = v.reshape(bm, h * w, 1, d)
    # (BM, P, N) -> (B, Lq, M=1, L=1, P, 2)
    loc = jnp.stack([(x + 0.5) / w, (y + 0.5) / h], axis=-1)
    loc = loc.transpose(0, 2, 1, 3).reshape(bm, n, 1, 1, p, 2)
    weights = aw.transpose(0, 2, 1).reshape(bm, n, 1, 1, p)
    ref = ms_deform_attn(vy, ((h, w),), loc, weights, mode="take")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref.reshape(bm, n, d)),
                               atol=1e-4)


def test_folded_custom_vjp_matches_xla_grads():
    from partdistillation_tpu.ops.msda_pallas import (
        _xla_reference_folded, sample_level_folded)

    v, x, y, aw, h, w = _case_folded(n=30, seed=4)

    def loss_k(v, x, y, aw):
        return jnp.sum(sample_level_folded(v, x, y, aw, h, w) ** 2)

    def loss_r(v, x, y, aw):
        return jnp.sum(_xla_reference_folded(v, x, y, aw, h, w) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(v, x, y, aw)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(v, x, y, aw)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)
        assert np.abs(np.asarray(a)).sum() > 0


def test_folded_out_of_range_taps_are_zero():
    from partdistillation_tpu.ops.msda_pallas import sample_level_folded

    v, x, y, aw, h, w = _case_folded(seed=5)
    x = x.at[:, :, :5].set(-5.0)
    out = np.asarray(sample_level_folded(v, x, y, aw, h, w))
    np.testing.assert_allclose(out[:, :5], 0.0, atol=1e-6)
