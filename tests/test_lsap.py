"""On-device LSAP vs scipy.optimize.linear_sum_assignment (exactness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from partdistillation_tpu.losses.lsap import solve_lsap, solve_lsap_batch


@pytest.mark.parametrize("seed", range(20))
@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (5, 9), (8, 20), (20, 200)])
def test_matches_scipy_optimum(shape, seed):
    rng = np.random.RandomState(seed)
    cost = rng.randn(*shape).astype(np.float32) * 10
    col4row = np.asarray(solve_lsap(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    # assignment must be a valid injection
    assert len(set(col4row.tolist())) == shape[0]
    ours = cost[np.arange(shape[0]), col4row].sum()
    ref = cost[rows, cols].sum()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_degenerate_ties():
    cost = np.zeros((4, 6), np.float32)
    col4row = np.asarray(solve_lsap(jnp.asarray(cost)))
    assert len(set(col4row.tolist())) == 4


def test_constant_rows_do_not_distort():
    # padded invalid targets are constant rows; the valid rows' optimum must
    # match solving them alone
    rng = np.random.RandomState(0)
    real = rng.randn(3, 10).astype(np.float32)
    pad = np.full((2, 10), 5.0, np.float32)
    cost = np.concatenate([real, pad])
    col4row = np.asarray(solve_lsap(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(real)
    got = real[np.arange(3), col4row[:3]].sum()
    np.testing.assert_allclose(got, real[rows, cols].sum(), rtol=1e-5)


def test_batched_and_jitted():
    rng = np.random.RandomState(1)
    costs = rng.randn(6, 7, 13).astype(np.float32)
    out = np.asarray(jax.jit(solve_lsap_batch)(jnp.asarray(costs)))
    for b in range(6):
        rows, cols = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(
            costs[b][np.arange(7), out[b]].sum(), costs[b][rows, cols].sum(),
            rtol=1e-5, atol=1e-4,
        )
