"""Native C++ ms_deform_attn custom call vs the XLA composition.

The TPU-era version of the reference's ops/test.py (CUDA kernel vs PyTorch
composition, fp32/fp64 forward equivalence): two independent implementations
of the same op must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partdistillation_tpu.ops.ms_deform_attn import ms_deform_attn
from partdistillation_tpu.ops.native import (
    ms_deform_attn_cpu,
    ms_deform_attn_native_available,
)

pytestmark = pytest.mark.skipif(
    not (ms_deform_attn_native_available()
         and jax.default_backend() == "cpu"),
    reason="native msda needs CPU backend + g++")


def _inputs(rng, b=2, m=4, d=8, q=16, p=3, shapes=((8, 12), (4, 6))):
    s = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(b, s, m, d).astype(np.float32))
    loc = jnp.asarray(rng.rand(b, q, m, len(shapes), p, 2).astype(np.float32))
    w = jax.nn.softmax(jnp.asarray(
        rng.randn(b, q, m, len(shapes), p).astype(np.float32)
    ).reshape(b, q, m, -1)).reshape(b, q, m, len(shapes), p)
    return value, list(shapes), loc, w


def test_forward_equal_with_composition():
    rng = np.random.RandomState(0)
    value, shapes, loc, w = _inputs(rng)
    ref = ms_deform_attn(value, shapes, loc, w)
    nat = ms_deform_attn_cpu(value, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(nat), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_out_of_range_taps_are_zero_padded():
    rng = np.random.RandomState(1)
    value, shapes, loc, w = _inputs(rng, q=8, p=2)
    # push all sampling points far outside every level
    loc = loc * 0.0 + 3.5
    nat = ms_deform_attn_cpu(value, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(nat), 0.0, atol=1e-6)
    ref = ms_deform_attn(value, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(ref), 0.0, atol=1e-6)


@pytest.mark.parametrize("channels", [4, 16, 64])
def test_channel_sizes(channels):
    """ops/test.py swept channels 30-3096; sweep representative sizes."""
    rng = np.random.RandomState(channels)
    value, shapes, loc, w = _inputs(rng, d=channels, q=8, p=2)
    ref = ms_deform_attn(value, shapes, loc, w)
    nat = ms_deform_attn_cpu(value, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(nat), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_inside_jit():
    rng = np.random.RandomState(2)
    value, shapes, loc, w = _inputs(rng, q=4, p=2)

    @jax.jit
    def f(v, l, wt):
        return ms_deform_attn_cpu(v, shapes, l, wt)

    nat = f(value, loc, w)
    ref = ms_deform_attn(value, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(nat), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
