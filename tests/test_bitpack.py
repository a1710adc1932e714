"""utils/bitpack: device pack/unpack roundtrips and host(numpy) parity —
the wire format every stage CLI uses for mask transfer (8x fewer bytes)."""

import jax
import jax.numpy as jnp
import numpy as np

from partdistillation_tpu.utils.bitpack import (
    pack_bits,
    pack_bits_np,
    packed_width,
    unpack_bits,
    unpack_bits_np,
)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape) < 0.4


def test_device_roundtrip_ragged_width():
    for w in (8, 13, 64, 100):
        m = _rand((3, 5, w))
        packed = jax.jit(pack_bits)(jnp.asarray(m))
        assert packed.shape == (3, 5, packed_width(w))
        assert packed.dtype == jnp.uint8
        out = jax.jit(lambda p: unpack_bits(p, w))(packed)
        np.testing.assert_array_equal(np.asarray(out), m)


def test_device_host_parity_both_directions():
    m = _rand((2, 4, 37), seed=3)
    dev = np.asarray(jax.jit(pack_bits)(jnp.asarray(m)))
    host = pack_bits_np(m)
    np.testing.assert_array_equal(dev, host)  # identical wire bytes
    # device unpack of host-packed == original (the upload direction)
    up = np.asarray(jax.jit(lambda p: unpack_bits(p, 37))(jnp.asarray(host)))
    np.testing.assert_array_equal(up, m)
    # host unpack of device-packed == original (the download direction)
    np.testing.assert_array_equal(unpack_bits_np(dev, 37), m)
