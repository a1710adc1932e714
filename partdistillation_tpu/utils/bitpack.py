"""Bit-packed boolean-mask wire format (device & host sides).

Boolean masks dominate host<->device traffic in the inference stages: a
(B=8, K=8, 640, 640) mask batch is 26 MB as bool but 3.3 MB bit-packed —
8x less PCIe (and ~8x less dev-tunnel wire, where round-4 measured one
640^2 f32 image upload at ~315 ms). Round 4 shipped this for the `detect`
CLI inline (models/meta_arch/labeling.py:122-131); round 5 factors it here
and applies it to every stage CLI's wire (propose / dcrf / rank /
distill-save), packing INSIDE the jit on device and with numpy's packbits
on host. Layout matches ``np.packbits`` / ``np.unpackbits`` (big-endian
within a byte, last axis padded up to a byte boundary).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["pack_bits", "unpack_bits", "pack_bits_np", "unpack_bits_np",
           "packed_width"]

_WEIGHTS = np.asarray([128, 64, 32, 16, 8, 4, 2, 1], np.uint8)


def packed_width(w: int) -> int:
    return (w + 7) // 8


def pack_bits(x: jnp.ndarray) -> jnp.ndarray:
    """(..., W) bool -> (..., ceil(W/8)) uint8, inside jit (device side)."""
    w = x.shape[-1]
    pad = (-w) % 8
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    x8 = x.reshape(x.shape[:-1] + ((w + pad) // 8, 8)).astype(jnp.uint8)
    return jnp.sum(x8 * jnp.asarray(_WEIGHTS), axis=-1, dtype=jnp.uint8)


def unpack_bits(packed: jnp.ndarray, w: int) -> jnp.ndarray:
    """(..., ceil(W/8)) uint8 -> (..., W) bool, inside jit (device side)."""
    shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))[
        ..., :w].astype(bool)


def pack_bits_np(x: np.ndarray) -> np.ndarray:
    """(..., W) bool -> (..., ceil(W/8)) uint8 (host side)."""
    return np.packbits(np.asarray(x, bool), axis=-1)


def unpack_bits_np(packed: np.ndarray, w: int) -> np.ndarray:
    """(..., ceil(W/8)) uint8 -> (..., W) bool (host side)."""
    return np.unpackbits(np.asarray(packed), axis=-1)[..., :w].astype(bool)
