"""Native (C++/XLA-FFI) op bindings.

Mirrors the reference's native-extension layer (ops/src dispatcher + pybind
binding, SURVEY.md §2.1) with the TPU-era toolchain: C++ kernels compiled to
shared objects and registered as XLA custom calls via jax.ffi. The TPU
production path remains the XLA/Pallas composition in ms_deform_attn.py;
this CPU kernel is the independent implementation used to cross-check
numerics (the ops/test.py pattern) and to serve host-side inference.
"""

from __future__ import annotations

import threading
from typing import Sequence, Tuple

import numpy as np

from ..utils.native_lib import build_native_so

__all__ = ["ms_deform_attn_cpu", "ms_deform_attn_native_available"]

_LOCK = threading.Lock()
_STATE = {"tried": False, "ok": False}


def _build_and_register() -> bool:
    try:
        import jax

        lib = build_native_so(
            "ms_deform_attn_cpu.cc", "libms_deform_attn_cpu.so",
            extra_flags=("-fopenmp", f"-I{jax.ffi.include_dir()}"))
        if lib is None:
            return False
        jax.ffi.register_ffi_target(
            "pd_ms_deform_attn_fwd",
            jax.ffi.pycapsule(lib.PdMsDeformAttnFwd),
            platform="cpu")
        return True
    except Exception:
        return False


def ms_deform_attn_native_available() -> bool:
    if not _STATE["tried"]:
        with _LOCK:
            if not _STATE["tried"]:
                _STATE["ok"] = _build_and_register()
                _STATE["tried"] = True
    return _STATE["ok"]


def ms_deform_attn_cpu(
    value,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations,
    attention_weights,
):
    """C++ custom-call forward; same contract as ops.ms_deform_attn.

    Only valid on the CPU backend (raises otherwise).
    """
    import jax
    import jax.numpy as jnp

    if not ms_deform_attn_native_available():
        raise RuntimeError("native ms_deform_attn not built")
    b, s, m, d = value.shape
    _, lq = sampling_locations.shape[:2]
    shapes = jnp.asarray(np.asarray(spatial_shapes, np.int32))
    call = jax.ffi.ffi_call(
        "pd_ms_deform_attn_fwd",
        jax.ShapeDtypeStruct((b, lq, m * d), jnp.float32),
    )
    return call(value.astype(jnp.float32), shapes,
                sampling_locations.astype(jnp.float32),
                attention_weights.astype(jnp.float32))
