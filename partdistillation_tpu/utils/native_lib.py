"""Loader + ctypes bindings for the native C++ components in native/.

Builds on demand with g++ (cached in native/build/). Mirrors the reference's
native-extension layering (ops/setup.py building ops/src) without CUDA or
torch extensions: plain shared objects over a C ABI. Set PDT_NO_NATIVE=1 to
force the pure-numpy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["build_native_so", "rle_lib", "native_available", "encode_counts",
           "decode_counts", "area_counts", "iou_counts_matrix"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def build_native_so(src_name: str, so_name: str,
                    extra_flags: tuple = ()) -> Optional[ctypes.CDLL]:
    """Compile native/<src_name> to native/build/<so_name> (mtime-cached,
    atomic .tmp rename) and dlopen it. Returns None when the source is
    missing, PDT_NO_NATIVE is set, or the toolchain fails — callers fall back
    to their pure-python paths. Shared by every native component."""
    src = os.path.join(_NATIVE_DIR, src_name)
    if not os.path.exists(src) or os.environ.get("PDT_NO_NATIVE"):
        return None
    so = os.path.join(_BUILD_DIR, so_name)
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", *extra_flags, "-shared", "-fPIC", src,
                 "-o", so + ".tmp"],
                check=True, capture_output=True)
            os.replace(so + ".tmp", so)
        return ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError):
        return None


def _build_and_load() -> Optional[ctypes.CDLL]:
    lib = build_native_so("rle_codec.cc", "librle_codec.so")
    if lib is None:
        return None

    lib.pd_rle_encode.restype = ctypes.c_int64
    lib.pd_rle_encode.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_char_p, ctypes.c_int64]
    lib.pd_rle_decode.restype = ctypes.c_int64
    lib.pd_rle_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_void_p]
    lib.pd_rle_area.restype = ctypes.c_int64
    lib.pd_rle_area.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.pd_rle_iou.restype = ctypes.c_double
    lib.pd_rle_iou.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                               ctypes.c_char_p, ctypes.c_int64]
    lib.pd_rle_iou_matrix.restype = None
    lib.pd_rle_iou_matrix.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_void_p]
    return lib


def rle_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        with _LOCK:
            if not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def native_available() -> bool:
    return rle_lib() is not None


# ---- thin array-level wrappers (None lib -> caller falls back) ----


def encode_counts(mask: np.ndarray) -> Optional[bytes]:
    lib = rle_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    cap = 16 + 3 * (h * w // 2 + 2)
    buf = ctypes.create_string_buffer(cap)
    n = lib.pd_rle_encode(mask.ctypes.data, h, w, buf, cap)
    if n < 0:
        return None
    return buf.raw[:n]


def decode_counts(counts: bytes, h: int, w: int) -> Optional[np.ndarray]:
    lib = rle_lib()
    if lib is None:
        return None
    out = np.empty((h, w), dtype=np.uint8)
    rc = lib.pd_rle_decode(counts, len(counts), h, w, out.ctypes.data)
    if rc != 0:
        raise ValueError(f"invalid RLE (rc={rc})")
    return out


def area_counts(counts: bytes) -> Optional[int]:
    lib = rle_lib()
    if lib is None:
        return None
    a = lib.pd_rle_area(counts, len(counts))
    if a < 0:
        raise ValueError("invalid RLE")
    return int(a)


def iou_counts_matrix(dets: list, gts: list) -> Optional[np.ndarray]:
    """dets/gts: lists of counts bytes (same mask size assumed)."""
    lib = rle_lib()
    if lib is None:
        return None
    bufa = b"".join(dets)
    bufb = b"".join(gts)
    offa = np.zeros(len(dets) + 1, np.int64)
    np.cumsum([len(d) for d in dets], out=offa[1:])
    offb = np.zeros(len(gts) + 1, np.int64)
    np.cumsum([len(g) for g in gts], out=offb[1:])
    out = np.zeros((len(dets), len(gts)), np.float64)
    lib.pd_rle_iou_matrix(bufa, offa.ctypes.data, len(dets),
                          bufb, offb.ctypes.data, len(gts), out.ctypes.data)
    return out
