"""ctypes bindings for the native C++ decode+resize library.

The C++ side (native/decode.cpp) decodes JPEG/PNG and bilinear-resizes with
a pthread pool — the native replacement for the reference's DataLoader
worker processes (SURVEY.md §2.9). Falls back transparently to PIL when the
library can't be built (see `data.loader`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfrt_decode.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    """Build (once, lazily) and dlopen the decode library."""
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = os.path.join(_NATIVE_DIR, "decode.cpp")
        stale = os.path.exists(src) and (
            not os.path.exists(_LIB_PATH)
            or os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if not os.path.exists(_LIB_PATH) or stale:
            if not os.path.exists(src):
                _build_failed = True
                return None
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "libfrt_decode.so"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, OSError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.frt_decode_one.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.frt_decode_one.restype = ctypes.c_int
        lib.frt_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.frt_decode_batch.restype = ctypes.c_int
        lib.frt_decode_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.frt_decode_mem.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _ensure_built() is not None


def decode_mem(data: bytes) -> Optional[np.ndarray]:
    """Decode a JPEG/PNG byte buffer at native resolution (serving path).

    Returns an (H, W, 3) uint8 RGB array, or None when the payload isn't a
    decodable JPEG/PNG (the caller falls back to PIL for other formats).
    """
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError("native decode library unavailable")
    src = np.frombuffer(data, np.uint8)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    # JPEG rarely expands past ~24x its compressed size; retry exactly if so.
    cap = max(len(data) * 24, 1 << 22)
    for _ in range(2):
        dst = np.empty((cap,), np.uint8)
        rc = lib.frt_decode_mem(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(data),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
            ctypes.byref(w),
            ctypes.byref(h),
        )
        if rc == 1:
            n = w.value * h.value * 3
            return dst[:n].reshape(h.value, w.value, 3)
        if rc == -1:
            cap = w.value * h.value * 3
            continue
        return None
    return None


def decode_batch(
    paths: Sequence[str], size: int, n_threads: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Decode+resize a batch of image files natively.

    Returns (images (N, size, size, 3) uint8, ok (N,) bool). Rows with
    ok=False are zero-filled (caller filters).
    """
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError("native decode library unavailable")
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fspath(p).encode() for p in paths])
    lib.frt_decode_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size,
        n_threads,
    )
    return out, ok.astype(bool)
