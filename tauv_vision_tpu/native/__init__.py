"""Native (C++) host-side components, bound via ctypes.

Built on demand with g++ (no pybind11 in this image); every consumer
has a pure-Python fallback, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_SOURCE_DIR = pathlib.Path(__file__).parent
_LIB_PATH = _SOURCE_DIR / "libtauv_native.so"
_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    sources = [str(_SOURCE_DIR / "rle.cc")]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_LIB_PATH), *sources,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _build_failed
    with _LOCK:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        sources_newer = (
            not _LIB_PATH.exists()
            or (_SOURCE_DIR / "rle.cc").stat().st_mtime
            > _LIB_PATH.stat().st_mtime
        )
        if sources_newer and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None

        lib.brush_rle_decode.restype = ctypes.c_int64
        lib.brush_rle_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.brush_rle_encode.restype = ctypes.c_int64
        lib.brush_rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def _as_u8_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def brush_rle_decode(rle, n_elements: int) -> Optional[np.ndarray]:
    """Native RLE decode; returns None if the library is unavailable or
    the stream is malformed (callers fall back to Python)."""
    lib = load()
    if lib is None:
        return None
    rle_arr = np.ascontiguousarray(np.asarray(rle, np.uint8))
    out = np.zeros(n_elements, np.uint8)
    n = lib.brush_rle_decode(
        _as_u8_ptr(rle_arr), rle_arr.size, _as_u8_ptr(out), out.size
    )
    if n != n_elements:
        return None
    return out


def brush_rle_encode(values: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    values = np.ascontiguousarray(np.asarray(values, np.uint8).ravel())
    # Worst case: verbatim encoding + headers, padded generously.
    out = np.zeros(values.size + values.size // 8 + 64, np.uint8)
    n = lib.brush_rle_encode(
        _as_u8_ptr(values), values.size, _as_u8_ptr(out), out.size
    )
    if n < 0:
        return None
    return out[:n]
