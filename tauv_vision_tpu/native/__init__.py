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


_SOURCES = ["rle.cc", "image_io.cc"]


def _build() -> bool:
    sources = [str(_SOURCE_DIR / s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_LIB_PATH), *sources, "-lpng",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        # Retry without the PNG codec (libpng headers absent).
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", str(_LIB_PATH), str(_SOURCE_DIR / "rle.cc"),
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
        sources_newer = not _LIB_PATH.exists() or any(
            (_SOURCE_DIR / s).stat().st_mtime > _LIB_PATH.stat().st_mtime
            for s in _SOURCES
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
        if hasattr(lib, "tauv_png_decode"):
            lib.tauv_png_probe.restype = ctypes.c_int32
            lib.tauv_png_probe.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.tauv_png_decode.restype = ctypes.c_int32
            lib.tauv_png_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            lib.tauv_png_encode.restype = ctypes.c_int64
            lib.tauv_png_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
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


def png_decode(data: bytes, channels: int = 3) -> Optional[np.ndarray]:
    """Native PNG decode to [H, W, channels] (or [H, W] for channels=1)
    uint8; None if the native codec is unavailable or decode fails
    (callers fall back to PIL).  Releases the GIL during decode, so a
    Python thread pool parallelizes across cores."""
    lib = load()
    if lib is None or not hasattr(lib, "tauv_png_decode"):
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.tauv_png_probe(_as_u8_ptr(buf), buf.size, ctypes.byref(w),
                          ctypes.byref(h)):
        return None
    out = np.empty(h.value * w.value * channels, np.uint8)
    if lib.tauv_png_decode(_as_u8_ptr(buf), buf.size, channels,
                           _as_u8_ptr(out), out.size):
        return None
    if channels == 1:
        return out.reshape(h.value, w.value)
    return out.reshape(h.value, w.value, channels)


def png_encode(img: np.ndarray) -> Optional[bytes]:
    """Native PNG encode of an 8-bit [H, W] / [H, W, C] image; None on
    unavailability (callers fall back to PIL)."""
    lib = load()
    if lib is None or not hasattr(lib, "tauv_png_encode"):
        return None
    img = np.ascontiguousarray(np.asarray(img, np.uint8))
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    else:
        h, w, c = img.shape
    out = np.empty(img.size + img.size // 2 + 1024, np.uint8)
    n = lib.tauv_png_encode(_as_u8_ptr(img.reshape(-1)), h, w, c,
                            _as_u8_ptr(out), out.size)
    if n < 0:
        return None
    return out[:n].tobytes()
