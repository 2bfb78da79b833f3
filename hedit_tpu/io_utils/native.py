"""ctypes loader for the native data-path kernels (hedit_tpu/native/).

Compiles dataio.cpp with g++ -O3 -fopenmp on first use (cached as a .so next
to the source); every entry point has a pure-Python fallback so the package
works on toolchain-less hosts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "dataio.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "dataio.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _SO if os.path.exists(_SO) else _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.rle_decode.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.crop_resize_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.nw_align.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nw_align.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def rle_decode_native(runs, size: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    runs = np.ascontiguousarray(np.asarray(runs, np.int64))
    n_pairs = len(runs) // 2
    out = np.empty(size * size, np.float32)
    lib.rle_decode(
        runs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_pairs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size,
    )
    return out.reshape(size, size)


def crop_resize_native(img: np.ndarray, out_size: int) -> Optional[np.ndarray]:
    """uint8 [H, W, 3] -> float32 [out, out, 3] in [-1, 1]."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((out_size, out_size, 3), np.float32)
    lib.crop_resize_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_size,
    )
    return out


def nw_align_native(x, y) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(np.asarray(x, np.int64))
    y = np.ascontiguousarray(np.asarray(y, np.int64))
    out = np.empty((len(y) + len(x) + 2, 2), np.int64)
    n = lib.nw_align(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(x),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(y),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:n]
