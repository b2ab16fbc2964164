"""Native (C++) runtime components, built on demand and bound via ctypes.

``load_images(paths, H, W, white_bkgd)`` — multithreaded PNG/JPEG decode +
white-background alpha composite + bilinear resize into one float32 array.
Falls back to None when no C++ toolchain is available (callers then use the
Python path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libnerf_tpu_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "loader.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", _LIB_PATH, "-lpng", "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = os.path.join(_HERE, "loader.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.ntpu_load_images.restype = ctypes.c_int
        lib.ntpu_load_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.ntpu_image_dims.restype = ctypes.c_int
        lib.ntpu_image_dims.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def image_dims(path: str):
    lib = get_lib()
    if lib is None:
        return None
    dims = (ctypes.c_int * 2)()
    if lib.ntpu_image_dims(path.encode(), dims) != 0:
        return None
    return int(dims[0]), int(dims[1])


def load_images(
    paths: List[str], H: int = 0, W: int = 0,
    white_bkgd: bool = True, n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Decode ``paths`` -> [N, H, W, 3] float32 in [0,1]; None if the native
    library is unavailable or any image fails to decode."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    if H == 0 or W == 0:
        dims = image_dims(paths[0])
        if dims is None:
            return None
        H, W = dims
    out = np.empty((len(paths), H, W, 3), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.ntpu_load_images(
        arr, len(paths), H, W, int(white_bkgd),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if rc != 0:
        return None
    return out
