"""Native host-side data kernels (C++ via ctypes).

Builds lazily with g++ on first use; all callers fall back to the pure
Python implementations in sparenet_tpu.data when the toolchain or the
build is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pcloud.cc")
_LIB = os.path.join(_HERE, "libpcloud.so")
_lock = threading.Lock()
_lib = None
_failed = False


def build(force: bool = False) -> bool:
    """Compile the native library. Returns True on success."""
    if os.path.exists(_LIB) and not force:
        return True
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    """ctypes handle to the native library, or None."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not build():
            _failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        lib.pcd_read.restype = ctypes.c_int64
        lib.pcd_read.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.pcd_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.pcd_read_sampled.restype = ctypes.c_int
        lib.pcd_read_sampled.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_uint64]
        lib.sample_points.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_uint64]
        _lib = lib
        return _lib


def read_pcd_native(path: str) -> np.ndarray | None:
    """[N, 3] float32, or None if the native path is unavailable/fails."""
    lib = get_lib()
    if lib is None:
        return None
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = lib.pcd_read(path.encode(), ctypes.byref(ptr))
    if n < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(int(n), 3)).copy()
    finally:
        lib.pcd_free(ptr)
    return arr


def read_pcd_sampled_native(path: str, n_out: int, seed: int) -> np.ndarray | None:
    """Fused decode+RandomSamplePoints -> [n_out, 3] float32 or None."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((n_out, 3), np.float32)
    rc = lib.pcd_read_sampled(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_out, seed & 0xFFFFFFFFFFFFFFFF)
    if rc != 0:
        return None
    return out
