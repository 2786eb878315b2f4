"""ctypes bridge to the native C++ loader (native/loader.cpp).

Loads `native/libsaccot_native.so` when present (build with
`native/build.sh`); every function returns None when the library is
unavailable so callers fall back to the NumPy paths in io/loaders.py —
the framework never *requires* the native build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libsaccot_native.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    lib.saccot_load_kitti_bin.restype = ctypes.c_long
    lib.saccot_load_kitti_bin.argtypes = [ctypes.c_char_p, fp, ctypes.c_long]
    lib.saccot_load_ply_xyz.restype = ctypes.c_long
    lib.saccot_load_ply_xyz.argtypes = [ctypes.c_char_p, fp, ctypes.c_long]
    lib.saccot_voxel_downsample.restype = ctypes.c_long
    lib.saccot_voxel_downsample.argtypes = [fp, ctypes.c_long, ctypes.c_float, fp, ctypes.c_long]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _farray(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_kitti_bin(path: str, max_pts: int = 200_000) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    out = np.empty((max_pts, 3), np.float32)
    n = lib.saccot_load_kitti_bin(path.encode(), _farray(out), max_pts)
    if n < 0:
        return None
    return out[:n].copy()


def load_ply_xyz(path: str, max_pts: int = 2_000_000) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    out = np.empty((max_pts, 3), np.float32)
    n = lib.saccot_load_ply_xyz(path.encode(), _farray(out), max_pts)
    if n < 0:
        return None
    return out[:n].copy()


def voxel_downsample(points: np.ndarray, voxel: float, max_out: int = 500_000) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty((max_out, 3), np.float32)
    m = lib.saccot_voxel_downsample(_farray(pts), len(pts), voxel, _farray(out), max_out)
    if m < 0:
        return None
    return out[:m].copy()
