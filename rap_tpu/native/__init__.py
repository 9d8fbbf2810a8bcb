"""ctypes bindings for the native loader core (rap_tpu/native/loader.cpp).

Auto-builds on first import when a compiler is available; every entry point
has a pure-numpy fallback, so the package works without the native lib
(set RAP_TPU_NATIVE=0 to force fallbacks).
"""

from __future__ import annotations

import ctypes
import logging
import os
from pathlib import Path

import numpy as np

logger = logging.getLogger("rap_tpu.native")

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("RAP_TPU_NATIVE", "1") == "0":
        return None
    lib_path = Path(__file__).parent / "librap_loader.so"
    if not lib_path.exists():
        try:
            from .build import build

            build(verbose=False)
        except Exception as e:
            logger.info("native loader unavailable (%s); using numpy fallbacks", e)
            return None
    try:
        lib = ctypes.CDLL(str(lib_path))
        lib.ply_vertex_count.restype = ctypes.c_long
        lib.ply_vertex_count.argtypes = [ctypes.c_char_p]
        lib.ply_read_xyz.restype = ctypes.c_long
        lib.ply_read_xyz.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)
        ]
        lib.voxel_downsample_xyz.restype = ctypes.c_long
        lib.voxel_downsample_xyz.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fps_xyz.restype = None
        lib.fps_xyz.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_long),
        ]
        _LIB = lib
    except OSError as e:
        logger.info("native loader failed to load (%s)", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_ply_points(path: str | Path) -> np.ndarray | None:
    """Fast (N,3) float32 vertex read; None => caller should fall back."""
    lib = _load()
    if lib is None:
        return None
    n = lib.ply_vertex_count(str(path).encode())
    if n < 0:
        return None
    out = np.empty((n, 3), np.float32)
    got = lib.ply_read_xyz(str(path).encode(), _fptr(out))
    if got != n:
        return None
    return out


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray | None:
    lib = _load()
    if lib is None or len(points) == 0:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(pts)
    m = lib.voxel_downsample_xyz(_fptr(pts), len(pts), float(voxel), _fptr(out))
    if m < 0:
        return None
    return out[:m].copy()


def fps(points: np.ndarray, k: int, start: int = 0) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    idx = np.empty(k, np.int64)
    lib.fps_xyz(
        _fptr(pts), len(pts), int(k), int(start),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return idx
