"""Build-on-demand loader for the native (C++) host geometry library.

Compiles csrc/geometry_native.cpp with g++ into the package directory on
first use and binds it via ctypes (no pybind11 dependency).  Every consumer
falls back to the pure-numpy implementation when the toolchain or the
compiled library is unavailable, or when ADI_TFT_NO_NATIVE=1.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_library", "native_available", "voxelize_parity_native",
           "flood_fill_outside_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc", "geometry_native.cpp")
_SO = os.path.join(_DIR, "_geometry_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        try:  # retry without -march=native (portability)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=300)
            return True
        except Exception:
            return False


def get_library():
    """ctypes handle to the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("ADI_TFT_NO_NATIVE") == "1":
            return None
        needs_build = (not os.path.exists(_SO)
                       or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.voxelize_parity.restype = ctypes.c_int
        lib.voxelize_parity.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),   # (3,) per-axis cell sizes
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.flood_fill_outside.restype = ctypes.c_int
        lib.flood_fill_outside.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_library() is not None


def voxelize_parity_native(triangles: np.ndarray, origin, dx,
                           dims) -> np.ndarray | None:
    """Native parity voxelization; None if the library is unavailable.
    ``dx``: scalar or per-axis (dx, dy, dz)."""
    lib = get_library()
    if lib is None:
        return None
    tris = np.ascontiguousarray(triangles, np.float64)
    org = np.ascontiguousarray(origin, np.float64)
    d = np.ascontiguousarray(np.broadcast_to(np.asarray(dx, np.float64), (3,)))
    nx, ny, nz = dims
    out = np.zeros(nx * ny * nz, np.uint8)
    rc = lib.voxelize_parity(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(tris)),
        org.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(nx), ctypes.c_int64(ny), ctypes.c_int64(nz),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out.reshape(nx, ny, nz).astype(bool)


def flood_fill_outside_native(solid: np.ndarray) -> np.ndarray | None:
    """Native 6-connected outside-air flood fill; None if unavailable."""
    lib = get_library()
    if lib is None:
        return None
    s = np.ascontiguousarray(np.asarray(solid, bool)).astype(np.uint8)
    nx, ny, nz = s.shape
    out = np.zeros_like(s)
    rc = lib.flood_fill_outside(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(nx), ctypes.c_int64(ny), ctypes.c_int64(nz),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out.astype(bool)
