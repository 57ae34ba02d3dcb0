"""
ctypes bindings for the native host kernels (``beat_host.cpp``).

The shared library is built on demand with g++ (cached beside the
source); if no compiler is available, callers fall back to the numpy
reference implementations in :mod:`beat_tpu.ops`.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("beat_tpu.native")

_SRC = os.path.join(os.path.dirname(__file__), "beat_host.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libbeat_host.so")
_lib = None


def _build() -> str:
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
        logger.info("Building native host library: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def get_lib():
    """Load (building if needed) the host library; raises on failure."""
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.fast_sweep.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
        lib.fast_sweep.restype = None
        lib.voronoi_nearest.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        lib.voronoi_nearest.restype = None
        _lib = lib
    return _lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception as e:  # no compiler / build failure
        logger.warning("Native host library unavailable: %s", e)
        return False


def _as_c(arr, dtype=np.float64):
    arr = np.ascontiguousarray(arr, dtype=dtype)
    return arr, arr.ctypes.data_as(ctypes.POINTER(
        ctypes.c_double if dtype == np.float64 else ctypes.c_int32))


def fast_sweep_host(slowness, patch_size, nuc_dip, nuc_strike, epsilon=0.1):
    """C++ eikonal solver (host).  slowness: (n_dip, n_strike)."""
    lib = get_lib()
    slowness = np.ascontiguousarray(slowness, dtype=np.float64)
    n_dip, n_strike = slowness.shape
    out = np.empty((n_dip, n_strike), dtype=np.float64)
    lib.fast_sweep(
        slowness.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(patch_size),
        ctypes.c_int64(int(nuc_dip)), ctypes.c_int64(int(nuc_strike)),
        ctypes.c_int64(n_dip), ctypes.c_int64(n_strike),
        ctypes.c_double(epsilon),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def voronoi_nearest_host(node_strike, node_dip, patch_strike, patch_dip):
    """C++ nearest-node assignment (host)."""
    lib = get_lib()
    ns = np.ascontiguousarray(node_strike, dtype=np.float64)
    nd = np.ascontiguousarray(node_dip, dtype=np.float64)
    ps = np.ascontiguousarray(patch_strike, dtype=np.float64)
    pd = np.ascontiguousarray(patch_dip, dtype=np.float64)
    out = np.empty(ps.size, dtype=np.int32)
    lib.voronoi_nearest(
        ns.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(ns.size),
        ps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(ps.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
