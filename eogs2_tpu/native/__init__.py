"""Native (C++/OpenMP) host-side kernels with automatic build + fallback.

The reference keeps its host-side hot loops in numba-jitted Python
(eval/dsmr.py) and its rasterizer in CUDA; here the device path is
JAX/Pallas and the host path is C++ compiled on first use (g++ -O3
-fopenmp), loaded through ctypes. Every native entry point has a pure
numpy fallback (eogs2_tpu/eval/registration.py), so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libeogs2_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "dsmr.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        src, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without -march=native / openmp
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_HERE, "dsmr.cpp"))
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.compute_shift.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int, dp]
        lib.apply_shift.argtypes = [dp, ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.c_double, ctypes.c_double,
                                    ctypes.c_double, ctypes.c_double, dp]
        lib.downsample2x.argtypes = [dp, ctypes.c_int64, ctypes.c_int64, dp]
        lib.mean_std.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int, ctypes.c_int, dp]
        _lib = lib
        return _lib


def _as_c(arr):
    a = np.ascontiguousarray(arr, np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def compute_shift(dsm_ref, dsm_sec, scaling=True):
    """Native compute_shift; falls back to the numpy implementation."""
    lib = get_lib()
    if lib is None:
        from eogs2_tpu.eval import registration

        return registration.compute_shift(dsm_ref, dsm_sec, scaling)
    ref, ref_p = _as_c(dsm_ref)
    sec, sec_p = _as_c(dsm_sec)
    out = np.zeros(4, np.float64)
    lib.compute_shift(ref_p, sec_p, ref.shape[0], ref.shape[1],
                      1 if scaling else 0,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return int(out[0]), int(out[1]), float(out[2]), float(out[3])


def apply_shift(in_dsm, dx=0, dy=0, a=1.0, b=0.0, c=0.0, d=0.0):
    lib = get_lib()
    if lib is None:
        from eogs2_tpu.eval import registration

        return registration.apply_shift(in_dsm, dx, dy, a, b, c, d)
    v, v_p = _as_c(in_dsm)
    out = np.zeros_like(v)
    lib.apply_shift(v_p, v.shape[0], v.shape[1], int(dx), int(dy),
                    float(a), float(b), float(c), float(d),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
