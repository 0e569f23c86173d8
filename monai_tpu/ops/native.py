"""ctypes loader for the native host resampler (csrc/resample_cpu.cpp).

Mirrors the reference's on-demand JIT extension pattern (monai/_extensions/loader.py:48):
the shared library is compiled with g++ on first use and cached; everything degrades
gracefully to the pure-numpy path when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["get_native_lib", "native_affine_resample", "native_available"]

_lib = None
_lib_lock = threading.Lock()
_build_failed = False

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_SO_PATH = _CSRC / "libmonai_tpu_native.so"
_BOUNDS = {"zeros": 0, "border": 1, "reflection": 2}


def _build() -> bool:
    src = _CSRC / "resample_cpu.cpp"
    if not src.exists():
        return False
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", str(src), "-o", str(_SO_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_native_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _SO_PATH.exists() and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
            lib.affine_resample_f32.restype = ctypes.c_int
            lib.affine_resample_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
            return _lib
        except OSError:
            _build_failed = True
            return None


def native_available() -> bool:
    return get_native_lib() is not None


def native_affine_resample(img: np.ndarray, matrix: np.ndarray, out_shape, order: int = 1,
                           bound: str = "zeros", num_threads: int = 0) -> np.ndarray | None:
    """Multithreaded C++ affine resample for float32 host arrays (2D/3D, order 0/1).

    Returns None when the native path doesn't apply (caller falls back to numpy).
    """
    lib = get_native_lib()
    if lib is None or order not in (0, 1) or bound not in _BOUNDS:
        return None
    if not isinstance(img, np.ndarray) or img.dtype != np.float32:
        return None
    D = len(out_shape)
    if D not in (2, 3) or img.ndim != D + 1:
        return None
    m = np.asarray(matrix, dtype=np.float64)
    # embed 2D as 3D with identity leading axis
    if D == 2:
        m4 = np.eye(4)
        m4[1:3, 1:3] = m[:2, :2]
        m4[1:3, 3] = m[:2, 2]
        in_shape3 = (1,) + tuple(img.shape[1:])
        out_shape3 = (1,) + tuple(int(s) for s in out_shape)
        img3 = np.ascontiguousarray(img.reshape((img.shape[0],) + in_shape3))
    else:
        m4 = np.eye(4)
        m4[:3, :3] = m[:3, :3]
        m4[:3, 3] = m[:3, 3]
        in_shape3 = tuple(img.shape[1:])
        out_shape3 = tuple(int(s) for s in out_shape)
        img3 = np.ascontiguousarray(img)
    out = np.empty((img.shape[0],) + out_shape3, dtype=np.float32)
    ret = lib.affine_resample_f32(
        img3.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(m4).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        img.shape[0], in_shape3[0], in_shape3[1], in_shape3[2],
        out_shape3[0], out_shape3[1], out_shape3[2],
        order, _BOUNDS[bound], num_threads)
    if ret != 0:
        return None
    if D == 2:
        return out.reshape((img.shape[0],) + tuple(int(s) for s in out_shape))
    return out
