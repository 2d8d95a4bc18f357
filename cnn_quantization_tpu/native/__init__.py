"""Native (C++) host components, loaded via ctypes with on-demand build.

Components:
  * kld_threshold / kld_threshold_batch — entropy-calibration sweep
    (kld_threshold.cpp), ~100x the numpy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libcnnq_native.so')
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _DIR, '-s'], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.kld_threshold.restype = ctypes.c_double
        lib.kld_threshold.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int]
        lib.kld_threshold_batch.restype = None
        lib.kld_threshold_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def kld_threshold_native(arr: np.ndarray, num_bins: int = 2001,
                         num_quantized_bins: int = 15) -> float | None:
    """C++ KLD threshold; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr, np.float32).ravel()
    return float(lib.kld_threshold(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.size,
        num_bins, num_quantized_bins))


def kld_threshold_batch_native(arr2d: np.ndarray, num_bins: int = 2001,
                               num_quantized_bins: int = 15):
    """Per-row thresholds for a [batch, elems] array; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr2d, np.float32)
    out = np.zeros(a.shape[0], np.float64)
    lib.kld_threshold_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        a.shape[0], a.shape[1], num_bins, num_quantized_bins,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
