"""ctypes bridge to the native (C++/OpenMP) metrics library.

Builds ``native/libivosw_native.so`` on first use if missing (g++), loads it
via ctypes (no pybind11 in this image), and exposes batched J / boundary-F
with the exact semantics of :mod:`ivosw_tpu.ops.metrics` (parity-tested).
Falls back gracefully: callers use :func:`available` or the ``backend=auto``
path in ops.metrics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libivosw_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "metrics.cpp")
    stale = not os.path.exists(_LIB_PATH) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if stale:
        # make's dependency tracking handles the rebuild; calling it only
        # when the .so is missing would silently serve stale binaries after
        # a metrics.cpp edit
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.boundary_f_measure_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.jaccard_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.native_num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _prep(y_true, y_pred):
    gt = np.ascontiguousarray(y_true, dtype=np.int32)
    pr = np.ascontiguousarray(y_pred, dtype=np.int32)
    assert gt.shape == pr.shape and gt.ndim == 3
    return gt, pr


def batched_f_measure_native(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    nb_objects: int,
    bound_th: float = 0.008,
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native metrics library unavailable"
    gt, pr = _prep(y_true, y_pred)
    t, h, w = gt.shape
    out = np.zeros((t, nb_objects), dtype=np.float64)
    lib.boundary_f_measure_batch(
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t,
        h,
        w,
        nb_objects,
        bound_th,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def batched_jaccard_native(
    y_true: np.ndarray, y_pred: np.ndarray, nb_objects: int
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native metrics library unavailable"
    gt, pr = _prep(y_true, y_pred)
    t, h, w = gt.shape
    out = np.zeros((t, nb_objects), dtype=np.float64)
    lib.jaccard_batch(
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t,
        h,
        w,
        nb_objects,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
