"""ctypes binding for the native box ops (boxops.cpp).

Compiles the shared object on first use (g++ -O3) and caches it next to the
source; callers fall back to the numpy implementation if the toolchain is
unavailable (ops/pool.get_non_overlapping)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "boxops.cpp")
_SO = os.path.join(_DIR, "libboxops.so")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.check_call(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"],
                stderr=subprocess.DEVNULL,
            )
            os.replace(_SO + ".tmp", _SO)
        lib = ctypes.CDLL(_SO)
        lib.non_overlap_suppress.restype = ctypes.c_int64
        lib.non_overlap_suppress.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def non_overlap_suppress(boxes: np.ndarray, scores: np.ndarray, k: int) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, dtype=np.int64)
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    out = np.empty(k, dtype=np.int64)
    n = lib.non_overlap_suppress(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(boxes),
        k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:n]
