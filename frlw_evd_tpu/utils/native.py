"""ctypes bindings for the native C++ kernels (native/kernels.cpp).

Auto-builds the shared library on first use when a toolchain is present;
every entry point has a pure-numpy fallback so the framework works without
the native library (e.g. restricted build environments).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfrlw_kernels.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.compute_area.argtypes = [dp, i64, dp]
    lib.compute_overlap.argtypes = [dp, i64, dp, i64, dp]
    lib.event_queue_tensor.argtypes = [dp, i64, i64, i64, i64, i64, i64, fp]
    _lib = lib
    return _lib


def has_native() -> bool:
    return _load() is not None


def compute_area(boxes: np.ndarray) -> np.ndarray:
    boxes = np.ascontiguousarray(boxes, np.float64)
    lib = _load()
    if lib is None:
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    out = np.zeros(len(boxes), np.float64)
    lib.compute_area(boxes, len(boxes), out)
    return out


def compute_overlap(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """(N, 4) x (K, 4) xyxy → (N, K) IoU (compute_overlap.pyx:25 semantics)."""
    boxes = np.ascontiguousarray(boxes, np.float64)
    query = np.ascontiguousarray(query, np.float64)
    lib = _load()
    if lib is None:
        tl = np.maximum(boxes[:, None, :2], query[None, :, :2])
        br = np.minimum(boxes[:, None, 2:], query[None, :, 2:])
        inter = np.prod(np.maximum(br - tl, 0.0), -1)
        pos = np.all(br - tl > 0, -1)
        area_b = np.prod(boxes[:, 2:] - boxes[:, :2], -1)
        area_q = np.prod(query[:, 2:] - query[:, :2], -1)
        ua = area_b[:, None] + area_q[None, :] - inter
        return np.where(pos, inter / np.maximum(ua, 1e-300), 0.0)
    out = np.zeros((len(boxes), len(query)), np.float64)
    lib.compute_overlap(boxes, len(boxes), query, len(query), out)
    return out


def event_queue_tensor(events: np.ndarray, batch: int, height: int,
                       width: int, K: int, n_bins: int,
                       init_value: float = -6000.0) -> np.ndarray:
    """Sequential TAF queue oracle: events (n, 6) [b, x, y, t, p, z] sorted by
    z → (batch, H, W, 2, K) float32 queue tensor."""
    events = np.ascontiguousarray(events, np.float64)
    out = np.full((batch, height, width, 2, K), init_value, np.float32)
    lib = _load()
    if lib is None:
        from ..encode import oracle

        for b in range(batch):
            ev_b = events[events[:, 0] == b]
            state = out[b].copy()
            for i in range(n_bins):
                ev = ev_b[ev_b[:, 5] == i][:, [1, 2, 3, 4]]
                state = oracle.taf_bin(ev.astype(np.float32),
                                       (height, width), state)
            out[b] = state
        return out
    lib.event_queue_tensor(events, len(events), batch, height, width, K,
                           n_bins, out)
    return out
