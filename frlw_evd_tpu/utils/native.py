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
    # run make unconditionally (no-op when fresh): a stale pre-existing .so
    # missing newer symbols must be rebuilt, not loaded as-is
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        lib.compute_area.argtypes = [dp, i64, dp]
        lib.compute_overlap.argtypes = [dp, i64, dp, i64, dp]
        lib.event_queue_tensor.argtypes = [dp, i64, i64, i64, i64, i64, i64,
                                           fp]
        ip = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        lib.coco_match.argtypes = [dp, ip, dp, ip, i64, dp, i64, dp, i64,
                                   i8p, ip]
    except (OSError, AttributeError):
        # missing symbol (stale .so that somehow survived make) or load
        # failure → engage the numpy fallbacks instead of crashing
        return None
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


def coco_match(dt_boxes, dt_off, gt_boxes, gt_off, iou_thrs, area_rngs):
    """Greedy COCO matching for one category over all images at once.

    dt_boxes (D, 4) xywh pre-sorted per image by descending score and
    truncated to maxDets; dt_off/gt_off (n_img+1) int64 row offsets.
    Returns (codes (A, T, D) int8 [1 tp / 0 fp / 2 ignored],
             npig (A,) int64 non-ignored gt counts).
    Falls back to a pure-python implementation without the native lib.
    """
    dt_boxes = np.ascontiguousarray(dt_boxes, np.float64)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float64)
    dt_off = np.ascontiguousarray(dt_off, np.int64)
    gt_off = np.ascontiguousarray(gt_off, np.int64)
    iou_thrs = np.ascontiguousarray(iou_thrs, np.float64)
    area_rngs = np.ascontiguousarray(area_rngs, np.float64)
    T, A = len(iou_thrs), len(area_rngs)
    D = len(dt_boxes)
    codes = np.zeros((A, T, D), np.int8)
    npig = np.zeros(A, np.int64)
    lib = _load()
    if lib is not None:
        lib.coco_match(dt_boxes, dt_off, gt_boxes, gt_off,
                       len(dt_off) - 1, iou_thrs, T, area_rngs, A,
                       codes, npig)
        return codes, npig
    return _coco_match_py(dt_boxes, dt_off, gt_boxes, gt_off, iou_thrs,
                          area_rngs, codes, npig)


def _coco_match_py(dt_boxes, dt_off, gt_boxes, gt_off, iou_thrs, area_rngs,
                   codes, npig):
    """Numpy fallback with identical tie-break semantics (pycocotools
    evaluateImg: strict '<' skip, later equal IoU wins, break at the first
    ignored gt after a real match)."""
    for img in range(len(dt_off) - 1):
        d0, d1 = dt_off[img], dt_off[img + 1]
        g0, g1 = gt_off[img], gt_off[img + 1]
        dts = dt_boxes[d0:d1]
        gts = gt_boxes[g0:g1]
        D, G = len(dts), len(gts)
        if D == 0 and G == 0:
            continue
        gt_area = gts[:, 2] * gts[:, 3]
        dt_area = dts[:, 2] * dts[:, 3]
        if D and G:
            x1 = np.maximum(dts[:, None, 0], gts[None, :, 0])
            y1 = np.maximum(dts[:, None, 1], gts[None, :, 1])
            x2 = np.minimum(dts[:, None, 0] + dts[:, None, 2],
                            gts[None, :, 0] + gts[None, :, 2])
            y2 = np.minimum(dts[:, None, 1] + dts[:, None, 3],
                            gts[None, :, 1] + gts[None, :, 3])
            inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
            union = dt_area[:, None] + gt_area[None, :] - inter
            iou = np.where((x2 > x1) & (y2 > y1) & (union > 0),
                           inter / np.maximum(union, 1e-300), 0.0)
        else:
            iou = np.zeros((D, G))
        for a, (lo, hi) in enumerate(area_rngs):
            ig = (gt_area < lo) | (gt_area > hi)
            order = np.concatenate([np.flatnonzero(~ig),
                                    np.flatnonzero(ig)]).astype(np.int64)
            n_real = int((~ig).sum())
            npig[a] += n_real
            for t, thr in enumerate(iou_thrs):
                gtm = np.full(G, -1, np.int64)
                for d in range(D):
                    best = min(thr, 1 - 1e-10)
                    m = -1
                    for oi in range(G):
                        if gtm[oi] >= 0:
                            continue
                        if m > -1 and oi >= n_real and m < n_real:
                            break
                        v = iou[d, order[oi]]
                        if v < best:
                            continue
                        best = v
                        m = oi
                    if m == -1:
                        codes[a, t, d0 + d] = 2 if (dt_area[d] < lo or
                                                    dt_area[d] > hi) else 0
                    else:
                        gtm[m] = d
                        codes[a, t, d0 + d] = 2 if m >= n_real else 1
    return codes, npig


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
