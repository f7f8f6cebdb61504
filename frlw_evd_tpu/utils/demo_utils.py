"""Host-side demo post-processing (reference: core/yolox/utils/demo_utils.py
and boxes.py) — numpy NMS variants and box format converters for deployment
paths that run without the jitted pipeline."""

from __future__ import annotations

import numpy as np


def nms(boxes: np.ndarray, scores: np.ndarray, nms_thr: float) -> list:
    """Single-class NMS on (N, 4) xyxy boxes."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[np.where(ovr <= nms_thr)[0] + 1]
    return keep


def multiclass_nms(boxes, scores, nms_thr, score_thr, class_agnostic=False):
    """(N, 4) boxes x (N, C) scores → (n, 6) [x1, y1, x2, y2, score, cls]
    (demo_utils.py:47)."""
    if class_agnostic:
        cls_inds = scores.argmax(1)
        cls_scores = scores[np.arange(len(cls_inds)), cls_inds]
        valid = cls_scores > score_thr
        if valid.sum() == 0:
            return None
        vb, vs, vc = boxes[valid], cls_scores[valid], cls_inds[valid]
        keep = nms(vb, vs, nms_thr)
        if not keep:
            return None
        return np.concatenate(
            [vb[keep], vs[keep, None], vc[keep, None]], 1)
    final = []
    for cls_ind in range(scores.shape[1]):
        cls_scores = scores[:, cls_ind]
        valid = cls_scores > score_thr
        if valid.sum() == 0:
            continue
        vb, vs = boxes[valid], cls_scores[valid]
        keep = nms(vb, vs, nms_thr)
        if keep:
            cls_col = np.full((len(keep), 1), cls_ind, dtype=np.float32)
            final.append(np.concatenate(
                [vb[keep], vs[keep, None], cls_col], 1))
    if not final:
        return None
    return np.concatenate(final, 0)


def xyxy2xywh(bboxes: np.ndarray) -> np.ndarray:
    out = bboxes.copy()
    out[:, 2] = bboxes[:, 2] - bboxes[:, 0]
    out[:, 3] = bboxes[:, 3] - bboxes[:, 1]
    return out


def xyxy2cxcywh(bboxes: np.ndarray) -> np.ndarray:
    out = bboxes.copy()
    out[:, 2] = bboxes[:, 2] - bboxes[:, 0]
    out[:, 3] = bboxes[:, 3] - bboxes[:, 1]
    out[:, 0] = bboxes[:, 0] + out[:, 2] * 0.5
    out[:, 1] = bboxes[:, 1] + out[:, 3] * 0.5
    return out


def cxcywh2xyxy(bboxes: np.ndarray) -> np.ndarray:
    out = bboxes.copy()
    out[:, 0] = bboxes[:, 0] - bboxes[:, 2] * 0.5
    out[:, 1] = bboxes[:, 1] - bboxes[:, 3] * 0.5
    out[:, 2] = bboxes[:, 0] + bboxes[:, 2] * 0.5
    out[:, 3] = bboxes[:, 1] + bboxes[:, 3] * 0.5
    return out
