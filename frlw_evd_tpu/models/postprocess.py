"""Inference post-processing: confidence filter + NMS in fixed shapes.

Reference behavior (yolo_head.py:258-303): per image, keep detections with
obj_conf > 0.3, class-agnostic NMS at IoU 0.6 on obj scores, then emit rows
[cx, cy, w, h, argmax_cls, obj*max_cls]. The reference's data-dependent
filtering becomes a top-K selection + validity mask so the whole path jits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def cxcywh_to_xyxy(boxes):
    half = boxes[..., 2:4] / 2
    return jnp.concatenate([boxes[..., :2] - half, boxes[..., :2] + half], -1)


def iou_matrix_xyxy(boxes):
    """(K, 4) xyxy → (K, K) IoU (torchvision.ops.nms semantics)."""
    tl = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    br = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    inter = jnp.prod(jnp.maximum(br - tl, 0.0), axis=-1)
    area = jnp.prod(jnp.maximum(boxes[:, 2:] - boxes[:, :2], 0.0), axis=-1)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def nms_mask(boxes_xyxy, scores, valid, iou_threshold: float):
    """Greedy class-agnostic NMS over K pre-sorted-by-score boxes.

    Boxes MUST be sorted by descending score. Returns (K,) keep mask,
    identical to torchvision.ops.nms.

    Instead of a K-step sequential scan, iterate the suppression relation
    keep[i] = valid[i] & ~any_{j<i}(keep[j] & iou[j,i] > t) to its unique
    fixpoint (the greedy solution). Each iteration settles at least one more
    decision point of every suppression chain, so it converges in at most
    max-chain-depth steps (typically 2-4 on detection output, vs K=100
    sequential scan steps); exactness is pinned against the reference scan
    in tests/test_models.py::test_nms_fixpoint_matches_sequential."""
    K = boxes_xyxy.shape[0]
    ious = iou_matrix_xyxy(boxes_xyxy)
    earlier = jnp.arange(K)[:, None] < jnp.arange(K)[None, :]
    sup_edge = earlier & (ious > iou_threshold)          # j suppresses i

    def cond(carry):
        keep, prev, it = carry
        return (it < K) & jnp.any(keep != prev)

    def body(carry):
        keep, _, it = carry
        new = valid & ~jnp.any(sup_edge & keep[:, None], axis=0)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, body,
                                    (valid, ~valid, jnp.int32(0)))
    return keep


def nms_mask_sequential(boxes_xyxy, scores, valid, iou_threshold: float):
    """Reference formulation: K-step sequential scan (kept as the oracle for
    the fixpoint variant; identical result to torchvision.ops.nms)."""
    K = boxes_xyxy.shape[0]
    ious = iou_matrix_xyxy(boxes_xyxy)

    def body(keep, i):
        # suppressed if any kept higher-scoring box overlaps > threshold
        sup = jnp.any(keep & (jnp.arange(K) < i) & (ious[i] > iou_threshold))
        keep = keep.at[i].set(valid[i] & ~sup)
        return keep, None

    keep0 = jnp.zeros(K, bool)
    keep, _ = jax.lax.scan(body, keep0, jnp.arange(K))
    return keep


@partial(jax.jit, static_argnames=("max_detections", "nms_impl"))
def postprocess_image(decoded, *, conf_threshold: float = 0.3,
                      nms_threshold: float = 0.6, max_detections: int = 200,
                      nms_impl: str = "fixpoint"):
    """One image: decoded (A, 4+1+C) with sigmoided obj/cls (eval path).

    nms_impl: 'fixpoint' (while_loop over the suppression relation, 2-4
    iterations typical) or 'sequential' (scan over the K candidates) — same
    exact greedy-NMS result, different TPU schedule; kept switchable for
    on-chip A/B (VERDICT r3 next #2).

    Returns (dets (max_detections, 6) rows [cx,cy,w,h,cls,score], valid mask).
    """
    boxes = decoded[:, :4]
    obj = decoded[:, 4]
    cls_probs = decoded[:, 5:]
    max_detections = min(max_detections, decoded.shape[0])

    conf_ok = obj > conf_threshold
    sel_scores = jnp.where(conf_ok, obj, -1.0)
    top_scores, top_idx = jax.lax.top_k(sel_scores, max_detections)
    valid = top_scores > conf_threshold

    top_boxes = boxes[top_idx]
    top_cls = cls_probs[top_idx]
    nms = nms_mask if nms_impl == "fixpoint" else nms_mask_sequential
    keep = nms(cxcywh_to_xyxy(top_boxes), top_scores, valid, nms_threshold)

    cls_id = jnp.argmax(top_cls, axis=-1).astype(jnp.float32)
    score = top_scores * jnp.max(top_cls, axis=-1)
    dets = jnp.concatenate(
        [top_boxes, cls_id[:, None], score[:, None]], axis=-1)
    return dets, keep


@partial(jax.jit, static_argnames=("max_detections", "nms_impl"))
def postprocess_batch(decoded, *, conf_threshold: float = 0.3,
                      nms_threshold: float = 0.6, max_detections: int = 200,
                      nms_impl: str = "fixpoint"):
    def fn(d):
        # plain closure, not functools.partial: vmap flattens a partial's
        # bound kwargs and cannot abstract the nms_impl string
        return postprocess_image(d, conf_threshold=conf_threshold,
                                 nms_threshold=nms_threshold,
                                 max_detections=max_detections,
                                 nms_impl=nms_impl)

    return jax.vmap(fn)(decoded)


def finalize_detections(dets, keep):
    """Host-side: strip padding; mirrors the reference's dummy row when no
    detection survives (yolo_head.py:277-278 emits a zero row)."""
    import numpy as np

    dets = np.asarray(dets)
    keep = np.asarray(keep)
    out = []
    for d, k in zip(dets, keep):
        rows = d[k]
        if len(rows) == 0:
            rows = np.zeros((1, 6), dtype=np.float32)
        out.append(rows)
    return out
