"""Loss primitives (reference: core/yolox/models/losses.py, yolo_head.py).

All functions are elementwise / fixed-shape and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_iou_cxcywh(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU between (G, 4) and (A, 4) boxes in cxcywh → (G, A).
    Matches core/yolox/utils/boxes.py:79 bboxes_iou(xyxy=False)."""
    a_tl = boxes_a[:, None, :2] - boxes_a[:, None, 2:] / 2
    a_br = boxes_a[:, None, :2] + boxes_a[:, None, 2:] / 2
    b_tl = boxes_b[None, :, :2] - boxes_b[None, :, 2:] / 2
    b_br = boxes_b[None, :, :2] + boxes_b[None, :, 2:] / 2
    tl = jnp.maximum(a_tl, b_tl)
    br = jnp.minimum(a_br, b_br)
    area_a = jnp.prod(boxes_a[:, None, 2:], axis=-1)
    area_b = jnp.prod(boxes_b[None, :, 2:], axis=-1)
    en = jnp.all(tl < br, axis=-1).astype(boxes_a.dtype)
    area_i = jnp.prod(br - tl, axis=-1) * en
    return area_i / (area_a + area_b - area_i + 1e-12)


def iou_elementwise_cxcywh(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU between aligned (N, 4) cxcywh boxes (losses.py:15-33)."""
    tl = jnp.maximum(pred[:, :2] - pred[:, 2:] / 2, target[:, :2] - target[:, 2:] / 2)
    br = jnp.minimum(pred[:, :2] + pred[:, 2:] / 2, target[:, :2] + target[:, 2:] / 2)
    area_p = jnp.prod(pred[:, 2:], axis=1)
    area_g = jnp.prod(target[:, 2:], axis=1)
    en = jnp.all(tl < br, axis=1).astype(pred.dtype)
    area_i = jnp.prod(br - tl, axis=1) * en
    return area_i / (area_p + area_g - area_i + 1e-16)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - iou^2 per row (losses.py:36)."""
    iou = iou_elementwise_cxcywh(pred, target)
    return 1.0 - iou**2


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCEWithLogitsLoss(reduction='none')."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def bce(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """binary_cross_entropy on probabilities, with torch's -100 log clamp."""
    logp = jnp.maximum(jnp.log(probs), -100.0)
    log1mp = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -(targets * logp + (1.0 - targets) * log1mp)
