"""SimOTA dynamic-k label assignment, fully vectorised for fixed shapes.

Reference: core/yolox/models/yolo_head.py:482-707. The reference runs a
per-image Python loop with data-dependent candidate filtering and a per-gt
topk loop; here the whole assignment is a fixed-shape (G, A) computation:

  * the candidate filter (fg_mask) becomes a +BIG_COST penalty column mask,
  * the per-gt dynamic-k topk becomes one `jax.lax.top_k` of width 10 plus a
    rank < k comparison,
  * the duplicate-anchor resolution is the same argmin-over-cost rewrite.

Semantics match the reference whenever every gt has >= its dynamic_k
candidate anchors (the reference would raise on fewer; we degrade gracefully
by excluding BIG_COST picks from the match).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .losses import pairwise_iou_cxcywh

BIG_COST = 1e9
CENTER_PENALTY = 100000.0


class Assignment(NamedTuple):
    fg_mask: jnp.ndarray        # (A,) bool — anchor is a positive
    matched_gt: jnp.ndarray     # (A,) int32 — index of matched gt (garbage off fg)
    matched_cls: jnp.ndarray    # (A,) int32
    pred_iou: jnp.ndarray       # (A,) float — iou with matched gt
    num_fg: jnp.ndarray         # () float
    num_gt: jnp.ndarray         # () float


def get_geometry_constraints(gt_boxes, gt_valid, anchor_xc, anchor_yc,
                             anchor_stride, radius):
    """(G, A) in-box and in-center masks (yolo_head.py:586-669)."""
    gx, gy = gt_boxes[:, 0:1], gt_boxes[:, 1:2]
    gw, gh = gt_boxes[:, 2:3], gt_boxes[:, 3:4]
    xc, yc = anchor_xc[None, :], anchor_yc[None, :]

    b_l = xc - (gx - 0.5 * gw)
    b_r = (gx + 0.5 * gw) - xc
    b_t = yc - (gy - 0.5 * gh)
    b_b = (gy + 0.5 * gh) - yc
    in_box = (jnp.minimum(jnp.minimum(b_l, b_r), jnp.minimum(b_t, b_b)) > 0.0)

    r = radius * anchor_stride[None, :]
    c_l = xc - (gx - r)
    c_r = (gx + r) - xc
    c_t = yc - (gy - r)
    c_b = (gy + r) - yc
    in_center = (jnp.minimum(jnp.minimum(c_l, c_r), jnp.minimum(c_t, c_b)) > 0.0)

    in_box = in_box & gt_valid[:, None]
    in_center = in_center & gt_valid[:, None]
    candidate = jnp.any(in_box, axis=0) | jnp.any(in_center, axis=0)  # (A,)
    return in_box, in_center, candidate


@partial(jax.jit, static_argnames=("num_classes",))
def simota_assign(gt_boxes, gt_classes, gt_valid, pred_boxes, obj_logits,
                  cls_logits, anchor_xc, anchor_yc, anchor_stride, radius,
                  *, num_classes: int) -> Assignment:
    """Assign one image.

    Args:
      gt_boxes: (G, 4) cxcywh (padded rows arbitrary).
      gt_classes: (G,) int32.
      gt_valid: (G,) bool.
      pred_boxes: (A, 4) decoded cxcywh.
      obj_logits: (A,) raw. cls_logits: (A, C) raw.
      anchor_xc/yc: (A,) anchor centers in pixels; anchor_stride: (A,).
      radius: center radius (5 for GEN1, 2.5 for GEN4 — core/exp.py:378-384).
    """
    G = gt_boxes.shape[0]
    A = pred_boxes.shape[0]

    in_box, in_center, candidate = get_geometry_constraints(
        gt_boxes, gt_valid, anchor_xc, anchor_yc, anchor_stride, radius)

    ious = pairwise_iou_cxcywh(gt_boxes, pred_boxes)          # (G, A)
    iou_cost = -jnp.log(ious + 1e-8)

    # classification cost: BCE(sqrt(cls_sig * obj_sig), onehot) summed over C.
    # Against a one-hot target the (G, A, C) BCE tensor decomposes exactly:
    #   Σ_c bce(p_c, 1{c=g}) = Σ_c −log1mp_c  +  (−logp_g + log1mp_g)
    # so only an (A,) row sum and an (A, C) correction table gathered at the
    # gt class are needed — the 3-D tensor (G·A·C, e.g. 11 MB/image at gen4
    # scale before the vmap over the batch) never exists.
    cls_prob = jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None]
    cls_prob = jnp.sqrt(cls_prob)                             # (A, C)
    logp = jnp.maximum(jnp.log(cls_prob), -100.0)
    log1mp = jnp.maximum(jnp.log1p(-cls_prob), -100.0)
    all_neg = (-log1mp).sum(-1)                               # (A,)
    corr = log1mp - logp                                      # (A, C)
    cls_cost = all_neg[None, :] + corr.T[gt_classes]          # (G, A)

    cost = (cls_cost + 3.0 * iou_cost
            + CENTER_PENALTY * (~(in_box & in_center))
            + BIG_COST * (~candidate)[None, :]
            + BIG_COST * (~gt_valid)[:, None])

    # dynamic k per gt: ious outside the candidate set contribute nothing
    masked_ious = jnp.where(candidate[None, :] & gt_valid[:, None], ious, 0.0)
    n_candidate_k = min(10, A)
    topk_ious, _ = jax.lax.top_k(masked_ious, n_candidate_k)
    dynamic_ks = jnp.maximum(topk_ious.sum(1).astype(jnp.int32), 1)  # (G,)

    # per-gt pick of the k lowest-cost anchors
    neg_cost, pick_idx = jax.lax.top_k(-cost, n_candidate_k)  # (G, 10)
    rank = jnp.arange(n_candidate_k)[None, :]
    picked = (rank < dynamic_ks[:, None]) & (-neg_cost < BIG_COST / 2)
    matching = jnp.zeros((G, A), bool)
    matching = matching.at[
        jnp.arange(G)[:, None].repeat(n_candidate_k, 1), pick_idx
    ].max(picked)

    # resolve anchors matched to multiple gts: keep the min-cost gt
    col_matches = matching.sum(0)
    multi = col_matches > 1
    best_gt = jnp.argmin(cost, axis=0)                        # (A,)
    best_onehot = jax.nn.one_hot(best_gt, G, dtype=jnp.float32).T.astype(bool)
    matching = jnp.where(multi[None, :], best_onehot, matching)

    fg_mask = matching.any(0)
    matched_gt = jnp.argmax(matching, axis=0).astype(jnp.int32)
    matched_cls = gt_classes[matched_gt]
    pred_iou = (matching * ious).sum(0)
    num_fg = fg_mask.sum().astype(jnp.float32)
    num_gt = gt_valid.sum().astype(jnp.float32)
    return Assignment(fg_mask, matched_gt, matched_cls, pred_iou, num_fg, num_gt)
