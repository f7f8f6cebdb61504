"""SimOTA assignment parity against a torch re-implementation of the
reference algorithm (yolo_head.py:482-707): candidate filtering, cost matrix,
dynamic-k topk, duplicate-anchor argmin resolution.

The torch side below re-derives the reference math step by step (it is the
specification, not shared code); matching its outputs on random data validates
that the vectorised fixed-shape formulation in models/assign.py computes the
same assignment the reference trainer would.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import simota_cost_replica  # noqa: E402

from frlw_evd_tpu.models.assign import simota_assign
from frlw_evd_tpu.models.heads import level_grids


def torch_simota(gt_boxes, gt_classes, pred_boxes, obj_logits, cls_logits,
                 xs, ys, ss, radius, num_classes):
    """Reference-equivalent SimOTA (torch, per-image, data-dependent)."""
    gt = torch.tensor(gt_boxes)
    preds = torch.tensor(pred_boxes)
    obj = torch.tensor(obj_logits)
    cls = torch.tensor(cls_logits)
    xs_t = torch.tensor(xs)
    ys_t = torch.tensor(ys)
    ss_t = torch.tensor(ss)
    G, A = len(gt), len(preds)

    xc = (xs_t + 0.5) * ss_t
    yc = (ys_t + 0.5) * ss_t
    # in-box
    l = xc[None] - (gt[:, 0:1] - gt[:, 2:3] / 2)
    r = (gt[:, 0:1] + gt[:, 2:3] / 2) - xc[None]
    t = yc[None] - (gt[:, 1:2] - gt[:, 3:4] / 2)
    b = (gt[:, 1:2] + gt[:, 3:4] / 2) - yc[None]
    in_box = torch.stack([l, t, r, b], 2).min(2).values > 0
    # in-center
    cl = xc[None] - (gt[:, 0:1] - radius * ss_t[None])
    cr = (gt[:, 0:1] + radius * ss_t[None]) - xc[None]
    ct = yc[None] - (gt[:, 1:2] - radius * ss_t[None])
    cb = (gt[:, 1:2] + radius * ss_t[None]) - yc[None]
    in_center = torch.stack([cl, ct, cr, cb], 2).min(2).values > 0

    fg_mask = in_box.any(0) | in_center.any(0)          # candidate anchors
    is_in_both = in_box[:, fg_mask] & in_center[:, fg_mask]

    cand = preds[fg_mask]
    n_cand = cand.shape[0]

    # pairwise IoU (cxcywh)
    tl = torch.max(gt[:, None, :2] - gt[:, None, 2:] / 2,
                   cand[None, :, :2] - cand[None, :, 2:] / 2)
    br = torch.min(gt[:, None, :2] + gt[:, None, 2:] / 2,
                   cand[None, :, :2] + cand[None, :, 2:] / 2)
    en = (tl < br).all(2).float()
    inter = (br - tl).prod(2) * en
    area_g = gt[:, 2:].prod(1)
    area_p = cand[:, 2:].prod(1)
    ious = inter / (area_g[:, None] + area_p[None, :] - inter + 1e-12)
    iou_cost = -torch.log(ious + 1e-8)

    cls_prob = (cls[fg_mask].sigmoid() * obj[fg_mask, None].sigmoid()).sqrt()
    onehot = torch.nn.functional.one_hot(
        torch.tensor(gt_classes).long(), num_classes).float()
    cls_cost = torch.nn.functional.binary_cross_entropy(
        cls_prob[None].repeat(G, 1, 1), onehot[:, None].repeat(1, n_cand, 1),
        reduction="none").sum(-1)

    cost = cls_cost + 3.0 * iou_cost + 100000.0 * (~is_in_both)

    matching = torch.zeros_like(cost)
    k = min(10, n_cand)
    topk_ious, _ = torch.topk(ious, k, dim=1)
    dynamic_ks = torch.clamp(topk_ious.sum(1).int(), min=1)
    for g in range(G):
        _, pos = torch.topk(cost[g], k=int(dynamic_ks[g]), largest=False)
        matching[g][pos] = 1.0
    multi = matching.sum(0) > 1
    if multi.any():
        cost_argmin = cost[:, multi].argmin(0)
        matching[:, multi] = 0.0
        matching[cost_argmin, multi] = 1.0
    fg_in = matching.sum(0) > 0
    full_fg = fg_mask.clone()
    full_fg[fg_mask.clone()] = fg_in
    matched = matching[:, fg_in].argmax(0)
    pred_iou = (matching * ious).sum(0)[fg_in]
    return (full_fg.numpy(), matched.numpy(), pred_iou.numpy(),
            int(fg_in.sum()))


def _assert_assignments_match(a, t_fg, t_matched, t_iou, inputs, msg=""):
    """fg masks must agree everywhere EXCEPT on exact dynamic-k cost-boundary
    ties (different float op orders between frameworks pick different anchors
    when the k-th and (k+1)-th candidate costs coincide). Every disagreement
    is PROVEN to sit on that boundary via the float64 cost replica — the same
    policy as the slow-tier production-scale test; matched-gt / iou must agree
    exactly on the common positives."""
    import numpy as _np

    j_fg = _np.asarray(a.fg_mask)
    diff = _np.flatnonzero(j_fg != t_fg)
    if len(diff):
        (gt_boxes, gt_classes, pred_boxes, obj, cls,
         xs, ys, ss, radius, num_classes) = inputs
        cost, ks = simota_cost_replica(gt_boxes, gt_classes, pred_boxes,
                                       obj, cls, xs, ys, ss, radius,
                                       num_classes)
        t_matched_b = _np.zeros(len(t_fg), int)
        t_matched_b[t_fg] = t_matched
        j_matched = _np.asarray(a.matched_gt)
        for d in diff:
            g = int(t_matched_b[d]) if t_fg[d] else int(j_matched[d])
            order = _np.sort(cost[g])
            boundary = order[ks[g] - 1]
            rel = abs(cost[g, d] - boundary) / max(1.0, abs(boundary))
            assert rel < 1e-5, (
                f"{msg}: anchor {d} (gt {g}) disagrees OFF the dynamic-k "
                f"boundary: cost {cost[g, d]:.8f} vs k-th {boundary:.8f}")
    common = j_fg & t_fg
    j_matched_full = _np.asarray(a.matched_gt)
    j_iou_full = _np.asarray(a.pred_iou)
    # map torch outputs (indexed over t_fg positions) back to anchor space
    t_matched_full = _np.zeros(len(t_fg), int)
    t_iou_full = _np.zeros(len(t_fg))
    t_matched_full[t_fg] = t_matched
    t_iou_full[t_fg] = t_iou
    _np.testing.assert_array_equal(j_matched_full[common],
                                   t_matched_full[common], err_msg=msg)
    _np.testing.assert_allclose(j_iou_full[common], t_iou_full[common],
                                atol=1e-4, err_msg=msg)


def test_simota_matches_torch_reference(rng):
    num_classes = 2
    radius = 5.0
    xs, ys, ss = level_grids([(8, 10), (4, 5), (2, 3)], [8, 16, 32])
    A = len(xs)
    G = 80
    n_real = 5

    gt_boxes = np.zeros((G, 4), np.float32)
    gt_boxes[:n_real, 0] = rng.uniform(10, 70, n_real)
    gt_boxes[:n_real, 1] = rng.uniform(10, 54, n_real)
    gt_boxes[:n_real, 2] = rng.uniform(8, 30, n_real)
    gt_boxes[:n_real, 3] = rng.uniform(8, 30, n_real)
    gt_classes = rng.integers(0, num_classes, G).astype(np.int32)
    gt_valid = np.arange(G) < n_real

    pred_boxes = np.zeros((A, 4), np.float32)
    pred_boxes[:, 0] = (xs + 0.5) * ss + rng.normal(0, 2, A)
    pred_boxes[:, 1] = (ys + 0.5) * ss + rng.normal(0, 2, A)
    pred_boxes[:, 2] = rng.uniform(4, 40, A)
    pred_boxes[:, 3] = rng.uniform(4, 40, A)
    pred_boxes = pred_boxes.astype(np.float32)
    obj = rng.normal(-2, 1, A).astype(np.float32)
    cls = rng.normal(0, 1, (A, num_classes)).astype(np.float32)

    t_fg, t_matched, t_iou, t_num = torch_simota(
        gt_boxes[:n_real], gt_classes[:n_real], pred_boxes, obj, cls,
        xs, ys, ss, radius, num_classes)

    a = simota_assign(jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
                      jnp.asarray(gt_valid), jnp.asarray(pred_boxes),
                      jnp.asarray(obj), jnp.asarray(cls),
                      jnp.asarray((xs + 0.5) * ss), jnp.asarray((ys + 0.5) * ss),
                      jnp.asarray(ss), radius, num_classes=num_classes)

    _assert_assignments_match(
        a, t_fg, t_matched, t_iou,
        (gt_boxes[:n_real], gt_classes[:n_real], pred_boxes, obj, cls,
         xs, ys, ss, radius, num_classes))


def test_simota_matches_torch_many_seeds():
    num_classes = 3
    radius = 2.5
    xs, ys, ss = level_grids([(6, 8), (3, 4)], [8, 16])
    A = len(xs)
    for seed in range(5):
        rng = np.random.default_rng(seed + 100)
        n_real = int(rng.integers(1, 8))
        G = 80
        gt_boxes = np.zeros((G, 4), np.float32)
        gt_boxes[:n_real, 0] = rng.uniform(5, 58, n_real)
        gt_boxes[:n_real, 1] = rng.uniform(5, 42, n_real)
        gt_boxes[:n_real, 2] = rng.uniform(6, 25, n_real)
        gt_boxes[:n_real, 3] = rng.uniform(6, 25, n_real)
        gt_classes = rng.integers(0, num_classes, G).astype(np.int32)
        gt_valid = np.arange(G) < n_real
        pred_boxes = np.zeros((A, 4), np.float32)
        pred_boxes[:, 0] = (xs + 0.5) * ss + rng.normal(0, 3, A)
        pred_boxes[:, 1] = (ys + 0.5) * ss + rng.normal(0, 3, A)
        pred_boxes[:, 2] = rng.uniform(3, 30, A)
        pred_boxes[:, 3] = rng.uniform(3, 30, A)
        obj = rng.normal(-1, 1.5, A).astype(np.float32)
        cls = rng.normal(0, 1.5, (A, num_classes)).astype(np.float32)

        t_fg, t_matched, t_iou, t_num = torch_simota(
            gt_boxes[:n_real], gt_classes[:n_real],
            pred_boxes.astype(np.float32), obj, cls, xs, ys, ss, radius,
            num_classes)
        a = simota_assign(jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
                          jnp.asarray(gt_valid), jnp.asarray(pred_boxes),
                          jnp.asarray(obj), jnp.asarray(cls),
                          jnp.asarray((xs + 0.5) * ss),
                          jnp.asarray((ys + 0.5) * ss), jnp.asarray(ss),
                          radius, num_classes=num_classes)
        _assert_assignments_match(
            a, t_fg, t_matched, t_iou,
            (gt_boxes[:n_real], gt_classes[:n_real], pred_boxes, obj, cls,
             xs, ys, ss, radius, num_classes),
            msg=f"seed {seed}")
