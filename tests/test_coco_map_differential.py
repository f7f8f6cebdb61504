"""Randomized differential tests for the from-scratch COCO evaluator.

An intentionally naive, loop-everything AP implementation (written straight
from the COCOeval spec, sharing no code with coco_map.py) is compared against
COCOMeanAP on randomized multi-image workloads covering: score ties, IoU
ties, ignored-gt area ranges, maxDets truncation, multi-image score
interleaving, empty images and categories. The native C++ matcher and its
numpy fallback are also cross-checked against each other.
"""

from __future__ import annotations

import numpy as np
import pytest

from frlw_evd_tpu.evaluate.coco_map import (AREA_RNGS, IOU_THRS, MAX_DETS,
                                            REC_THRS, COCOMeanAP)
from frlw_evd_tpu.utils import native


# ---------------------------------------------------------------------------
# brute-force reference (naive, from the spec)
# ---------------------------------------------------------------------------

def _iou_one(d, g):
    dx1, dy1, dx2, dy2 = d[0], d[1], d[0] + d[2], d[1] + d[3]
    gx1, gy1, gx2, gy2 = g[0], g[1], g[0] + g[2], g[1] + g[3]
    iw = min(dx2, gx2) - max(dx1, gx1)
    ih = min(dy2, gy2) - max(dy1, gy1)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = d[2] * d[3] + g[2] * g[3] - inter
    return inter / union if union > 0 else 0.0


def _brute_force_stats(gts, dts, num_classes):
    """Six COCO stats, computed with per-element python loops."""
    area_keys = ["all", "small", "medium", "large"]
    precisions = {}   # (area, t, k) -> list of 101 precisions, or None
    for k in range(num_classes):
        for a_key in area_keys:
            lo, hi = AREA_RNGS[a_key]
            for ti, thr in enumerate(IOU_THRS):
                # per-image matching
                records = []     # (score, kind) kind in {"tp","fp","ig"}
                npig = 0
                for gt, dt in zip(gts, dts):
                    g = [row for row in gt if int(row[5]) == k]
                    d = [row for row in dt if int(row[5]) == k]
                    # sort dts by score desc, stable; truncate
                    d = sorted(d, key=lambda r: -r[7])[:MAX_DETS]
                    g_ig = [not (lo <= row[3] * row[4] <= hi) for row in g]
                    # real gts first, stable
                    order = ([i for i in range(len(g)) if not g_ig[i]]
                             + [i for i in range(len(g)) if g_ig[i]])
                    npig += sum(1 for x in g_ig if not x)
                    taken = set()
                    for row in d:
                        best = min(thr, 1 - 1e-10)
                        m = -1
                        for pos, gi in enumerate(order):
                            if pos in taken:
                                continue
                            if m > -1 and not _pos_ig(m, order, g_ig) \
                                    and _pos_ig(pos, order, g_ig):
                                break
                            v = _iou_one(row[1:5], g[gi][1:5])
                            if v < best:
                                continue
                            best = v
                            m = pos
                        if m == -1:
                            area = row[3] * row[4]
                            kind = "ig" if not (lo <= area <= hi) else "fp"
                        else:
                            taken.add(m)
                            kind = "ig" if _pos_ig(m, order, g_ig) else "tp"
                        records.append((row[7], kind))
                if npig == 0:
                    precisions[(a_key, ti, k)] = None
                    continue
                records.sort(key=lambda r: -r[0])   # python sort is stable
                tp = fp = 0
                rc_list, pr_list = [], []
                for score, kind in records:
                    if kind == "tp":
                        tp += 1
                    elif kind == "fp":
                        fp += 1
                    else:
                        continue
                    rc_list.append(tp / npig)
                    pr_list.append(tp / max(tp + fp, np.spacing(1)))
                # envelope
                for i in range(len(pr_list) - 2, -1, -1):
                    pr_list[i] = max(pr_list[i], pr_list[i + 1])
                q = []
                for r_thr in REC_THRS:
                    # first index with recall >= r_thr
                    pi = None
                    for i, r_val in enumerate(rc_list):
                        if r_val >= r_thr:
                            pi = i
                            break
                    q.append(pr_list[pi] if pi is not None else 0.0)
                precisions[(a_key, ti, k)] = q

    def mean_over(sel_areas, sel_ts):
        vals = []
        for a_key in sel_areas:
            for ti in sel_ts:
                for k in range(num_classes):
                    p = precisions[(a_key, ti, k)]
                    if p is not None:
                        vals.extend(p)
        return float(np.mean(vals)) if vals else -1.0

    all_t = range(len(IOU_THRS))
    return (
        mean_over(["all"], all_t),
        mean_over(["all"], [0]),
        mean_over(["all"], [5]),
        mean_over(["small"], all_t),
        mean_over(["medium"], all_t),
        mean_over(["large"], all_t),
    )


def _pos_ig(pos, order, g_ig):
    return g_ig[order[pos]]


# ---------------------------------------------------------------------------
# randomized workloads
# ---------------------------------------------------------------------------

def _random_case(rng, n_img, num_classes, tie_scores=False, big_boxes=False,
                 flood_dets=False):
    gts, dts = [], []
    for _ in range(n_img):
        G = int(rng.integers(0, 8))
        D = int(rng.integers(0, 150 if flood_dets else 25))
        gt = np.zeros((G, 8))
        gt[:, 1] = rng.uniform(0, 250, G)
        gt[:, 2] = rng.uniform(0, 200, G)
        if big_boxes:
            gt[:, 3] = rng.choice([8, 20, 40, 100, 200], G)
            gt[:, 4] = rng.choice([8, 20, 40, 100, 200], G)
        else:
            gt[:, 3] = rng.uniform(5, 60, G)
            gt[:, 4] = rng.uniform(5, 60, G)
        gt[:, 5] = rng.integers(0, num_classes, G)
        dt = np.zeros((D, 8))
        # half the detections perturb a random gt (IoU clusters incl. ties)
        for i in range(D):
            if G and rng.random() < 0.6:
                j = int(rng.integers(0, G))
                dt[i, 1:5] = gt[j, 1:5] + rng.normal(0, 4, 4)
                dt[i, 3:5] = np.abs(dt[i, 3:5]) + 2
            else:
                dt[i, 1] = rng.uniform(0, 250)
                dt[i, 2] = rng.uniform(0, 200)
                dt[i, 3:5] = rng.uniform(5, 60, 2)
            dt[i, 5] = rng.integers(0, num_classes)
        if tie_scores:
            dt[:, 7] = rng.choice([0.3, 0.5, 0.5, 0.7, 0.9], D)
        else:
            dt[:, 7] = rng.uniform(0.05, 1.0, D)
        # duplicate a detection exactly (exact IoU tie at same score)
        if D >= 2 and rng.random() < 0.5:
            dt[0] = dt[1]
        gts.append(gt)
        dts.append(dt)
    return gts, dts


@pytest.mark.parametrize("seed,kwargs", [
    (0, {}),
    (1, {"tie_scores": True}),
    (2, {"big_boxes": True}),
    (3, {"flood_dets": True}),
    (4, {"tie_scores": True, "big_boxes": True}),
    (5, {}),
    (6, {"big_boxes": True, "flood_dets": True}),
])
def test_coco_map_matches_brute_force(seed, kwargs):
    rng = np.random.default_rng(seed)
    num_classes = 2 if seed % 2 == 0 else 3
    n_img = int(rng.integers(3, 12))
    gts, dts = _random_case(rng, n_img, num_classes, **kwargs)

    ev = COCOMeanAP(num_classes)
    for g, d in zip(gts, dts):
        ev.add_image(g, d)
    got = ev.summarize()
    want = _brute_force_stats(gts, dts, num_classes)
    np.testing.assert_allclose(got, want, atol=1e-9,
                               err_msg=f"seed={seed} kwargs={kwargs}")


def test_empty_images_and_categories():
    ev = COCOMeanAP(3)
    # image with gt but no dt, image with dt but no gt, fully empty image
    ev.add_image(np.array([[0, 10, 10, 20, 20, 0, 0, 0]], float),
                 np.zeros((0, 8)))
    ev.add_image(np.zeros((0, 8)),
                 np.array([[0, 10, 10, 20, 20, 0, 0, 0.9]], float))
    ev.add_image(np.zeros((0, 8)), np.zeros((0, 8)))
    got = ev.summarize()
    want = _brute_force_stats(ev.gts, ev.dts, 3)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_native_matches_python_fallback(rng):
    """The C++ coco_match and the numpy fallback agree bit-for-bit."""
    if not native.has_native():
        pytest.skip("native library unavailable")
    n_img = 6
    gts, dts = _random_case(rng, n_img, 1, tie_scores=True)
    gt_all = np.concatenate([g[:, 1:5] for g in gts])
    g_off = np.cumsum([0] + [len(g) for g in gts]).astype(np.int64)
    # sort dts per image by desc score the way coco_map does
    d_rows = []
    for d in dts:
        order = np.argsort(-d[:, 7], kind="mergesort")[:MAX_DETS]
        d_rows.append(d[order])
    dt_all = np.concatenate([d[:, 1:5] for d in d_rows])
    d_off = np.cumsum([0] + [len(d) for d in d_rows]).astype(np.int64)
    rngs = np.array([AREA_RNGS[k] for k in ("all", "small", "medium",
                                            "large")])

    codes_nat, npig_nat = native.coco_match(dt_all, d_off, gt_all, g_off,
                                            IOU_THRS, rngs)
    codes_py = np.zeros_like(codes_nat)
    npig_py = np.zeros_like(npig_nat)
    native._coco_match_py(
        np.ascontiguousarray(dt_all, np.float64), d_off,
        np.ascontiguousarray(gt_all, np.float64), g_off,
        IOU_THRS, rngs, codes_py, npig_py)
    np.testing.assert_array_equal(codes_nat, codes_py)
    np.testing.assert_array_equal(npig_nat, npig_py)


@pytest.mark.slow
def test_large_scale_eval_speed():
    """50k windows must evaluate in well under a minute (VERDICT r1 #4:
    per-epoch validation must not dominate the training loop)."""
    import time

    rng = np.random.default_rng(0)
    ev = COCOMeanAP(2)
    n_img = 50_000
    # vectorized synthetic workload: ~3 gts and ~6 dts per window
    for _ in range(n_img):
        G, D = 3, 6
        gt = np.zeros((G, 8))
        gt[:, 1] = rng.uniform(0, 250, G)
        gt[:, 2] = rng.uniform(0, 200, G)
        gt[:, 3:5] = rng.uniform(10, 60, (G, 2))
        gt[:, 5] = rng.integers(0, 2, G)
        dt = np.zeros((D, 8))
        dt[:D // 2] = gt[:D // 2]
        dt[:D // 2, 1:3] += rng.normal(0, 3, (D // 2, 2))
        dt[D // 2:, 1] = rng.uniform(0, 250, D - D // 2)
        dt[D // 2:, 2] = rng.uniform(0, 200, D - D // 2)
        dt[D // 2:, 3:5] = rng.uniform(10, 60, (D - D // 2, 2))
        dt[D // 2:, 5] = rng.integers(0, 2, D - D // 2)
        dt[:, 7] = rng.uniform(0.3, 1.0, D)
        ev.add_image(gt, dt)
    start = time.time()
    stats = ev.summarize()
    elapsed = time.time() - start
    assert 0.0 <= stats[0] <= 1.0
    assert elapsed < 60, f"50k-window eval took {elapsed:.1f}s"
