"""Self-contained COCO bbox mean-AP implementation (numpy).

pycocotools is not available in this environment, so this module implements
the standard COCO detection evaluation protocol from scratch, producing the
same six summary stats the reference prints (coco_eval.py:107-113):
  stats[0] AP@[.5:.95] | stats[1] AP50 | stats[2] AP75
  stats[3] AP small    | stats[4] AP medium | stats[5] AP large

Protocol (matching COCOeval 'bbox' with default params):
  * IoU thresholds 0.50:0.05:0.95, recall grid 0:0.01:1 (101 points)
  * area ranges all/[0,32²]/[32²,96²]/[96²,1e10], maxDets 100
  * greedy per-image per-category matching in descending score order; each
    detection takes the highest-IoU unmatched gt above threshold; gts outside
    the area range are "ignored" (match allowed, excluded from counts);
    unmatched detections outside the area range are ignored
  * precision envelope (monotone non-increasing) sampled at the recall grid,
    averaged over categories and IoU thresholds

Inputs are plain per-image box lists; no COCO-JSON detour is needed.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = 100


def iou_xywh(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """(D, 4) x (G, 4) [x, y, w, h] → (D, G) IoU."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    d_x1, d_y1 = dt[:, 0:1], dt[:, 1:2]
    d_x2, d_y2 = dt[:, 0:1] + dt[:, 2:3], dt[:, 1:2] + dt[:, 3:4]
    g_x1, g_y1 = gt[None, :, 0], gt[None, :, 1]
    g_x2, g_y2 = gt[None, :, 0] + gt[None, :, 2], gt[None, :, 1] + gt[None, :, 3]
    iw = np.maximum(np.minimum(d_x2, g_x2) - np.maximum(d_x1, g_x1), 0.0)
    ih = np.maximum(np.minimum(d_y2, g_y2) - np.maximum(d_y1, g_y1), 0.0)
    inter = iw * ih
    area_d = (dt[:, 2] * dt[:, 3])[:, None]
    area_g = (gt[:, 2] * gt[:, 3])[None, :]
    union = area_d + area_g - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _evaluate_img(gt_boxes, gt_areas, dt_boxes, dt_scores, dt_areas, area_rng):
    """Match one (image, category): returns per-threshold match/ignore arrays.

    gt/dt boxes are xywh. Returns dict or None when the pair is empty.
    """
    G, D = len(gt_boxes), len(dt_boxes)
    if G == 0 and D == 0:
        return None
    a0, a1 = area_rng
    gt_ig = (gt_areas < a0) | (gt_areas > a1)
    # gts sorted: non-ignored first (stable)
    g_order = np.argsort(gt_ig, kind="stable")
    gt_boxes = gt_boxes[g_order]
    gt_ig = gt_ig[g_order]
    # dts sorted by score desc, truncated to maxDets
    d_order = np.argsort(-dt_scores, kind="stable")[:MAX_DETS]
    dt_boxes = dt_boxes[d_order]
    dt_scores = dt_scores[d_order]
    dt_areas = dt_areas[d_order]
    D = len(dt_boxes)

    ious = iou_xywh(dt_boxes, gt_boxes)
    T = len(IOU_THRS)
    dtm = np.zeros((T, D), dtype=np.int64)     # 1-based gt index, 0 = none
    gtm = np.zeros((T, G), dtype=np.int64)
    dt_ig = np.zeros((T, D), dtype=bool)

    for ti, thr in enumerate(IOU_THRS):
        for di in range(D):
            best_iou = min(thr, 1 - 1e-10)
            m = -1
            for gi in range(G):
                if gtm[ti, gi] > 0:
                    continue
                # past a matched non-ignored gt, ignored gts follow: stop
                if m > -1 and not gt_ig[m] and gt_ig[gi]:
                    break
                if ious[di, gi] < best_iou:
                    continue
                best_iou = ious[di, gi]
                m = gi
            if m == -1:
                continue
            dtm[ti, di] = m + 1
            gtm[ti, m] = di + 1
            dt_ig[ti, di] = gt_ig[m]

    out_of_rng = (dt_areas < a0) | (dt_areas > a1)
    dt_ig = dt_ig | ((dtm == 0) & out_of_rng[None, :])
    return {
        "dt_scores": dt_scores,
        "dtm": dtm,
        "dt_ig": dt_ig,
        "num_gt": int((~gt_ig).sum()),
    }


class COCOMeanAP:
    """Accumulates per-image GT/DT (in the Prophesee 8-column format) and
    computes the six COCO summary stats."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.gts = []   # list of (N, 8) arrays, one per image
        self.dts = []

    def add_image(self, gt_boxes: np.ndarray, dt_boxes: np.ndarray):
        self.gts.append(np.asarray(gt_boxes, dtype=np.float64))
        self.dts.append(np.asarray(dt_boxes, dtype=np.float64))

    def _per_class(self, cat: int, area_key: str):
        """Matching results for one category over all images."""
        area_rng = AREA_RNGS[area_key]
        results = []
        for gt, dt in zip(self.gts, self.dts):
            g = gt[gt[:, 5] == cat] if len(gt) else gt
            d = dt[dt[:, 5] == cat] if len(dt) else dt
            r = _evaluate_img(
                g[:, 1:5] if len(g) else np.zeros((0, 4)),
                (g[:, 3] * g[:, 4]) if len(g) else np.zeros(0),
                d[:, 1:5] if len(d) else np.zeros((0, 4)),
                d[:, 7] if len(d) else np.zeros(0),
                (d[:, 3] * d[:, 4]) if len(d) else np.zeros(0),
                area_rng,
            )
            if r is not None:
                results.append(r)
        return results

    def _accumulate(self, area_key: str):
        """precision (T, R, K) for one area range at maxDets=100."""
        T, R, K = len(IOU_THRS), len(REC_THRS), self.num_classes
        precision = -np.ones((T, R, K))
        recall = -np.ones((T, K))
        for k in range(K):
            results = self._per_class(k, area_key)
            if not results:
                continue
            npig = sum(r["num_gt"] for r in results)
            if npig == 0:
                continue
            scores = np.concatenate([r["dt_scores"] for r in results])
            order = np.argsort(-scores, kind="mergesort")
            dtm = np.concatenate([r["dtm"] for r in results], axis=1)[:, order]
            dt_ig = np.concatenate([r["dt_ig"] for r in results], axis=1)[:, order]
            tps = (dtm > 0) & ~dt_ig
            fps = (dtm == 0) & ~dt_ig
            tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
            for t in range(T):
                tp, fp = tp_sum[t], fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / np.maximum(tp + fp, np.spacing(1))
                recall[t, k] = rc[-1] if nd else 0.0
                # precision envelope
                pr = pr.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds = np.searchsorted(rc, REC_THRS, side="left")
                q = np.zeros(R)
                for ri, pi in enumerate(inds):
                    if pi < nd:
                        q[ri] = pr[pi]
                precision[t, :, k] = q
        return precision, recall

    def summarize(self):
        """Returns the 6-stat tuple (mAP, AP50, AP75, APs, APm, APl)."""
        p_all, _ = self._accumulate("all")

        def mean_valid(p):
            valid = p[p > -1]
            return float(valid.mean()) if valid.size else -1.0

        stats = [
            mean_valid(p_all),
            mean_valid(p_all[np.isclose(IOU_THRS, 0.5)]),
            mean_valid(p_all[np.isclose(IOU_THRS, 0.75)]),
        ]
        for key in ("small", "medium", "large"):
            p, _ = self._accumulate(key)
            stats.append(mean_valid(p))
        return tuple(stats)
