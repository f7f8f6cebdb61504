"""Synthetic GEN1-style mini-dataset fabrication for tests and smoke runs.

Builds, under a root directory:
  events/{train,val,test}/<stream>_td.dat          raw event streams
  labels/{train,val,test}/<stream>_bbox.npy        annotations (BBOX_DTYPE)
  data/EventVolume250000/{split}/<stream>_<ts>.npy encoded EV blobs (oracle)
  data/taf/{split}/bins4,bins8/<stream>_<ts>.npy   encoded TAF blobs (oracle)

Events are drawn from moving-box emitters so detections are learnable and
boxes match actual event density (the virtual_events idea from the reference's
only test, data/event_representation_tool/tests/test.py).
"""

from __future__ import annotations

import os

import numpy as np

from frlw_evd_tpu.encode import oracle
from frlw_evd_tpu.events import BBOX_DTYPE
from frlw_evd_tpu.events.dat_codec import write_dat_file

SENSOR_HW = (60, 76)      # mini GEN1: same 240:304 aspect, 4x smaller
INPUT_HW = (64, 96)       # network input must be divisible by 32


def moving_box_events(rng, t0, t1, box, n_events, sensor_hw=None):
    """Emit events uniformly inside a (possibly moving) box [x, y, w, h]."""
    h, w = sensor_hw if sensor_hw is not None else SENSOR_HW
    ts = np.sort(rng.integers(t0, t1, n_events)).astype(np.int64)
    frac = (ts - t0) / max(t1 - t0, 1)
    bx = box[0] + box[4] * frac   # vx
    by = box[1] + box[5] * frac   # vy
    x = (bx + rng.uniform(0, box[2], n_events)).astype(np.int64)
    y = (by + rng.uniform(0, box[3], n_events)).astype(np.int64)
    x = np.clip(x, 0, w - 1)
    y = np.clip(y, 0, h - 1)
    p = rng.integers(0, 2, n_events)
    return ts, x, y, p


def build_mini_gen1(root, rng=None, streams=("seq0", "seq1"), splits=("train", "val", "test"),
                    ann_times=(600_000, 700_000, 800_000), duration=1_000_000):
    """Create the full directory tree. Returns dict of paths."""
    rng = rng or np.random.default_rng(0)
    h, w = SENSOR_HW
    paths = {
        "events": os.path.join(root, "events"),
        "labels": os.path.join(root, "labels"),
        "ev_dir": os.path.join(root, "data", "EventVolume250000"),
        "taf_dir": os.path.join(root, "data", "taf"),
    }
    for split in splits:
        os.makedirs(os.path.join(paths["events"], split), exist_ok=True)
        os.makedirs(os.path.join(paths["labels"], split), exist_ok=True)
        os.makedirs(os.path.join(paths["ev_dir"], split), exist_ok=True)
        for b in ("bins4", "bins8"):
            os.makedirs(os.path.join(paths["taf_dir"], split, b), exist_ok=True)

    # box specs scale with the sensor so they survive size filters at any
    # geometry (x, y, w, h, vx, vy as fractions of the 60x76 mini sensor)
    sx, sy = w / 76.0, h / 60.0
    for split in splits:
        for stream in streams:
            # two moving boxes + background noise
            boxes_spec = [
                (8 * sx, 10 * sy, 16 * sx, 12 * sy, 10 * sx, 4 * sy),
                (40 * sx, 30 * sy, 14 * sx, 14 * sy, -8 * sx, 6 * sy),
            ]
            all_ts, all_x, all_y, all_p = [], [], [], []
            for spec in boxes_spec:
                ts, x, y, p = moving_box_events(rng, 0, duration, spec, 30_000)
                all_ts.append(ts); all_x.append(x); all_y.append(y); all_p.append(p)
            ts, x, y, p = (np.concatenate(a) for a in (all_ts, all_x, all_y, all_p))
            noise_n = 5000
            nts = rng.integers(0, duration, noise_n)
            ts = np.concatenate([ts, nts])
            x = np.concatenate([x, rng.integers(0, w, noise_n)])
            y = np.concatenate([y, rng.integers(0, h, noise_n)])
            p = np.concatenate([p, rng.integers(0, 2, noise_n)])
            order = np.argsort(ts, kind="stable")
            ts, x, y, p = ts[order], x[order], y[order], p[order]

            ev = np.empty(len(ts), dtype=[("ts", "u4"), ("x", "u2"),
                                          ("y", "u2"), ("p", "u1")])
            ev["ts"], ev["x"], ev["y"], ev["p"] = ts, x, y, p
            write_dat_file(os.path.join(paths["events"], split,
                                        f"{stream}_td.dat"), ev, h, w)

            # annotations at each ann time: box positions at that time
            rows = []
            for t_ann in ann_times:
                frac = t_ann / duration
                for ci, spec in enumerate(boxes_spec):
                    rows.append((t_ann, spec[0] + spec[4] * frac,
                                 spec[1] + spec[5] * frac, spec[2], spec[3],
                                 ci % 2, ci + 1, 1.0))
            boxes = np.zeros(len(rows), dtype=BBOX_DTYPE)
            for i, r in enumerate(rows):
                (boxes["t"][i], boxes["x"][i], boxes["y"][i], boxes["w"][i],
                 boxes["h"][i], boxes["class_id"][i], boxes["track_id"][i],
                 boxes["class_confidence"][i]) = r
            np.save(os.path.join(paths["labels"], split,
                                 f"{stream}_bbox.npy"), boxes)

            # encoded blobs via the oracle
            xytp = np.stack([x, y, ts, p], -1).astype(np.float64)
            for t_ann in ann_times:
                # Event Volume, Δτ=250 ms, bins=5, encoded at sensor res then
                # nearest-resized to INPUT_HW (gen1 branch)
                win = xytp[(xytp[:, 2] > t_ann - 250_000) & (xytp[:, 2] < t_ann)].copy()
                win[:, 2] = (win[:, 2] - (t_ann - 250_000)) / 250_000
                vol = oracle.event_volume(win.astype(np.float32), (h, w), 5)
                vol = oracle.nearest_resize(vol, INPUT_HW)
                oracle.to_uint8(vol).tofile(
                    os.path.join(paths["ev_dir"], split, f"{stream}_{t_ann}.npy"))

            # TAF K=8: full-stream streaming encode with the reference's
            # resume-across-timestamps window logic (generate_taf.py:160-203)
            _write_taf_blobs(xytp, ann_times, (h, w), paths["taf_dir"], split,
                             stream)
    return paths


def _write_taf_blobs(xytp, ann_times, sensor_hw, taf_dir, split, stream,
                     bin_us=10_000, K=8):
    """Oracle TAF encode over the stream, one blob pair per annotation."""
    import math

    events_window = bin_us * K
    h, w = sensor_hw
    state = None
    time_upperbound = -1e16
    t_first = float(xytp[0, 2]) if len(xytp) else 0.0

    for t_ann in ann_times:
        end_time = int(t_ann)
        # count-bound (50M) always covers the whole mini stream → start at the
        # first event's timestamp, bin-aligned back from end_time
        start_time = int(t_first)
        if (end_time - start_time) < events_window:
            start_time = end_time - events_window
        else:
            start_time = end_time - round(
                (end_time - start_time - events_window) / bin_us
            ) * bin_us - events_window

        if start_time > time_upperbound:
            state = oracle.taf_init_state((h, w), K)
        else:
            start_time = int(time_upperbound)
            end_time = round((end_time - start_time) / bin_us) * bin_us \
                + start_time
            last_t = int(xytp[-1, 2]) if len(xytp) else end_time
            if end_time > last_t:
                end_time = last_t

        win = xytp[(xytp[:, 2] >= start_time)
                   & (xytp[:, 2] < end_time)].astype(np.float32)
        volume, state = oracle.taf_window(win, (h, w), start_time, end_time,
                                          bin_us, state)
        b_new, b_old = oracle.taf_blob(volume, K, target_hw=INPUT_HW)
        b_new.tofile(os.path.join(taf_dir, split, f"bins{K // 2}",
                                  f"{stream}_{t_ann}.npy"))
        b_old.tofile(os.path.join(taf_dir, split, f"bins{K}",
                                  f"{stream}_{t_ann}.npy"))
        time_upperbound = end_time


def simota_cost_replica(gt_boxes, gt_classes, pred_boxes, obj, cls, xs, ys,
                         ss, radius, num_classes):
    """Float64 numpy replica of the reference's SimOTA cost
    (yolo_head.py:671-707): cls BCE(sqrt(cls_sig*obj_sig)) + 3*(-log iou)
    + 1e5 * outside-center, +inf off the candidate set. Used only to PROVE
    that fg disagreements sit on the dynamic-k cost boundary."""
    G, A = len(gt_boxes), len(pred_boxes)
    gx, gy, gw, gh = (gt_boxes[:, i:i + 1].astype(np.float64)
                      for i in range(4))
    xc, yc = (xs + 0.5) * ss, (ys + 0.5) * ss
    in_box = (np.minimum(
        np.minimum(xc[None] - (gx - 0.5 * gw), (gx + 0.5 * gw) - xc[None]),
        np.minimum(yc[None] - (gy - 0.5 * gh), (gy + 0.5 * gh) - yc[None]),
    ) > 0)
    r = radius * ss[None, :]
    in_center = (np.minimum(
        np.minimum(xc[None] - (gx - r), (gx + r) - xc[None]),
        np.minimum(yc[None] - (gy - r), (gy + r) - yc[None])) > 0)
    candidate = in_box.any(0) | in_center.any(0)

    pb = pred_boxes.astype(np.float64)
    tl = np.maximum(gt_boxes[:, None, :2] - gt_boxes[:, None, 2:] / 2,
                    pb[None, :, :2] - pb[None, :, 2:] / 2)
    br = np.minimum(gt_boxes[:, None, :2] + gt_boxes[:, None, 2:] / 2,
                    pb[None, :, :2] + pb[None, :, 2:] / 2)
    inter = np.prod(np.maximum(br - tl, 0), -1) * (br > tl).all(-1)
    union = (np.prod(gt_boxes[:, 2:], -1)[:, None]
             + np.prod(pb[:, 2:], -1)[None, :] - inter)
    iou = inter / np.maximum(union, 1e-300)
    iou_cost = -np.log(iou + 1e-8)

    sig = lambda v: 1.0 / (1.0 + np.exp(-v.astype(np.float64)))
    p = np.sqrt(sig(cls) * sig(obj)[:, None])                  # (A, C)
    onehot = np.eye(num_classes)[gt_classes]                   # (G, C)
    eps = 1e-12
    bce = -(onehot[:, None] * np.log(p[None] + eps)
            + (1 - onehot[:, None]) * np.log(1 - p[None] + eps))
    cls_cost = bce.sum(-1)                                     # (G, A)

    cost = cls_cost + 3.0 * iou_cost + 1e5 * (~(in_box & in_center))
    cost = np.where(candidate[None, :], cost, np.inf)
    masked_iou = np.where(candidate[None, :], iou, 0.0)
    ks = np.maximum(np.sort(masked_iou, 1)[:, -10:].sum(1).astype(int), 1)
    return cost, ks
