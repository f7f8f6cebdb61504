"""Evaluation pipeline tests: COCO mAP implementation against analytically
known values, timestamp matching, box filtering, evaluator plumbing."""

import numpy as np
import pytest

from frlw_evd_tpu.evaluate import (
    COCOMeanAP,
    Evaluator,
    evaluate_detection,
    filter_boxes_gen1,
)
from frlw_evd_tpu.evaluate.coco_eval import _match_times
from frlw_evd_tpu.evaluate.coco_map import iou_xywh


def row(t, x, y, w, h, cls, track=1, conf=1.0):
    return [t, x, y, w, h, cls, track, conf]


def test_iou_xywh():
    dt = np.array([[0.0, 0, 10, 10]])
    gt = np.array([[0.0, 0, 10, 10], [5, 5, 10, 10], [20, 20, 5, 5]])
    iou = iou_xywh(dt, gt)
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-6)


def test_perfect_detection_map():
    ev = COCOMeanAP(2)
    gt = np.array([row(0, 10, 10, 40, 40, 0), row(0, 100, 100, 50, 50, 1)])
    dt = np.array([row(0, 10, 10, 40, 40, 0, 0, 0.9),
                   row(0, 100, 100, 50, 50, 1, 0, 0.8)])
    ev.add_image(gt, dt)
    stats = ev.summarize()
    assert stats[0] == pytest.approx(1.0)
    assert stats[1] == pytest.approx(1.0)


def test_half_recall_map():
    """1 of 2 GTs detected, no FPs: AP = mean precision over recall grid =
    precision 1 up to recall 0.5 → 51/101."""
    ev = COCOMeanAP(1)
    gt = np.array([row(0, 10, 10, 40, 40, 0), row(0, 100, 100, 40, 40, 0)])
    dt = np.array([row(0, 10, 10, 40, 40, 0, 0, 0.9)])
    ev.add_image(gt, dt)
    stats = ev.summarize()
    assert stats[0] == pytest.approx(51 / 101, abs=1e-6)


def test_iou_threshold_sweep():
    """Detection at IoU ≈ 0.6 counts only for thresholds 0.5, 0.55, 0.6."""
    ev = COCOMeanAP(1)
    gt = np.array([row(0, 0, 0, 100, 100, 0)])
    # shift by 25 in x: inter 75*100, union 125*100 → IoU 0.6
    dt = np.array([row(0, 25, 0, 100, 100, 0, 0, 0.9)])
    ev.add_image(gt, dt)
    stats = ev.summarize()
    assert stats[0] == pytest.approx(0.3, abs=1e-6)
    assert stats[1] == pytest.approx(1.0)  # AP50
    assert stats[2] == pytest.approx(0.0)  # AP75


def test_false_positive_penalty():
    """One perfect TP + one high-score FP: precision at recall 1 is 0.5 when
    the FP scores higher."""
    ev = COCOMeanAP(1)
    gt = np.array([row(0, 10, 10, 40, 40, 0)])
    dt = np.array([row(0, 200, 200, 40, 40, 0, 0, 0.95),
                   row(0, 10, 10, 40, 40, 0, 0, 0.9)])
    ev.add_image(gt, dt)
    stats = ev.summarize()
    assert stats[0] == pytest.approx(0.5, abs=1e-6)


def test_area_ranges():
    """A 20x20 box (area 400 < 32²) scores in 'small' but not large."""
    ev = COCOMeanAP(1)
    gt = np.array([row(0, 10, 10, 20, 20, 0)])
    dt = np.array([row(0, 10, 10, 20, 20, 0, 0, 0.9)])
    ev.add_image(gt, dt)
    stats = ev.summarize()
    assert stats[3] == pytest.approx(1.0)   # AP small
    assert stats[4] == -1.0                  # no medium gts
    assert stats[5] == -1.0                  # no large gts


def test_multi_class_separation():
    """A detection with the wrong class never matches."""
    ev = COCOMeanAP(2)
    gt = np.array([row(0, 10, 10, 40, 40, 0)])
    dt = np.array([row(0, 10, 10, 40, 40, 1, 0, 0.9)])
    ev.add_image(gt, dt)
    stats = ev.summarize()
    assert stats[0] == pytest.approx(0.0)


def test_best_iou_matching():
    """A detection overlapping two gts matches the higher-IoU one."""
    ev = COCOMeanAP(1)
    gt = np.array([row(0, 0, 0, 100, 100, 0), row(0, 10, 0, 100, 100, 0)])
    dt = np.array([row(0, 10, 0, 100, 100, 0, 0, 0.9),   # exact on gt2
                   row(0, 0, 0, 100, 100, 0, 0, 0.8)])   # exact on gt1
    ev.add_image(gt, dt)
    stats = ev.summarize()
    assert stats[0] == pytest.approx(1.0)


def test_match_times_windowing():
    gt = np.array([row(1000, 0, 0, 10, 10, 0), row(2000, 0, 0, 10, 10, 0)])
    dt = np.array([row(900, 0, 0, 10, 10, 0, 0, 0.9),
                   row(1500, 0, 0, 10, 10, 0, 0, 0.9),
                   row(2100, 0, 0, 10, 10, 0, 0, 0.9)])
    gt_w, dt_w = _match_times(np.array([1000, 2000]), gt, dt, 200)
    assert len(gt_w) == 2
    assert len(dt_w[0]) == 1 and dt_w[0][0, 0] == 900
    assert len(dt_w[1]) == 1 and dt_w[1][0, 0] == 2100
    # wider tolerance captures the midpoint detection in both windows
    gt_w, dt_w = _match_times(np.array([1000, 2000]), gt, dt, 600)
    assert len(dt_w[0]) == 2 and len(dt_w[1]) == 2


def test_filter_boxes_gen1():
    boxes = np.array([
        row(400_000, 0, 0, 50, 50, 0),   # too early
        row(600_000, 0, 0, 50, 50, 0),   # keep
        row(600_000, 0, 0, 9, 50, 0),    # side < 10
        row(600_000, 0, 0, 20, 21, 0),   # diag² 841 < 900
    ])
    out = filter_boxes_gen1(boxes)
    assert len(out) == 1
    assert out[0, 3] == 50


def test_evaluate_detection_end_to_end():
    gt = np.array([row(600_000, 50, 50, 40, 40, 0),
                   row(700_000, 60, 60, 40, 40, 1)])
    dt = np.array([row(600_100, 50, 50, 40, 40, 0, 0, 0.9),
                   row(699_900, 60, 60, 40, 40, 1, 0, 0.8)])
    stats = evaluate_detection([gt], [dt], classes=("car", "ped"),
                               height=240, width=304, time_tol=4999)
    assert stats[0] == pytest.approx(1.0)


def test_evaluator_plumbing(tmp_path):
    """Full evaluator path: rescale, track-id filter, dummy box, recorder."""
    from frlw_evd_tpu.evaluate.evaluator import Recorder

    rec = Recorder(str(tmp_path))
    ev = Evaluator(["car", "ped"], 2, 10000, 304, 240, 152, 120, "gen1", rec)
    # eval labels: [cx, cy, w, h, cls, t, track, conf] at input res (half)
    labels = np.zeros((2, 80, 8))
    labels[0, 0] = [40, 40, 30, 30, 0, 600_000, 1, 1.0]
    labels[1, 0] = [50, 50, 25, 25, 1, 700_000, 2, 1.0]
    dets = [np.array([[40, 40, 30, 30, 0, 0.9]]),
            np.array([[0.0, 0, 0, 0, 0, 0]])]
    ev.add_result(dets, [600_000, 700_000], labels, ["s0", "s0"], 0.01, 0.0)
    stats = ev.evaluate()
    # class 0: perfect TP (AP 1, the zero-box FP ranks below it); class 1: no
    # detections (AP 0) → mAP 0.5
    assert stats[0] == pytest.approx(0.5, abs=1e-6)
    assert (tmp_path / "summarise.npz").exists()
