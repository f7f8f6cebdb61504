"""Dataset / loader tests over the synthetic mini-GEN1 fixture."""

import os
import numpy as np
import pytest

from frlw_evd_tpu.data import Loader, PropheseeDataset, PropheseeTafDataset
from frlw_evd_tpu.data.augment import xyxy2cxcywh

from fixtures import INPUT_HW, build_mini_gen1


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_gen1")
    paths = build_mini_gen1(str(root))
    return paths


def test_ev_dataset_index(mini):
    ds = PropheseeDataset(mini["labels"], mini["ev_dir"], "gen1",
                          INPUT_HW, INPUT_HW, time_channels=5, mode="train",
                          augment=False)
    # 2 streams x 3 annotation timestamps
    assert len(ds) == 6


def test_ev_dataset_sample_train(mini):
    ds = PropheseeDataset(mini["labels"], mini["ev_dir"], "gen1",
                          INPUT_HW, INPUT_HW, time_channels=5, mode="train",
                          augment=False)
    img, labels, name, ts = ds[0]
    assert img.shape == (INPUT_HW[0], INPUT_HW[1], 10)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert labels.shape == (80, 5)
    n_boxes = int((labels.sum(1) > 0).sum())
    assert n_boxes == 2
    # [class, cx, cy, w, h] scaled to input size
    valid = labels[labels.sum(1) > 0]
    assert set(valid[:, 0]).issubset({0.0, 1.0})
    assert (valid[:, 3] > 0).all() and (valid[:, 4] > 0).all()


def test_ev_dataset_sample_eval(mini):
    ds = PropheseeDataset(mini["labels"], mini["ev_dir"], "gen1",
                          INPUT_HW, INPUT_HW, time_channels=5, mode="val",
                          augment=False)
    img, labels, name, ts = ds[0]
    assert labels.shape == (80, 8)
    valid = labels[labels.sum(1) > 0]
    # eval rows [cx,cy,w,h,cls,t,track,conf]; t must equal sample ts
    assert (valid[:, 5] == ts).all()
    assert (valid[:, 6] > 0).all()


def test_taf_dataset(mini):
    ds = PropheseeTafDataset(mini["labels"], mini["taf_dir"], "gen1",
                             INPUT_HW, INPUT_HW, event_volume_bins=8,
                             mode="train", augment=False)
    img, labels, name, ts = ds[0]
    assert img.shape == (INPUT_HW[0], INPUT_HW[1], 16)
    assert img.max() <= 1.0
    # newest bins carry recent activity → nonzero
    assert img[..., :8].max() > 0


def test_augmentation_keeps_boxes(mini):
    ds = PropheseeDataset(mini["labels"], mini["ev_dir"], "gen1",
                          INPUT_HW, INPUT_HW, time_channels=5, mode="train",
                          augment=True, seed=3)
    for i in range(len(ds)):
        img, labels, _, _ = ds[i]
        assert (labels.sum(1) > 0).sum() >= 1
        assert img.shape == (INPUT_HW[0], INPUT_HW[1], 10)


def test_loader_batches(mini):
    ds = PropheseeDataset(mini["labels"], mini["ev_dir"], "gen1",
                          INPUT_HW, INPUT_HW, time_channels=5, mode="train",
                          augment=False)
    loader = Loader(ds, batch_size=2, num_workers=2, shuffle=True)
    batches = list(loader)
    assert len(batches) == 3
    imgs, labels, names, tss = batches[0]
    assert imgs.shape == (2, INPUT_HW[0], INPUT_HW[1], 10)
    assert labels.shape == (2, 80, 5)
    assert len(names) == 2


def test_xyxy2cxcywh():
    b = np.array([[10.0, 20, 30, 60]])
    out = xyxy2cxcywh(b)
    np.testing.assert_allclose(out[0], [20, 40, 20, 40])


def test_labels_scaled_with_sensor_override(tmp_path):
    """Labels must be rescaled sensor→input with the CONFIGURED sensor
    geometry; the hard-coded per-dataset default silently shrank every box
    ~4x on the mini fixture (16 px → 16*96/304 ≈ 5 px), which pinned box
    regression at iou=0 in training."""
    from fixtures import INPUT_HW, SENSOR_HW, build_mini_gen1
    from frlw_evd_tpu.data.dataset import PropheseeDataset
    from frlw_evd_tpu.events.npy_codec import load_bboxes

    paths = build_mini_gen1(str(tmp_path), splits=("train",))
    ds = PropheseeDataset(paths["labels"], paths["ev_dir"], "gen1",
                          INPUT_HW, INPUT_HW, 5, 10000, "train",
                          augment=False, sensor_hw=SENSOR_HW)
    img, padded, stream, ts = ds[0]
    rows = padded[padded[:, 3] > 0]       # train rows [cls, cx, cy, w, h]
    raw = load_bboxes(os.path.join(paths["labels"], "train",
                                   f"{stream}_bbox.npy"))
    raw = raw[raw["t"] == ts]
    rh = INPUT_HW[0] / SENSOR_HW[0]
    rw = INPUT_HW[1] / SENSOR_HW[1]
    want_w = np.sort(raw["w"] * rw)
    np.testing.assert_allclose(np.sort(rows[:, 3]), want_w, rtol=1e-5)
    want_cx = np.sort((raw["x"] + raw["w"] / 2) * rw)
    np.testing.assert_allclose(np.sort(rows[:, 1]), want_cx, rtol=1e-5)
