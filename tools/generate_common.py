"""Shared scaffolding for the offline representation generators.

Each generator walks {train,val,test}, and for every unique annotation
timestamp seeks an event window, encodes it on-device with the jitted
encoders, and writes `<stream>_<timestamp>.npy` uint8 blobs in the reference's
layout (SURVEY.md §2.2; reference generate_*.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frlw_evd_tpu.events import PSEELoader
from frlw_evd_tpu.events.npy_codec import load_bboxes

GEOMETRY = {
    "gen1": dict(shape=(240, 304), target_shape=(256, 320)),
    # 4x-reduced GEN1 geometry used by the synthetic test fixtures
    "gen1_mini": dict(shape=(60, 76), target_shape=(64, 96)),
    "gen4": dict(shape=(720, 1280), target_shape=(512, 640)),
}


def iter_streams(raw_dir: str, label_dir: str, mode: str):
    """Yield (stream_name, event_path, bbox_path) for one split."""
    file_dir = os.path.join(raw_dir, mode)
    label_root = os.path.join(label_dir, mode)
    if not os.path.isdir(file_dir):
        return
    files = sorted(f[:-7] for f in os.listdir(file_dir) if f.endswith("dat"))
    for name in files:
        yield (name, os.path.join(file_dir, name + "_td.dat"),
               os.path.join(label_root, name + "_bbox.npy"))


def unique_annotation_times(bbox_path: str) -> np.ndarray:
    boxes = load_bboxes(bbox_path)
    return np.unique(boxes["t"])


def events_to_xytp(events) -> np.ndarray:
    out = np.empty((len(events), 4), dtype=np.float64)
    out[:, 0] = events["x"]
    out[:, 1] = events["y"]
    out[:, 2] = events["ts"] if "ts" in events.dtype.names else events["t"]
    out[:, 3] = events["p"]
    return out


class EncodeTimer:
    """Average encode-time counter, printed on the test split
    (reference generate_eventvolume.py:151-153,172-175)."""

    def __init__(self, labels):
        self.total = {l: 0.0 for l in labels}
        self.count = {l: 0 for l in labels}

    def add(self, label, dt):
        self.total[label] += dt
        self.count[label] += 1

    def report(self):
        print("Average Representation time: ")
        for label in self.total:
            if self.count[label]:
                print(label, self.total[label] / self.count[label])
