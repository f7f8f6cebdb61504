"""Optical flow per annotation timestamp (reference: generate_opticalflow.py).

For the test split, builds a pair of event time surfaces 50 ms apart ending at
each annotation, computes dense optical flow between them, and caches
`optical_flow_buffer/<stream>_<ts>.npy` for the motion-level statistics.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from generate_common import GEOMETRY, events_to_xytp, iter_streams, unique_annotation_times
from frlw_evd_tpu.events import PSEELoader  # noqa: E402
from motion_level import compute_flow, generate_timesurface

WINDOW = 500000  # µs of history per surface pair


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-raw_dir", type=str, required=True)
    parser.add_argument("-label_dir", type=str, default=None)
    parser.add_argument("-dataset", type=str, default="gen1")
    parser.add_argument("-out_dir", type=str, default="optical_flow_buffer")
    args = parser.parse_args()
    label_dir = args.label_dir or args.raw_dir

    shape = GEOMETRY[args.dataset]["shape"]
    os.makedirs(args.out_dir, exist_ok=True)

    for name, event_path, bbox_path in iter_streams(args.raw_dir, label_dir,
                                                    "test"):
        unique_ts = unique_annotation_times(bbox_path)
        loader = PSEELoader(event_path)
        for unique_time in unique_ts:
            out_path = os.path.join(args.out_dir,
                                    f"{name}_{int(unique_time)}.npy")
            if os.path.exists(out_path):
                continue
            end_time = int(unique_time)
            start_time = end_time - WINDOW
            loader.seek_time(start_time)
            events = loader.load_delta_t(end_time - start_time)
            xytp = events_to_xytp(events)
            xytp = xytp[(xytp[:, 0] < shape[1]) & (xytp[:, 1] < shape[0])]
            v1, v2 = generate_timesurface(xytp, shape)
            flow = compute_flow(v1.astype(np.uint8), v2.astype(np.uint8))
            np.save(out_path, flow, allow_pickle=True)


if __name__ == "__main__":
    main()
