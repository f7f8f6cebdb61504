"""Offline Event Count Image generator (reference: generate_eventcountimage.py).

Count-bounded windows: for each annotation timestamp take the last N events
(N ∈ {5e4, 1e5, 2e5} GEN1 / {4e5, 8e5, 1.2e6} GEN4, reference :84-88), add
0.05 per event, clamp at 1, ×255 → 2-channel uint8 blob.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from generate_common import (
    GEOMETRY,
    EncodeTimer,
    events_to_xytp,
    iter_streams,
    unique_annotation_times,
)
from frlw_evd_tpu.events import PSEELoader  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from frlw_evd_tpu.encode.common import nearest_resize_hwc, pad_events
    from frlw_evd_tpu.encode.count_image import encode_count_image

    parser = argparse.ArgumentParser()
    parser.add_argument("-raw_dir", type=str, required=True)
    parser.add_argument("-label_dir", type=str, required=True)
    parser.add_argument("-target_dir", type=str, required=True)
    parser.add_argument("-dataset", type=str, default="gen1")
    args = parser.parse_args()

    geo = GEOMETRY[args.dataset]
    shape, target_shape = geo["shape"], geo["target_shape"]
    windows = ([400000, 800000, 1200000] if args.dataset == "gen4"
               else [50000, 100000, 200000])
    rh = target_shape[0] / shape[0]
    rw = target_shape[1] / shape[1]
    upscale = target_shape[0] >= shape[0]
    enc_shape = shape if upscale else target_shape
    max_events = max(windows)

    @jax.jit
    def encode(xytp, n_valid):
        vol = encode_count_image(xytp, n_valid, height=enc_shape[0],
                                 width=enc_shape[1])
        if upscale:
            vol = nearest_resize_hwc(vol, target_shape)
        return vol.astype(jnp.uint8)

    timer = EncodeTimer(windows)
    for mode in ["train", "val", "test"]:
        for name, event_path, bbox_path in iter_streams(args.raw_dir,
                                                        args.label_dir, mode):
            unique_ts = unique_annotation_times(bbox_path)
            loader = PSEELoader(event_path)
            count_upper_bound = -100000000
            memory = None
            for unique_time in unique_ts:
                end_time = int(unique_time)
                end_count = loader.seek_time(end_time)
                if end_count is None:
                    break
                start_count = max(0, int(end_count - max(windows)))
                if start_count <= count_upper_bound:
                    start_count = count_upper_bound
                loader.seek_event(start_count)
                events = loader.load_n_events(int(end_count - start_count))
                xytp = events_to_xytp(events)
                if memory is not None:
                    xytp = np.concatenate([memory, xytp])
                memory = xytp[-max(windows):]
                count_upper_bound = end_count

                for n_window in windows:
                    ev = xytp[-n_window:].copy()
                    if not upscale:
                        ev[:, 0] *= rw
                        ev[:, 1] *= rh
                    padded, n = pad_events(ev.astype(np.float32), max_events)
                    tick = time.time()
                    vol = np.asarray(encode(jnp.asarray(padded), n))
                    if mode == "test":
                        timer.add(n_window, time.time() - tick)
                    out_dir = os.path.join(args.target_dir,
                                           f"EventCountImage{n_window}", mode)
                    os.makedirs(out_dir, exist_ok=True)
                    vol.transpose(2, 0, 1).tofile(
                        os.path.join(out_dir, f"{name}_{unique_time}.npy"))
    timer.report()


if __name__ == "__main__":
    main()
