"""Offline Temporal Active Focus generator (reference: generate_taf.py).

Streaming per-pixel K=8 FIFO of 10 ms-bin activity with resume-across-
timestamps bookkeeping (reference :160-203): when the next annotation's
window overlaps the previous one, the queue state and event cursor carry
forward instead of re-encoding. Blobs are written split into `bins4` (newest
4 bins) and `bins8` (older 4) so K=4 and K=8 models share files.
"""

from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np

from generate_common import (
    GEOMETRY,
    events_to_xytp,
    iter_streams,
    unique_annotation_times,
)
from frlw_evd_tpu.events import PSEELoader  # noqa: E402

MIN_EVENT_COUNT = 50_000_000
BIN_US = 10_000
K = 8
MAX_EVENTS_PER_BIN = 2**17


def main():
    import jax
    import jax.numpy as jnp

    from frlw_evd_tpu.encode.common import nearest_resize_chw
    from frlw_evd_tpu.encode.taf import (
        bucket_events_for_taf,
        encode_taf_window,
        leaky_transform,
        taf_init_state,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("-raw_dir", type=str, required=True)
    parser.add_argument("-label_dir", type=str, required=True)
    parser.add_argument("-target_dir", type=str, required=True)
    parser.add_argument("-dataset", type=str, default="gen1")
    args = parser.parse_args()

    geo = GEOMETRY[args.dataset]
    shape, target_shape = geo["shape"], geo["target_shape"]
    rh = target_shape[0] / shape[0]
    rw = target_shape[1] / shape[1]
    upscale = target_shape[0] >= shape[0]
    enc_shape = shape if upscale else target_shape
    events_window = BIN_US * K

    @jax.jit
    def finish(state):
        """Queue → (2K, H', W') uint8 blob halves (oracle.taf_blob layout)."""
        vol = state.transpose(3, 2, 0, 1).reshape(2 * K, *enc_shape)
        if upscale:
            vol = nearest_resize_chw(vol, target_shape)
        vol = vol.reshape(K, 2, target_shape[0], target_shape[1])
        vol = leaky_transform(vol)[::-1]  # newest bin first
        half = K // 2
        new = vol[:half].reshape(half * 2, *target_shape).astype(jnp.uint8)
        old = vol[half:].reshape((K - half) * 2, *target_shape).astype(jnp.uint8)
        return new, old

    target_dir = os.path.join(args.target_dir, "taf")
    total_time, total_count = 0.0, 0

    for mode in ["train", "val", "test"]:
        target_root = os.path.join(target_dir, mode)
        for b in (f"bins{K // 2}", f"bins{K}"):
            os.makedirs(os.path.join(target_root, b), exist_ok=True)
        for name, event_path, bbox_path in iter_streams(args.raw_dir,
                                                        args.label_dir, mode):
            unique_ts = unique_annotation_times(bbox_path)
            loader = PSEELoader(event_path)
            time_upperbound = -1e16
            count_upperbound = -1
            state = None

            for bbox_count, unique_time in enumerate(unique_ts):
                end_time = int(unique_time)
                end_count = loader.seek_time(end_time)
                if end_count is None:
                    continue
                start_count = max(0, end_count - MIN_EVENT_COUNT)
                loader.seek_event(start_count)
                start_time = int(loader.current_time)
                if (end_time - start_time) < events_window:
                    start_time = end_time - events_window
                else:
                    start_time = end_time - round(
                        (end_time - start_time - events_window) / BIN_US
                    ) * BIN_US - events_window

                if start_time > time_upperbound:
                    start_count = loader.seek_time(start_time)
                    if (start_count is None) or (start_time < 0):
                        start_count = 0
                    state = taf_init_state(*enc_shape, K)
                else:
                    start_count = count_upperbound
                    start_time = time_upperbound
                    end_time = round((end_time - start_time) / BIN_US) * BIN_US \
                        + start_time
                    if end_time > loader.total_time():
                        end_time = loader.total_time()
                    end_count = loader.seek_time(end_time)
                    assert bbox_count > 0

                loader.seek_event(start_count)
                events = loader.load_n_events(int(end_count - start_count))
                xytp = events_to_xytp(events)
                if not upscale:
                    xytp[:, 0] *= rw
                    xytp[:, 1] *= rh

                binned, bin_valid = bucket_events_for_taf(
                    xytp, int(start_time), int(end_time), BIN_US,
                    MAX_EVENTS_PER_BIN)
                tick = time.time()
                state = encode_taf_window(state, jnp.asarray(binned),
                                          jnp.asarray(bin_valid))
                blob_new, blob_old = finish(state)
                blob_new = np.asarray(blob_new)
                blob_old = np.asarray(blob_old)
                if mode == "test":
                    total_time += time.time() - tick
                    total_count += 1

                blob_new.tofile(os.path.join(
                    target_root, f"bins{K // 2}", f"{name}_{unique_time}.npy"))
                blob_old.tofile(os.path.join(
                    target_root, f"bins{K}", f"{name}_{unique_time}.npy"))

                time_upperbound = end_time
                count_upperbound = end_count
    if total_count:
        print("Average Representation time: ", total_time / total_count)


if __name__ == "__main__":
    main()
