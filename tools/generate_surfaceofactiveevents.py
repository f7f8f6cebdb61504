"""Offline Surface of Active Events generator
(reference: generate_surfaceofactiveevents.py).

Per annotation timestamp: take the trailing 5 s of events, scatter-max the
last-event timestamp per (pixel, polarity), max-merge with the running stream
memory, decay with λ ∈ {1e-5, 2.5e-6, 1e-6} and write a 2-channel uint8 blob
per λ under `SurfaceOfActiveEvents{λ}/{split}/`.
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

LAMDAS = [0.00001, 0.0000025, 0.000001]
EVENTS_WINDOW = 5_000_000
MAX_EVENTS = 2**22


def main():
    import jax
    import jax.numpy as jnp

    from frlw_evd_tpu.encode.common import nearest_resize_hwc, pad_events
    from frlw_evd_tpu.encode.sae import encode_sae, sae_init_state

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

    @jax.jit
    def encode(xytp, n_valid, memory, now):
        ecd, memory = encode_sae(xytp, n_valid, memory, now,
                                 height=enc_shape[0], width=enc_shape[1],
                                 lamdas=tuple(LAMDAS))
        if upscale:
            ecd = nearest_resize_hwc(ecd, target_shape)
        return ecd.astype(jnp.uint8), memory

    timer = EncodeTimer(LAMDAS)
    for mode in ["train", "val", "test"]:
        for name, event_path, bbox_path in iter_streams(args.raw_dir,
                                                        args.label_dir, mode):
            unique_ts = unique_annotation_times(bbox_path)
            loader = PSEELoader(event_path)
            time_upper_bound = -100000000
            count_upper_bound = 0
            memory = None
            for unique_time in unique_ts:
                end_time = int(unique_time)
                end_count = loader.seek_time(end_time)
                if end_count is None:
                    continue
                start_time = end_time - EVENTS_WINDOW
                start_count = (loader.seek_time(start_time)
                               if start_time >= 0 else 0) or 0
                if start_time <= time_upper_bound:
                    start_count = count_upper_bound
                loader.seek_event(start_count)
                events = loader.load_n_events(int(end_count - start_count))
                xytp = events_to_xytp(events)
                time_upper_bound = unique_time
                count_upper_bound = end_count

                ev = xytp.copy()
                if not upscale:
                    ev[:, 0] *= rw
                    ev[:, 1] *= rh
                if memory is None:
                    memory = sae_init_state(enc_shape[0], enc_shape[1],
                                            now=float(unique_time))
                padded, n = pad_events(ev.astype(np.float32), MAX_EVENTS)
                tick = time.time()
                ecd, memory = encode(jnp.asarray(padded), n, memory,
                                     jnp.float32(unique_time))
                ecd = np.asarray(ecd)  # (H, W, 6), c = 2*lam + p
                if mode == "test":
                    timer.add(LAMDAS[0], time.time() - tick)
                for j, lam in enumerate(LAMDAS):
                    out_dir = os.path.join(args.target_dir,
                                           f"SurfaceOfActiveEvents{lam}", mode)
                    os.makedirs(out_dir, exist_ok=True)
                    blob = ecd[:, :, 2 * j:2 * j + 2].transpose(2, 0, 1)
                    blob.tofile(os.path.join(out_dir,
                                             f"{name}_{unique_time}.npy"))
    timer.report()


if __name__ == "__main__":
    main()
