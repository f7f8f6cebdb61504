"""Offline Event Volume generator (reference: generate_eventvolume.py).

For every annotation timestamp, load the trailing Δτ of events, normalise t to
[0, 1], splat onto 5 temporal bins on device, quantise to uint8 and write
`EventVolume{Δτ}/{split}/<stream>_<ts>.npy` blobs. Δτ ∈ {250, 500, 1000} ms
(reference :82). GEN1 encodes at sensor resolution then nearest-resizes the
volume; GEN4 scales coordinates before encoding (reference :143-149).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from generate_common import (  # noqa: E402
    GEOMETRY,
    EncodeTimer,
    events_to_xytp,
    iter_streams,
    unique_annotation_times,
)
from frlw_evd_tpu.events import PSEELoader  # noqa: E402

TIME_WINDOWS = [250000, 500000, 1000000]
VOLUME_BINS = 5
MAX_EVENTS = 2**21


def main():
    import jax
    import jax.numpy as jnp

    from frlw_evd_tpu.encode.common import nearest_resize_hwc, pad_events
    from frlw_evd_tpu.encode.event_volume import encode_event_volume

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
    upscale = target_shape[0] >= shape[0]  # gen1 path: encode then resize

    enc_shape = shape if upscale else target_shape

    @jax.jit
    def encode(xytp, n_valid):
        vol = encode_event_volume(xytp, n_valid, height=enc_shape[0],
                                  width=enc_shape[1], volume_bins=VOLUME_BINS)
        if upscale:
            vol = nearest_resize_hwc(vol, target_shape)
        vol = jnp.clip(vol, 0, 255)
        return vol.astype(jnp.uint8)

    timer = EncodeTimer(TIME_WINDOWS)
    for mode in ["train", "val", "test"]:
        for name, event_path, bbox_path in iter_streams(args.raw_dir,
                                                        args.label_dir, mode):
            unique_ts = unique_annotation_times(bbox_path)
            loader = PSEELoader(event_path)
            for unique_time in unique_ts:
                end_time = int(unique_time)
                if loader.seek_time(end_time) is None:
                    break
                start_time = max(0, end_time - max(TIME_WINDOWS))
                loader.seek_time(start_time)
                events = loader.load_delta_t(end_time - start_time)
                xytp = events_to_xytp(events)[-10_000_000:]

                for tw in TIME_WINDOWS:
                    ev = xytp[xytp[:, 2] > end_time - tw].copy()
                    ev[:, 2] = (ev[:, 2] - (end_time - tw)) / tw
                    if not upscale:
                        ev[:, 0] *= rw
                        ev[:, 1] *= rh
                    padded, n = pad_events(ev.astype(np.float32), MAX_EVENTS)
                    tick = time.time()
                    vol = encode(jnp.asarray(padded), n)
                    vol = np.asarray(vol)
                    if mode == "test":
                        timer.add(tw, time.time() - tick)
                    out_dir = os.path.join(args.target_dir,
                                           f"EventVolume{tw}", mode)
                    os.makedirs(out_dir, exist_ok=True)
                    # blob layout is CHW (reference writes the permuted tensor)
                    vol.transpose(2, 0, 1).tofile(
                        os.path.join(out_dir, f"{name}_{unique_time}.npy"))
    timer.report()


if __name__ == "__main__":
    main()
