"""Shared helpers for the jitted TPU encoders.

Variable-length event streams meet XLA's static-shape model via padded
buffers: events are packed into (E, 4) float32 arrays with a validity count;
padded rows scatter to an out-of-bounds index and are dropped by the XLA
scatter (`mode="drop"`), so no masking multiplies are needed on the hot path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def events_struct_to_xytp(events: np.ndarray) -> np.ndarray:
    """Decoded structured events → (N, 4) float32 [x, y, t, p] (the column
    order used by every encoder; reference: rfn.structured_to_unstructured
    [:, [1, 2, 0, 3]])."""
    t_field = "ts" if "ts" in events.dtype.names else "t"
    out = np.empty((len(events), 4), dtype=np.float32)
    out[:, 0] = events["x"]
    out[:, 1] = events["y"]
    out[:, 2] = events[t_field]
    out[:, 3] = events["p"]
    return out


def pad_events(xytp: np.ndarray, max_events: int):
    """Pad/truncate to (max_events, 4); returns (padded, n_valid). When
    truncating, the OLDEST events are dropped (the newest matter most)."""
    n = len(xytp)
    if n > max_events:
        xytp = xytp[n - max_events:]
        n = max_events
    out = np.zeros((max_events, 4), dtype=np.float32)
    out[:n] = xytp
    return out, n


def bucket_size(n: int, buckets=(2**12, 2**14, 2**16, 2**18, 2**20, 2**22)) -> int:
    """Smallest power-of-4-ish static size holding n events, to bound the
    number of distinct compiled shapes."""
    for b in buckets:
        if n <= b:
            return b
    return int(2 ** math.ceil(math.log2(max(n, 1))))


def valid_mask(n_valid, max_events: int):
    return jnp.arange(max_events) < n_valid


def flat_index(x, y, p, c, W: int, n_valid=None, max_events: int | None = None,
               stride_c: int = 1):
    """Linearised scatter index; invalid (padded) rows map out of bounds so the
    scatter drops them."""
    idx = ((y * W + x) * stride_c + c) if stride_c > 1 else (y * W + x)
    if n_valid is not None:
        oob = jnp.int32(2**30)
        idx = jnp.where(jnp.arange(max_events) < n_valid, idx, oob)
    return idx


def nearest_resize_chw(volume: jnp.ndarray, target_hw) -> jnp.ndarray:
    """torch-compatible 'nearest' resize over trailing (H, W) dims."""
    h_in, w_in = volume.shape[-2:]
    h_out, w_out = target_hw
    ys = (jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    xs = (jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    return volume[..., ys[:, None], xs[None, :]]


def nearest_resize_hwc(volume: jnp.ndarray, target_hw) -> jnp.ndarray:
    """torch-compatible 'nearest' resize over leading (H, W) dims of HWC."""
    h_in, w_in = volume.shape[0], volume.shape[1]
    h_out, w_out = target_hw
    ys = (jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    xs = (jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    return volume[ys[:, None], xs[None, :], :]


def scatter_add_flat(size: int, idx: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Dense scatter-add into a flat float32 buffer; OOB indices dropped."""
    return jnp.zeros(size, jnp.float32).at[idx].add(vals, mode="drop")


def scatter_max_flat(init: jnp.ndarray, idx: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Dense scatter-max; OOB indices dropped."""
    return init.at[idx].max(vals, mode="drop")
