"""Temporal Active Focus encoder — per-pixel K-deep FIFO of bin activity.

TPU-native formulation of the reference TAF queue (generate_taf.py:19-58,
sequential C++ form data/event_representation_tool/src/event_queue_tensor.cpp).
The reference's per-slot Python shift loop becomes one vectorised masked roll
over a (H, W, 2, K) state array; a full window is a `lax.scan` over pre-
bucketed 10 ms micro-bins.

Queue semantics (bit-equivalent with the reference loop, see oracle.taf_bin):
  * pixel received events this bin  → drop oldest slot, age survivors by -1,
    append mean(t_norm) - 1
  * pixel received nothing          → age all K slots by -1
  * NO pixel received anything      → state entirely untouched (reference's
    torch.all(forward) shortcut, generate_taf.py:40-41)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def taf_init_state(height: int, width: int, volume_bins: int) -> jnp.ndarray:
    """Fresh queue filled with -6000 (≈60 s age → ~0 after leaky transform)."""
    return jnp.full((height, width, 2, volume_bins), -6000.0, jnp.float32)


@jax.jit
def taf_bin_step(state: jnp.ndarray, xytp: jnp.ndarray, n_valid) -> jnp.ndarray:
    """One micro-bin queue update.

    Args:
      state: (H, W, 2, K) float32 queue.
      xytp: (E, 4) padded events; t pre-normalised to [0, 1] within the bin.
      n_valid: number of real events.
    """
    H, W = state.shape[0], state.shape[1]
    E = xytp.shape[0]
    x = xytp[:, 0].astype(jnp.int32)
    y = xytp[:, 1].astype(jnp.int32)
    t = xytp[:, 2]
    p = xytp[:, 3].astype(jnp.int32)
    valid = jnp.arange(E) < n_valid
    idx = jnp.where(valid, (y * W + x) * 2 + p, jnp.int32(2**30))

    cnt = jnp.zeros(H * W * 2, jnp.float32).at[idx].add(1.0, mode="drop")
    tsum = jnp.zeros(H * W * 2, jnp.float32).at[idx].add(t - 1.0, mode="drop")
    tmean = (tsum / (cnt + 1e-8)).reshape(H, W, 2)
    has = (cnt > 0).reshape(H, W, 2)

    shifted = jnp.concatenate([state[..., 1:] - 1.0, tmean[..., None]], axis=-1)
    updated = jnp.where(has[..., None], shifted, state - 1.0)
    return jnp.where(jnp.any(has), updated, state)


@partial(jax.jit, static_argnames=())
def encode_taf_window(state: jnp.ndarray, binned_xytp: jnp.ndarray,
                      bin_valid: jnp.ndarray) -> jnp.ndarray:
    """Scan the queue over pre-bucketed micro-bins.

    Args:
      state: (H, W, 2, K) queue carried across windows.
      binned_xytp: (n_bins, E, 4) events per bin, t normalised per bin.
      bin_valid: (n_bins,) int32 valid-event counts.
    Returns: final state (H, W, 2, K).
    """
    def step(s, inp):
        ev, n = inp
        return taf_bin_step(s, ev, n), None

    state, _ = jax.lax.scan(step, state, (binned_xytp, bin_valid))
    return state


def leaky_transform(ecd: jnp.ndarray) -> jnp.ndarray:
    """f(x) = max(0, 1 - log1p(-x)/8.7) * 255 (generate_taf.py:69-76)."""
    out = 1.0 - jnp.log1p(-ecd) / 8.7
    return jnp.maximum(out, 0.0) * 255.0


def taf_state_to_volume(state: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 2, K) queue → (H, W, 2K) network input with the dataset channel
    ordering: newest bin first, channel c = 2*bin_age + p (bin_age 0 = newest),
    leaky-transformed to [0, 255]. Matches what propheseeTafDataset feeds the
    model after loading the bins{K/2}+bins{K} blobs."""
    H, W, _, K = state.shape
    # slot K-1 is newest → reverse slots, then interleave (slot, polarity)
    vol = state[..., ::-1]                       # (H, W, 2, K) newest first
    vol = jnp.swapaxes(vol, 2, 3)                # (H, W, K, 2)
    vol = vol.reshape(H, W, 2 * K)
    return leaky_transform(vol)


def bucket_events_for_taf(xytp, start_time: int, end_time: int, bin_us: int,
                          max_events_per_bin: int):
    """Host-side helper: split raw [x,y,t,p] (t in µs) into per-bin padded
    arrays with per-bin t normalisation, replicating the reference bucketing
    (boundary events to the later bin, generate_taf.py:201-203).

    Returns (binned (n_bins, E, 4) float32, bin_valid (n_bins,) int32).
    """
    import math
    import numpy as np

    bins = math.ceil((end_time - start_time) / bin_us)
    t = xytp[:, 2]
    z = np.zeros(len(xytp), dtype=np.int64)
    for i in range(bins):
        sel = (t >= start_time + i * bin_us) & (t <= start_time + (i + 1) * bin_us)
        z[sel] = i
    out = np.zeros((bins, max_events_per_bin, 4), dtype=np.float32)
    n_valid = np.zeros(bins, dtype=np.int32)
    for i in range(bins):
        ev = xytp[z == i]
        t_min = start_time + i * bin_us
        t_max = start_time + (i + 1) * bin_us
        n = min(len(ev), max_events_per_bin)
        out[i, :n] = ev[len(ev) - n:]
        out[i, :n, 2] = (out[i, :n, 2] - t_min) / (t_max - t_min + 1e-8)
        n_valid[i] = n
    return out, n_valid
