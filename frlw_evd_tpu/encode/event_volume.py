"""Event Volume encoder — bilinear temporal splat onto 2·bins channels.

TPU-native formulation of generate_eventvolume.py:15-42 / data/sparse_ops.py:4.
Instead of materialising the reference's dense (N, 2·bins) weight matrix, each
event contributes to at most two adjacent temporal bins (the triangular weight
max(0, 1-|k - bins·t|) is nonzero for at most two integers k), so the encoder
issues exactly two scatter-adds of N elements each.

Outputs are HWC float volumes with channel c = 2·bin + (1-p) — the same
channel semantics as the reference's CHW blobs — scaled to /bins·255.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("height", "width", "volume_bins"))
def encode_event_volume(xytp: jnp.ndarray, n_valid, *, height: int, width: int,
                        volume_bins: int = 5) -> jnp.ndarray:
    """Encode one padded event window.

    Args:
      xytp: (E, 4) float32 [x, y, t, p]; t pre-normalised to [0, 1].
      n_valid: number of real events (rows beyond it are dropped).
    Returns:
      (H, W, 2*bins) float32, scaled /bins*255 (not clipped).
    """
    E = xytp.shape[0]
    x = xytp[:, 0].astype(jnp.int32)
    y = xytp[:, 1].astype(jnp.int32)
    t = xytp[:, 2]
    p = xytp[:, 3].astype(jnp.int32)

    t_star = volume_bins * t                      # in [0, bins]
    k0 = jnp.floor(t_star).astype(jnp.int32)      # lower bin (0..bins)
    w1 = t_star - k0                              # weight of bin k0+1
    w0 = 1.0 - w1                                 # weight of bin k0

    pix = y * width + x
    pol = 1 - p                                   # channel parity: p=1 first
    valid = jnp.arange(E) < n_valid
    oob = jnp.int32(2**30)

    def chan_idx(k):
        # bins are 1..volume_bins; anything else drops
        ok = valid & (k >= 1) & (k <= volume_bins)
        c = pix * (2 * volume_bins) + 2 * (k - 1) + pol
        return jnp.where(ok, c, oob)

    size = height * width * 2 * volume_bins
    img = jnp.zeros(size, jnp.float32)
    img = img.at[chan_idx(k0)].add(w0, mode="drop")
    img = img.at[chan_idx(k0 + 1)].add(w1, mode="drop")
    vol = img.reshape(height, width, 2 * volume_bins)
    return vol / volume_bins * 255.0


@partial(jax.jit, static_argnames=("height", "width", "volume_bins"))
def encode_event_volume_batch(xytp: jnp.ndarray, n_valid, *, height: int,
                              width: int, volume_bins: int = 5) -> jnp.ndarray:
    """Batched variant: xytp (B, E, 4), n_valid (B,) → (B, H, W, 2*bins)."""
    fn = partial(encode_event_volume, height=height, width=width,
                 volume_bins=volume_bins)
    return jax.vmap(fn)(xytp, n_valid)
