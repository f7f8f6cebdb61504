"""Batched streaming encoders with state carry (reference: data/sparse_ops.py).

These are the `to_volume` functors for the online encode→detect path: every
window they consume one padded event slice per stream and update a carried
state, entirely on device. Variants:

  * event_volume_stream — incremental Event Volume: keep the past (bins, 2)
    per-pixel volume, shift one bin per infer_time step, splat the new slice
    into the last two bins (sparse_ops.py:4-35)
  * event_frame_stream — binary occupancy frame (sparse_ops.py:88-107)
  * taf_stream — one 10 ms queue update per window (generate_taf_cuda +
    the offline queue semantics; state (B, H, W, 2, K))
  * sae_stream — decayed last-timestamp surface with memory carry

The hot scatter uses `scatter_add_mxu` (encode/mxu_scatter.py), the
matmul-reformulated scatter that rides the MXU instead of XLA's serialised
scatter loop (~5x faster at GEN1 scale); set ``use_mxu=False`` for the exact
XLA-scatter path (bit-parity with the oracle).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .mxu_scatter import (scatter_add_mxu, scatter_cnt_tsum_mxu,
                          scatter_cnt_tsum_sorted, segment_last_sorted)


# ---------------------------------------------------------------------------
# Event Volume (incremental)
# ---------------------------------------------------------------------------

class EVState(NamedTuple):
    volume: jnp.ndarray  # (B, H, W, bins, 2) accumulated splats


def ev_init_state(batch, height, width, bins=5):
    return EVState(jnp.zeros((batch, height, width, bins, 2), jnp.float32))


@partial(jax.jit, static_argnames=("height", "width", "bins", "events_window",
                                   "infer_time", "use_mxu"))
def event_volume_stream(xytp, n_valid, state: Optional[EVState], now, *,
                        height: int, width: int, bins: int = 5,
                        events_window: int = 50000, infer_time: int = 10000,
                        use_mxu: bool = True):
    """One incremental step (sparse_ops.generate_agile_event_volume_cuda).

    xytp: (B, E, 4) raw [x, y, t(µs), p]; now = end of this window (µs).
    First call (state None): full-window splat over all `bins`.
    Later calls: shift one bin out, add the new slice's two-bin splat.
    Returns ((B, H, W, 2*bins) /bins*255 volume, state).
    """
    B, E, _ = xytp.shape
    first = state is None
    if first:
        state = ev_init_state(B, height, width, bins)

    x = xytp[..., 0].astype(jnp.int32)
    y = xytp[..., 1].astype(jnp.int32)
    t = xytp[..., 2]
    p = xytp[..., 3].astype(jnp.int32)
    if first:
        t_star = bins * (t - (now - events_window)) / events_window
        channels = bins
    else:
        # position within the trailing 2-bin adder: the reference computes
        # t_star = (t - iter + infer_time) / events_window * bins with iter =
        # window END (sparse_ops.py:15, fetcher.py:43-53), i.e. t_star in
        # [0, bins*infer/window]; channel 0 merges into the last kept bin and
        # channel 1 becomes the new bin.
        channels = 2
        t_star = (t - (now - infer_time)) / events_window * bins

    k0 = jnp.floor(t_star).astype(jnp.int32)
    w1 = t_star - k0
    w0 = 1.0 - w1
    valid = jnp.arange(E)[None, :] < n_valid[:, None]

    P = height * width * channels * 2

    def idx_for(k):
        ok = valid & (k >= 0) & (k < channels)
        c = ((y * width + x) * channels + k) * 2 + (1 - p)
        return jnp.where(ok, c, jnp.int32(2**30))

    def one(b_idx0, b_idx1, b_w0, b_w1):
        if use_mxu:
            img = scatter_add_mxu(
                jnp.concatenate([b_idx0, b_idx1]),
                jnp.concatenate([b_w0, b_w1]), P)
        else:
            img = jnp.zeros(P, jnp.float32)
            img = img.at[b_idx0].add(b_w0, mode="drop")
            img = img.at[b_idx1].add(b_w1, mode="drop")
        return img.reshape(height, width, channels, 2)

    new = jax.vmap(one)(idx_for(k0), idx_for(k0 + 1),
                        w0 * valid, w1 * valid)

    if first:
        vol = new
    else:
        old = state.volume[..., 1:, :]          # drop the oldest bin
        old = old.at[..., -1, :].add(new[..., 0, :])
        vol = jnp.concatenate([old, new[..., 1:, :]], axis=-2)

    out = vol.reshape(B, height, width, bins * 2) / bins * 255.0
    return out, EVState(vol)


# ---------------------------------------------------------------------------
# Event frame
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("height", "width"))
def event_frame_stream(xytp, n_valid, state, *, height: int, width: int):
    """Binary occupancy (sparse_ops.generate_event_frame_cuda): any event at a
    pixel → 255 in both channels. Stateless."""
    B, E, _ = xytp.shape
    x = xytp[..., 0].astype(jnp.int32)
    y = xytp[..., 1].astype(jnp.int32)
    valid = jnp.arange(E)[None, :] < n_valid[:, None]
    idx = jnp.where(valid, y * width + x, jnp.int32(2**30))

    def one(i):
        # occupancy histogram on the MXU one-hot path — `.at[].add` lowers
        # to XLA's serialised per-update scatter loop on TPU
        img = scatter_add_mxu(i, jnp.ones_like(i, jnp.float32),
                              height * width)
        return jnp.where(img > 0, 255.0, 0.0).reshape(height, width)

    img = jax.vmap(one)(idx)
    return jnp.stack([img, img], axis=-1), None


# ---------------------------------------------------------------------------
# TAF
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("use_mxu", "precise", "use_sorted"))
def taf_stream_step(state, xytp, n_valid, any_events=None, *,
                    use_mxu: bool = True, precise: bool = True,
                    use_sorted: bool = False):
    """Batched single-bin TAF queue update; state (B, H, W, 2, K); t must be
    pre-normalised to [0, 1] within the bin. MXU scatter by default;
    use_sorted=True selects the sort-bucketed O(E·Δ) histogram — the fast
    path for large grids (1MEGAPIXEL), see mxu_scatter.scatter_cnt_tsum_sorted.

    any_events: optional (B,) bool override for the empty-bin freeze check —
    spatially-sharded callers pass the GLOBAL flag so a shard that happens to
    receive no events still ages with the rest of the frame."""
    B, H, W, _, K = state.shape
    E = xytp.shape[1]
    x = xytp[..., 0].astype(jnp.int32)
    y = xytp[..., 1].astype(jnp.int32)
    t = xytp[..., 2]
    p = xytp[..., 3].astype(jnp.int32)
    # NB: negative coordinates must be dropped explicitly — jax .at[] wraps
    # negative indices numpy-style BEFORE the mode="drop" bounds check
    valid = (jnp.arange(E)[None, :] < n_valid[:, None])         & (x >= 0) & (x < W) & (y >= 0) & (y < H) & (p >= 0) & (p < 2)
    P = H * W * 2
    idx = jnp.where(valid, (y * W + x) * 2 + p, jnp.int32(P))

    if use_sorted:
        cnt, tsum = scatter_cnt_tsum_sorted(idx, (t - 1.0) * valid, valid,
                                            P, precise)
        cnt = cnt.reshape(B, H, W, 2)
        tmean = (tsum / (cnt.reshape(B, -1) + 1e-8)).reshape(B, H, W, 2)
    else:
        def one(i, tv, v):
            if use_mxu:
                c, s = scatter_cnt_tsum_mxu(i, tv, v, P, precise)
            else:
                oob = jnp.where(v, i, jnp.int32(2**30))
                c = jnp.zeros(P, jnp.float32).at[oob].add(1.0, mode="drop")
                s = jnp.zeros(P, jnp.float32).at[oob].add(tv, mode="drop")
            return c.reshape(H, W, 2), (s / (c + 1e-8)).reshape(H, W, 2)

        cnt, tmean = jax.vmap(one)(idx, (t - 1.0) * valid, valid)
    has = cnt > 0
    shifted = jnp.concatenate([state[..., 1:] - 1.0, tmean[..., None]], -1)
    updated = jnp.where(has[..., None], shifted, state - 1.0)
    if any_events is None:
        any_ev = jnp.any(has, axis=(1, 2, 3), keepdims=True)[..., None]
    else:
        any_ev = any_events[:, None, None, None, None]
    return jnp.where(any_ev, updated, state)


def taf_pack_state(state: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 2, K) queue → packed (B, H, W, 2K) network-channel layout:
    channel c = 2*age + p with age 0 = newest (slot K-1)."""
    packed = jnp.swapaxes(state[..., ::-1], -1, -2)   # (B, H, W, K, 2)
    B, H, W, K, _ = packed.shape
    return packed.reshape(B, H, W, 2 * K)


def taf_unpack_state(packed: jnp.ndarray, K: int) -> jnp.ndarray:
    """Inverse of taf_pack_state."""
    B, H, W, _ = packed.shape
    st = packed.reshape(B, H, W, K, 2)
    return jnp.swapaxes(st, -1, -2)[..., ::-1]


@partial(jax.jit, static_argnames=("scatter", "precise"))
def taf_stream_step_packed(state, xytp, n_valid, any_events=None, *,
                           scatter: str = "mxu", precise: bool = True):
    """Single-bin TAF queue update on the PACKED (B, H, W, 2K) state.

    Same semantics as taf_stream_step, but the state already lives in the
    network-input channel order (c = 2*age + p, newest first), so the whole
    update is channel-local: new bin in channels 0:2, survivors shift right
    by 2 and age by -1, and leaky_transform(state) IS the network input — no
    reversal/transpose gather between encode and detect (that gather cost
    ~25 ms/window at 1MEGAPIXEL batch 128).

    scatter: "xla" (exact serial), "mxu" (dense one-hot matmul), "sorted"
    (XLA sort + banded matmul), "pallas" (sort + banded VMEM kernel — the
    fast path for large grids).
    """
    B, H, W, C = state.shape
    K = C // 2
    E = xytp.shape[1]
    x = xytp[..., 0].astype(jnp.int32)
    y = xytp[..., 1].astype(jnp.int32)
    t = xytp[..., 2]
    p = xytp[..., 3].astype(jnp.int32)
    valid = (jnp.arange(E)[None, :] < n_valid[:, None]) \
        & (x >= 0) & (x < W) & (y >= 0) & (y < H) & (p >= 0) & (p < 2)
    P = H * W * 2
    idx = jnp.where(valid, (y * W + x) * 2 + p, jnp.int32(P))
    tv = (t - 1.0) * valid

    if scatter == "pallas":
        from .pallas_scatter import scatter_cnt_tsum_pallas_sorted

        cnt, tsum = scatter_cnt_tsum_pallas_sorted(idx, tv, valid, P,
                                                   precise)
    elif scatter == "sorted":
        cnt, tsum = scatter_cnt_tsum_sorted(idx, tv, valid, P, precise)
    elif scatter == "mxu":
        def one(i, tvv, v):
            return scatter_cnt_tsum_mxu(i, tvv, v, P, precise)

        cnt, tsum = jax.vmap(one)(idx, tv, valid)
    else:
        def one(i, tvv):
            oob = jnp.where(i < P, i, jnp.int32(2**30))
            c = jnp.zeros(P, jnp.float32).at[oob].add(1.0, mode="drop")
            s = jnp.zeros(P, jnp.float32).at[oob].add(tvv, mode="drop")
            return c, s

        cnt, tsum = jax.vmap(one)(idx, tv)

    cnt = cnt.reshape(B, H, W, 2)
    tmean = (tsum.reshape(B, H, W, 2) / (cnt + 1e-8))
    has = cnt > 0
    aged = state - 1.0
    shifted = jnp.concatenate([tmean, aged[..., :C - 2]], axis=-1)
    # channel c parity == polarity, so tiling `has` K times matches layout
    has_rep = jnp.tile(has, (1, 1, 1, K))
    updated = jnp.where(has_rep, shifted, aged)
    if any_events is None:
        any_ev = jnp.any(has, axis=(1, 2, 3))[:, None, None, None]
    else:
        any_ev = any_events[:, None, None, None]
    return jnp.where(any_ev, updated, state)


@partial(jax.jit, static_argnames=("height", "width", "scatter", "precise"))
def taf_stream_step_folded(state_f, xytp, n_valid, any_events=None, *,
                           height: int, width: int, scatter: str = "pallas",
                           precise: bool = False):
    """Packed TAF update on the FOLDED (B, H, W*2K) state.

    Identical math to taf_stream_step_packed, but the state's minor
    dimension is W*2K instead of 2K — on TPU a 16-channel-minor f32/bf16
    array fills only 16 of each tile's 128 lanes, taxing every elementwise
    pass ~8x; folding W into the minor dim restores full-lane tiles. The
    channel shift becomes a 2-position shift along the folded axis with the
    first two positions of each 16-block replaced by the new bin's mean
    (identical because positions p%%(2K) < 2 are overwritten)."""
    B, H, WF = state_f.shape
    assert H == height
    C = WF // width
    K = C // 2
    E = xytp.shape[1]
    x = xytp[..., 0].astype(jnp.int32)
    y = xytp[..., 1].astype(jnp.int32)
    t = xytp[..., 2]
    p = xytp[..., 3].astype(jnp.int32)
    W = width
    valid = (jnp.arange(E)[None, :] < n_valid[:, None]) \
        & (x >= 0) & (x < W) & (y >= 0) & (y < H) & (p >= 0) & (p < 2)
    P = H * W * 2
    idx = jnp.where(valid, (y * W + x) * 2 + p, jnp.int32(P))
    tv = (t - 1.0) * valid

    if scatter == "pallas":
        from .pallas_scatter import scatter_cnt_tsum_pallas_sorted

        cnt, tsum = scatter_cnt_tsum_pallas_sorted(idx, tv, valid, P,
                                                   precise)
    else:
        cnt, tsum = scatter_cnt_tsum_sorted(idx, tv, valid, P, precise)

    cnt4 = cnt.reshape(B, H, W, 2)
    tmean4 = tsum.reshape(B, H, W, 2) / (cnt4 + 1e-8)
    # bf16/bool tiles: the broadcast intermediates are (B, H, W*2K)-sized —
    # f32 copies of them OOM a 16 GB chip at 1MEGAPIXEL batch 128
    has_f = jnp.tile(cnt4 > 0, (1, 1, 1, K)).reshape(B, H, WF)
    tmean_f = jnp.tile(tmean4.astype(jnp.bfloat16),
                       (1, 1, 1, K)).reshape(B, H, WF)

    mask01 = (jnp.arange(WF) % C) < 2            # new-bin positions
    aged = state_f - 1.0
    shifted = jnp.concatenate(
        [jnp.zeros_like(state_f[..., :2]), aged[..., :-2]], axis=-1)
    new_f = jnp.where(mask01, tmean_f.astype(state_f.dtype), shifted)
    updated = jnp.where(has_f, new_f, aged)
    if any_events is None:
        any_ev = jnp.any(cnt4 > 0, axis=(1, 2, 3))[:, None, None]
    else:
        any_ev = any_events[:, None, None]
    return jnp.where(any_ev, updated, state_f)


# ---------------------------------------------------------------------------
# SAE
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("height", "width", "impl"))
def sae_stream(xytp, n_valid, memory, now, *, height: int, width: int,
               lamdas=(0.00001, 0.0000025, 0.000001), impl: str = "sorted"):
    """Batched decayed last-timestamp surface with memory carry.

    The per-pixel-per-polarity last-event timestamp is computed with
    `segment_last_sorted` (sort + MXU count scatter + cumsum + gather) —
    exact `index_put_` last-write semantics (reference
    generate_surfaceofactiveevents.py:49) with no XLA serial scatter; the
    `.at[].max` formulation measured 702.5 w/s on v5e where the count-image
    scatter ran 3561 (log/round4), because XLA lowers scatter-max to a
    per-update loop. `impl="max"` keeps that serial-scatter formulation as
    an A/B (timestamps are monotone within a window, so max == last write);
    its cost scales with the event count, not key clustering, which makes
    it the candidate winner on skewed/bursty streams where the sorted
    path pays for long same-cell runs.
    """
    B, E = xytp.shape[:2]
    if memory is None:
        memory = jnp.full((B, height, width, 2), now - 5_000_000.0,
                          jnp.float32)
    x = xytp[..., 0].astype(jnp.int32)
    y = xytp[..., 1].astype(jnp.int32)
    t = xytp[..., 2]
    p = xytp[..., 3].astype(jnp.int32)
    # full bounds mask, incl. the negative side: `.at[].max(mode="drop")`
    # wraps negative indices numpy-style BEFORE the bounds check (see the
    # NB at taf_stream_step), so without x>=0/y>=0/p-bounds an out-of-crop
    # event would land in the wrong cell under impl="max" while the sorted
    # path dropped it — the two A/B implementations must agree on every
    # input
    valid = ((jnp.arange(E)[None, :] < n_valid[:, None])
             & (x >= 0) & (x < width) & (y >= 0) & (y < height)
             & (p >= 0) & (p < 2))
    idx = (y * width + x) * 2 + p
    # centre the carried values at `now`: the bf16 hi+lo value path keeps
    # ~16 mantissa bits, so dt over the 5 s SAE window is exact to ~75 µs
    # at the decayed-out far end and sub-µs near now, where raw absolute
    # µs timestamps would lose real precision
    if impl == "max":
        dt_masked = jnp.where(valid, t - now, -jnp.inf)
        base = jnp.full((B, height * width * 2), -jnp.inf, jnp.float32)
        dt_last = jax.vmap(
            lambda b, i, v: b.at[i].max(v, mode="drop"))(base, idx, dt_masked)
        t_img = jnp.where(jnp.isfinite(dt_last), now + dt_last,
                          -jnp.inf).reshape(B, height, width, 2)
    else:
        cnt, dt_last = segment_last_sorted(idx, t - now, valid,
                                           height * width * 2)
        t_img = jnp.where(cnt > 0, now + dt_last, -jnp.inf).reshape(
            B, height, width, 2)
    # monotone max-merge with the running memory (reference :52); cells with
    # no events this window keep the memory value
    t_img = jnp.maximum(t_img, memory)
    new_memory = t_img
    dt = t_img - now
    ecd = jnp.concatenate([jnp.exp(jnp.float32(lam) * dt) for lam in lamdas],
                          axis=-1)  # (B, H, W, n_lam*2), c = 2*lam + p
    return ecd * 255.0, new_memory
