"""Scatter-add reformulated as chunked one-hot matmuls on the MXU.

XLA lowers `scatter` on TPU to a serialised per-update loop (~20 ns/update),
which makes event voxelisation the bottleneck of the streaming pipeline. This
module rewrites the dense histogram/scatter as matrix products that the MXU
executes at full rate:

  idx = hi·128 + lo
  dense[hi, lo] = Σ_e onehot(hi_e)ᵀ · (onehot(lo_e) * val_e)

Per 2048-event chunk, the (chunk, n_hi) and (chunk, 128) one-hot operands are
built with vector compares (cheap on the VPU) and contracted on the MXU with
float32 accumulation. Counts are exact (0/1 products); float values are split
into bf16 hi+lo parts so the value path keeps ~16 mantissa bits.

At GEN1 scale (16 k events → 148 k cells, batch 32) this runs ~3-5x faster
than XLA scatter on a v5e chip; see bench.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

LANES = 128
CHUNK = 2048


def _pad_chunks(x, fill):
    n = x.shape[0]
    n_pad = (-n) % CHUNK
    if n_pad:
        x = jnp.concatenate([x, jnp.full((n_pad,) + x.shape[1:], fill,
                                         x.dtype)])
    return x


def _onehot_dot(hi, lo, cols, n_hi):
    """Batched-over-chunks contraction: Σ_e onehot(hi_e)ᵀ · U_e where U packs
    per-column values against the lane one-hot. No scan — a single batched
    dot_general keeps the HLO small (nested scans made Mosaic compile times
    explode through the remote-compile tunnel)."""
    n_chunks = hi.shape[0] // CHUNK
    hi_c = hi.reshape(n_chunks, CHUNK)
    lo_c = lo.reshape(n_chunks, CHUNK)
    onehot_hi = (hi_c[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (n_chunks, CHUNK, n_hi), 2)).astype(jnp.bfloat16)
    onehot_lo = (lo_c[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (n_chunks, CHUNK, LANES), 2)).astype(jnp.bfloat16)
    U = jnp.concatenate(
        [onehot_lo * c.reshape(n_chunks, CHUNK, 1).astype(jnp.bfloat16)
         for c in cols], axis=2)
    part = jax.lax.dot_general(onehot_hi, U, (((1,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    return part.sum(0)  # (n_hi, len(cols)*LANES)


@partial(jax.jit, static_argnames=("size",))
def scatter_add_mxu(idx: jnp.ndarray, vals: jnp.ndarray, size: int):
    """dense (size,) float32 with dense[idx[e]] += vals[e].

    Out-of-range indices (e.g. 2**30 padding) are dropped. vals float32; the
    accumulation is exact for 0/1 values and ~bf16x2 accurate otherwise.
    """
    n_hi = (size + LANES - 1) // LANES
    dump = n_hi * LANES  # one past the padded range → dropped on slice
    idx = jnp.where((idx >= 0) & (idx < size), idx, dump)
    # pad the flat range so hi == n_hi is representable
    idx = _pad_chunks(idx, dump)
    vals = _pad_chunks(vals, 0.0)
    hi = idx // LANES
    lo = idx % LANES

    v_hi = vals.astype(jnp.bfloat16).astype(jnp.float32)
    v_lo = (vals - v_hi).astype(jnp.bfloat16)

    acc = _onehot_dot(hi, lo, (v_hi, v_lo), n_hi)
    dense = (acc[:, :LANES] + acc[:, LANES:]).reshape(-1)
    return dense[:size]


@partial(jax.jit, static_argnames=("size", "precise"))
def scatter_cnt_tsum_mxu(idx: jnp.ndarray, tvals: jnp.ndarray,
                         valid: jnp.ndarray, size: int, precise: bool = True):
    """Fused count + value-sum histogram (the TAF/EV inner primitive).

    Returns (cnt (size,), tsum (size,)) where cnt[e's cell] += 1 and
    tsum[cell] += tvals[e] for valid events. Counts are exact. With
    precise=True, tsum carries bf16x2 (~16 mantissa bit) precision; with
    precise=False the values are single-bf16 (~0.4% per addend — well inside
    the pipeline's own uint8 quantisation) and the contraction is 1/3 cheaper.
    """
    n_hi = (size + LANES - 1) // LANES
    dump = n_hi * LANES
    idx = jnp.where(valid & (idx >= 0) & (idx < size), idx, dump)
    idx = _pad_chunks(idx, dump)
    tvals = _pad_chunks(tvals, 0.0)
    vmask = _pad_chunks(valid.astype(jnp.float32), 0.0)
    hi = idx // LANES
    lo = idx % LANES

    t_hi = tvals.astype(jnp.bfloat16).astype(jnp.float32)
    if precise:
        t_lo = (tvals - t_hi).astype(jnp.bfloat16)
        acc = _onehot_dot(hi, lo, (vmask, t_hi, t_lo), n_hi)
        tsum = (acc[:, LANES:2 * LANES]
                + acc[:, 2 * LANES:]).reshape(-1)[:size]
    else:
        acc = _onehot_dot(hi, lo, (vmask, t_hi), n_hi)
        tsum = acc[:, LANES:2 * LANES].reshape(-1)[:size]
    cnt = acc[:, :LANES].reshape(-1)[:size]
    return cnt, tsum


# ---------------------------------------------------------------------------
# Sort-bucketed variant: O(E·Δ·LANES) instead of O(E·size)
# ---------------------------------------------------------------------------
#
# The dense one-hot above pays E·size MACs — fine for GEN1's 146k cells but
# 43G MAC/stream on the 655k-cell 1MEGAPIXEL grid. Sorting the event indices
# first (cheap on TPU: ~19 ms for 128x65536 on v5e) makes each contiguous
# chunk of events span only a narrow band of hi rows, so the one-hot only
# needs Δ local rows per chunk; the per-chunk (Δ, LANES) partials are then
# window-scattered into the dense grid (one scatter entry per CHUNK, not per
# event). Events whose chunk spans more than Δ hi rows (only heavily skewed
# distributions) fall back to one XLA serial scatter pass, guarded by a
# global lax.cond so the fallback costs nothing when it does not trigger.

SORT_CHUNK = 512
SORT_DELTA = 128


def _sorted_partials(idx_s, t_s, n_hi, cols_fn, delta, chunk):
    """Per-stream chunked local-one-hot contraction on SORTED indices.
    Returns (dense (n_hi, ncol*LANES) f32, overflow mask (E,) in sorted
    order).

    Scatter-free combine: each chunk's hi band is measured from a base row
    SNAPPED to a multiple of V = delta//2, so a chunk occupies exactly two
    V-row slots. The per-chunk (delta, L) partials then collapse into per-
    slot sums with one tiny (n_slots x n_chunks) one-hot matmul, and the
    dense grid is two statically-shifted adds of the slot halves — XLA
    window-scatter (~4.6 us/window on v5e) never runs."""
    E = idx_s.shape[0]
    n_chunks = E // chunk
    V = delta // 2
    hi = (idx_s // LANES).reshape(n_chunks, chunk)
    lo = (idx_s % LANES).reshape(n_chunks, chunk)
    slot = hi[:, 0] // V                      # (C,) non-decreasing
    dh = hi - (slot * V)[:, None]             # in [0, delta) when in range
    in_grid = hi < n_hi                       # sentinel rows excluded
    ok = in_grid & (dh < delta)
    overflow = (in_grid & ~ok).reshape(E)

    onehot_dh = ((dh[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (n_chunks, chunk, delta), 2)) & ok[..., None]
    ).astype(jnp.bfloat16)
    onehot_lo = (lo[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (n_chunks, chunk, LANES), 2)).astype(jnp.bfloat16)
    cols = cols_fn(t_s.reshape(n_chunks, chunk))
    U = jnp.concatenate([onehot_lo * c[..., None].astype(jnp.bfloat16)
                         for c in cols], axis=2)
    part = jax.lax.dot_general(onehot_dh, U, (((1,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)

    L = U.shape[-1]
    # +2 slots: one for the sentinel band at n_hi, one for window spill
    n_slots = n_hi // V + 2
    # f32 slot one-hot: counts in a slot can exceed bf16's exact-integer
    # range (256); this dot is tiny (n_slots x n_chunks x delta*L)
    onehot_slot = (slot[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (n_chunks, n_slots), 1)).astype(jnp.float32)
    slot_sum = jax.lax.dot_general(
        onehot_slot, part.reshape(n_chunks, delta * L),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(n_slots, delta, L)
    # overlap-add the two V-row halves: rows [s*V, s*V+V) and [s*V+V, s*V+2V)
    lo_half = slot_sum[:, :V, :].reshape(n_slots * V, L)
    hi_half = slot_sum[:, V:, :].reshape(n_slots * V, L)
    dense = lo_half + jnp.concatenate(
        [jnp.zeros((V, L), jnp.float32), hi_half[:-V]], axis=0)
    return dense[:n_hi], overflow


@partial(jax.jit, static_argnames=("size",))
def segment_last_sorted(idx: jnp.ndarray, tvals: jnp.ndarray,
                        valid: jnp.ndarray, size: int):
    """Per-cell value of the LAST valid event in stream order — the
    `index_put_` semantics of the reference's SAE scatter
    (generate_surfaceofactiveevents.py:49) — with no serial scatter.

    idx/tvals/valid: (B, E). Returns (cnt, last) each (B, size) f32; `last`
    is meaningful only where cnt > 0.

    Formulation: stable-sort events by cell index carrying the value, so
    each cell's events form a contiguous segment whose END holds the last
    write; mask the carried values to the segment-end positions
    (idx_s[e] != idx_s[e+1]) and run the same banded local-one-hot MXU
    contraction as the count scatter — exactly one event contributes per
    cell, so the value sum IS the last write. Cost = sort + the ECI
    histogram. (A cumsum+gather formulation of the same idea measured
    323.8 w/s on v5e where this path's histogram alone runs 3550 — TPU
    per-element gather over the 146k-cell grid is slower than the serial
    scatter it replaced; log/round5/results.jsonl row enc_sae@0d47729.)

    Values ride the bf16 hi+lo split (~16 mantissa bits): center them
    (e.g. pass t - now, not raw µs timestamps) so the split's relative
    error lands on a small range.
    """
    B, E = idx.shape
    n_hi = (size + LANES - 1) // LANES
    sentinel = n_hi * LANES
    delta, chunk = SORT_DELTA, SORT_CHUNK
    idx = jnp.where(valid & (idx >= 0) & (idx < size), idx,
                    jnp.int32(sentinel))
    n_pad = (-E) % chunk
    if n_pad:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad)), constant_values=sentinel)
        tvals = jnp.pad(tvals, ((0, 0), (0, n_pad)))
    # lax.sort is stable: equal cells keep stream order, so the segment end
    # is the latest write even if timestamps are not monotone
    idx_s, t_s = jax.lax.sort((idx, tvals), num_keys=1, dimension=1)
    is_end = jnp.concatenate(
        [idx_s[:, 1:] != idx_s[:, :-1],
         jnp.ones((B, 1), bool)], axis=1)
    t_end = jnp.where(is_end, t_s, 0.0)

    def cols_fn(tc):
        thi = tc.astype(jnp.bfloat16).astype(jnp.float32)
        return (jnp.ones_like(tc), thi, tc - thi)

    dense, overflow = jax.vmap(
        lambda i, t: _sorted_partials(i, t, n_hi, cols_fn, delta, chunk)
    )(idx_s, t_end)

    def add_overflow(d):
        # serial-scatter pass over the (rare) events whose sorted chunk
        # spanned more than Δ hi rows. Counts add per event; the value
        # columns stay exact because only segment-end events carry one.
        oob = jnp.where(overflow, idx_s, jnp.int32(sentinel))
        hi_o = oob // LANES
        lo_o = oob % LANES

        def one(dd, h, l, t):
            out = dd.reshape(n_hi, 3, LANES)
            for c, colv in enumerate(cols_fn(t)):
                out = out.at[h, c, l].add(colv.astype(jnp.float32),
                                          mode="drop")
            return out.reshape(n_hi, 3 * LANES)

        return jax.vmap(one)(d, hi_o, lo_o, t_end)

    dense = jax.lax.cond(jnp.any(overflow), add_overflow, lambda d: d, dense)
    dense3 = dense.reshape(B, n_hi, 3, LANES)
    cnt = dense3[:, :, 0, :].reshape(B, -1)[:, :size]
    last = (dense3[:, :, 1, :] + dense3[:, :, 2, :]).reshape(B, -1)[:, :size]
    return cnt, last


@partial(jax.jit, static_argnames=("size", "precise"))
def scatter_cnt_tsum_sorted(idx: jnp.ndarray, tvals: jnp.ndarray,
                            valid: jnp.ndarray, size: int,
                            precise: bool = True):
    """Batched fused count + value-sum histogram via sort + local one-hot.

    idx/tvals/valid: (B, E). Returns (cnt, tsum) each (B, size) f32, equal to
    `vmap(scatter_cnt_tsum_mxu)` but with cost O(E·Δ·128) instead of
    O(E·size) — the fast path for large grids (1MEGAPIXEL: 158 ms → ~45 ms
    for 128x65536 events on v5e)."""
    B, E = idx.shape
    n_hi = (size + LANES - 1) // LANES
    sentinel = n_hi * LANES
    delta, chunk = SORT_DELTA, SORT_CHUNK
    idx = jnp.where(valid & (idx >= 0) & (idx < size), idx,
                    jnp.int32(sentinel))
    tvals = jnp.where(valid, tvals, 0.0)
    n_pad = (-E) % chunk
    if n_pad:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad)),
                      constant_values=sentinel)
        tvals = jnp.pad(tvals, ((0, 0), (0, n_pad)))

    idx_s, t_s = jax.lax.sort((idx, tvals), num_keys=1, dimension=1)

    if precise:
        def cols_fn(tc):
            thi = tc.astype(jnp.bfloat16).astype(jnp.float32)
            return (jnp.ones_like(tc), thi, (tc - thi))
    else:
        def cols_fn(tc):
            return (jnp.ones_like(tc), tc)

    dense, overflow = jax.vmap(
        lambda i, t: _sorted_partials(i, t, n_hi, cols_fn, delta, chunk)
    )(idx_s, t_s)

    def add_overflow(d):
        # one XLA serial-scatter pass over the (rare) events whose sorted
        # chunk spanned more than Δ hi rows; non-overflow rows carry the
        # sentinel and get dropped
        oob = jnp.where(overflow, idx_s, jnp.int32(sentinel))
        hi_o = oob // LANES
        lo_o = oob % LANES

        def one(dd, h, l, t):
            ncol = dd.shape[1] // LANES
            out = dd.reshape(n_hi, ncol, LANES)
            for c, colv in enumerate(cols_fn(t)):
                out = out.at[h, c, l].add(
                    colv.astype(jnp.float32), mode="drop")
            return out.reshape(n_hi, ncol * LANES)

        return jax.vmap(one)(d, hi_o, lo_o, t_s)

    dense = jax.lax.cond(jnp.any(overflow), add_overflow, lambda d: d, dense)

    ncol = dense.shape[-1] // LANES
    dense3 = dense.reshape(B, n_hi, ncol, LANES)
    cnt = dense3[:, :, 0, :].reshape(B, -1)[:, :size]
    if precise:
        tsum = (dense3[:, :, 1, :] + dense3[:, :, 2, :]).reshape(
            B, -1)[:, :size]
    else:
        tsum = dense3[:, :, 1, :].reshape(B, -1)[:, :size]
    return cnt, tsum
