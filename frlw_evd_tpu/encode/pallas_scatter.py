"""Pallas TPU kernels for the event-histogram scatter.

Two generations:

* `scatter_cnt_tsum_pallas` — dense one-hot formulation (kept for parity
  tests; O(E·size) MACs, slower than the XLA dot_general path on v5e).
* `scatter_cnt_tsum_pallas_sorted` — the production kernel: sort the cell
  indices (jax.lax.sort, outside the kernel), then accumulate per-chunk
  banded one-hot matmuls straight into a VMEM-resident dense accumulator.
  The (CHUNK, Δ)/(CHUNK, 128) one-hot operands live only in VMEM — the XLA
  sorted formulation (mxu_scatter.scatter_cnt_tsum_sorted) materialises
  ~6 GB/window of one-hots through HBM at 1MEGAPIXEL scale, which is where
  its time goes. Events whose sorted chunk spans more than Δ hi-rows are
  re-banded in-kernel per 128-event sub-chunk (pl.when-gated second-level
  band); the rare events both levels miss fall back to one XLA scatter
  pass, guarded by lax.cond (same scheme as the XLA sorted path).

Reference behavior being accelerated: the index_add_ event histogram inside
generate_taf.py:23-27 / data/sparse_ops.py:80-85.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pallas_call(*args, **kwargs):
    """pl.pallas_call, interpreted automatically on CPU backends (tests and
    the driver's virtual-CPU multichip dryrun run the same kernels)."""
    import jax as _jax

    if _jax.default_backend() == "cpu":
        kwargs.setdefault("interpret", True)
    return pl.pallas_call(*args, **kwargs)


LANES = 128
CHUNK = 1024
TILE_HI = 256

# sorted-banded kernel parameters
S_CHUNK = 1024        # events per chunk
S_DELTA = 256         # hi-row band per chunk (snap granularity Δ/2)


def _kernel(hi_ref, lo_ref, vmask_ref, th_ref, tl_ref, out_ref, acc_ref):
    E = hi_ref.shape[2]
    n_chunks = E // CHUNK
    n_hi_pad = out_ref.shape[1]
    n_tiles = n_hi_pad // TILE_HI

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def chunk_body(c, _):
        sl = pl.ds(c * CHUNK, CHUNK)
        hi_c = hi_ref[0, 0, sl]
        lo_c = lo_ref[0, 0, sl]
        v_c = vmask_ref[0, 0, sl]
        th_c = th_ref[0, 0, sl]
        tl_c = tl_ref[0, 0, sl]

        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANES), 1)
        onehot_lo = (lo_c[:, None] == lo_iota).astype(jnp.float32)
        U = jnp.concatenate([
            onehot_lo * v_c[:, None],
            onehot_lo * th_c[:, None],
            onehot_lo * tl_c[:, None],
        ], axis=1).astype(jnp.bfloat16)

        def tile_body(t, _):
            hi_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_HI), 1)
            onehot_hi = (hi_c[:, None] - t * TILE_HI == hi_iota).astype(
                jnp.bfloat16)
            part = jax.lax.dot_general(
                onehot_hi, U, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = pl.ds(t * TILE_HI, TILE_HI)
            acc_ref[row, :] = acc_ref[row, :] + part
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[0] = acc_ref[:]


@partial(jax.jit, static_argnames=("size",))
def scatter_cnt_tsum_pallas(idx: jnp.ndarray, tvals: jnp.ndarray,
                            valid: jnp.ndarray, size: int):
    """Batched fused count+sum histogram on TPU via Pallas (dense variant).

    Args:
      idx: (B, E) int32 cell indices; invalid/OOB dropped.
      tvals: (B, E) float32 values; valid: (B, E) bool.
    Returns (cnt (B, size), tsum (B, size)) float32.
    """
    B, E = idx.shape
    n_hi = -(-size // LANES)
    n_hi_pad = -(-n_hi // TILE_HI) * TILE_HI
    pad_e = (-E) % CHUNK
    if pad_e:
        idx = jnp.pad(idx, ((0, 0), (0, pad_e)), constant_values=-1)
        tvals = jnp.pad(tvals, ((0, 0), (0, pad_e)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_e)))
    ok = valid & (idx >= 0) & (idx < size)
    # dump slot beyond every tile (hi = n_hi_pad → never matches a tile row)
    idx = jnp.where(ok, idx, n_hi_pad * LANES)
    hi = idx // LANES
    lo = idx % LANES
    vmask = ok.astype(jnp.float32)
    t_hi = (tvals * vmask).astype(jnp.bfloat16).astype(jnp.float32)
    t_lo = (tvals * vmask - t_hi).astype(jnp.float32)

    E_pad = idx.shape[1]
    as3 = lambda a: a.reshape(B, 1, E_pad)
    out = _pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, E_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 5,
        out_specs=pl.BlockSpec((1, n_hi_pad, 3 * LANES),
                               lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_hi_pad, 3 * LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_hi_pad, 3 * LANES), jnp.float32)],
    )(as3(hi), as3(lo), as3(vmask), as3(t_hi), as3(t_lo))

    cnt = out[:, :, :LANES].reshape(B, -1)[:, :size]
    tsum = (out[:, :, LANES:2 * LANES]
            + out[:, :, 2 * LANES:]).reshape(B, -1)[:, :size]
    return cnt, tsum


# ---------------------------------------------------------------------------
# Sorted-banded kernel (production)
# ---------------------------------------------------------------------------
#
# Measured on v5e at 1MEGAPIXEL scale (B=128, E=65536, 655k cells):
#   XLA sorted dot_general path        ~72 ms
#   pair sort (idx,t)                  ~17.5 ms
#   packed int32-key sort              ~9 ms
#   banded kernel, single accumulator  ~27 ms
#   banded kernel, dual accumulators   ~21 ms   (breaks the serial RMW chain)
# The packed key (idx*TQ + quantized t) halves the sort cost; TQ is chosen so
# size*TQ stays below 2^31 (an overflowing key produces a negative band base
# and an out-of-bounds VMEM write that kills the TPU worker).


def _choose_tq(n_rows: int) -> int:
    """Largest power-of-two t-quantisation such that the packed key
    (idx * TQ + tq) fits in int31 for idx up to n_rows*LANES inclusive."""
    tq = 1
    limit = 2**31 - 1
    while (n_rows * LANES + 1) * (tq * 2) < limit and tq < 4096:
        tq *= 2
    return tq


S_SUB = 128           # sub-chunk granularity of the second-level band


def _build_u(lo, t_c, n, ncol):
    """Lane one-hot with value columns: U[e] = onehot(lo[e]) ⊗ cols(t)."""
    oh_lo = (lo[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (n, LANES), 1)).astype(jnp.bfloat16)
    if ncol == 2:
        return jnp.concatenate(
            [oh_lo, oh_lo * t_c[:, None].astype(jnp.bfloat16)], axis=1)
    t_hi = t_c.astype(jnp.bfloat16)
    t_lo_col = (t_c - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate(
        [oh_lo, oh_lo * t_hi[:, None], oh_lo * t_lo_col[:, None]], axis=1)


def _banded_body(hi, lo, t_c, part_dst, *, s_chunk, s_delta, ncol, max_base):
    """One chunk: build local one-hots, contract on the MXU, band-add.

    A chunk of sorted events usually spans < Δ hi-rows, so one band
    anchored at the chunk's first row covers it. Events the band misses
    (sparse regions of clustered streams) are handled by the kernels'
    second-level sub-chunk pass (_subband_pass); anything missed by both
    goes to the caller's compacted serial fallback."""
    V = s_delta // 2
    base = jnp.clip((hi[0] // V) * V, 0, max_base)
    # mask folded into the index: rows outside the Δ band get s_delta, which
    # never matches the iota (Mosaic cannot reshape i1 vectors)
    dh = jnp.clip(hi - base, 0, s_delta)
    oh_dh = (dh[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (s_chunk, s_delta), 1)).astype(jnp.bfloat16)
    U = _build_u(lo, t_c, s_chunk, ncol)
    part = jax.lax.dot_general(oh_dh, U, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    row = pl.ds(pl.multiple_of(base, V), s_delta)
    part_dst(row, part)


def _subband_pass(load, acc_ref, *, n_chunks, s_chunk, s_delta, ncol,
                  max_base, n_hi):
    """Second-level band pass over all chunks, one shared loop body.

    For each sorted chunk whose events span more than Δ hi-rows (gated at
    chunk level — dense chunks pay two 128-lane loads and a compare), every
    128-event sub-chunk containing events the first band missed gets its
    own band anchored at its first uncovered row. Keeps the clustered-
    stream overflow in-kernel instead of the ~40 ms XLA serial fallback;
    the code exists ONCE (a python-unrolled per-chunk variant made the
    Mosaic program so large the remote compile ran for tens of minutes).
    load(dyn_slice) → (hi, lo, t_c) decodes S_SUB events from the refs."""
    V = s_delta // 2
    n_sub = s_chunk // S_SUB

    def chunk_body(c, _):
        hi_first, _, _ = load(pl.ds(c * s_chunk, S_SUB))
        hi_last, _, _ = load(pl.ds(c * s_chunk + s_chunk - S_SUB, S_SUB))
        base1 = jnp.clip((jnp.min(hi_first) // V) * V, 0, max_base)
        # conservative span gate: the sentinel tail (hi == n_hi) can fire
        # it, the inner unc mask filters exactly
        @pl.when(jnp.max(hi_last) - base1 >= s_delta)
        def _():
            def sub_body(j, _):
                hi, lo, t_c = load(pl.ds(c * s_chunk + j * S_SUB, S_SUB))
                unc = (hi < n_hi) & (hi - base1 >= s_delta)

                @pl.when(jnp.any(unc))
                def _():
                    # anchor at the sub-chunk's first uncovered row
                    # (sorted → every uncovered row is ≥ it)
                    m = jnp.min(jnp.where(unc, hi, n_hi))
                    base2 = jnp.clip((m // V) * V, 0, max_base)
                    dh2 = jnp.where(unc,
                                    jnp.clip(hi - base2, 0, s_delta),
                                    s_delta)
                    oh2 = (dh2[:, None] == jax.lax.broadcasted_iota(
                        jnp.int32, (S_SUB, s_delta), 1)).astype(jnp.bfloat16)
                    U = _build_u(lo, t_c, S_SUB, ncol)
                    part2 = jax.lax.dot_general(
                        oh2, U, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    row2 = pl.ds(pl.multiple_of(base2, V), s_delta)
                    acc_ref[row2, :] = acc_ref[row2, :] + part2
                return 0

            jax.lax.fori_loop(0, n_sub, sub_body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def _packed_kernel(key_ref, out_ref, acc_ref, *, n_iters, s_chunk, s_delta,
                   tq, max_base, n_hi):
    """Packed-key variant: key = idx*tq + t_quantised, decoded in-register.
    Even/odd sub-chunks alternate between out_ref and acc_ref so consecutive
    band read-modify-writes do not serialise on one buffer."""
    out_ref[:] = jnp.zeros_like(out_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def decode(sl):
        key_c = key_ref[0, 0, sl]
        idx_c = key_c // tq
        t_c = (key_c - idx_c * tq).astype(jnp.float32) * (1.0 / (tq - 1)) - 1.0
        hi = idx_c // LANES
        lo = idx_c - hi * LANES
        return hi, lo, t_c

    def one(c, use_out):
        hi, lo, t_c = decode(pl.ds(c * s_chunk, s_chunk))

        def dst(row, part):
            if use_out:
                out_ref[0, row, :] = out_ref[0, row, :] + part
            else:
                acc_ref[row, :] = acc_ref[row, :] + part

        _banded_body(hi, lo, t_c, dst, s_chunk=s_chunk, s_delta=s_delta,
                     ncol=2, max_base=max_base)

    def body(i, _):
        one(2 * i, True)
        one(2 * i + 1, False)
        return 0

    jax.lax.fori_loop(0, n_iters, body, 0)
    _subband_pass(decode, acc_ref, n_chunks=2 * n_iters, s_chunk=s_chunk,
                  s_delta=s_delta, ncol=2, max_base=max_base, n_hi=n_hi)
    out_ref[0] = out_ref[0] + acc_ref[:]


def _pair_kernel(idx_ref, t_ref, out_ref, acc_ref, *, n_iters, s_chunk,
                 s_delta, ncol, max_base, n_hi):
    """Pair-input variant (exact t): used for precise=True."""
    out_ref[:] = jnp.zeros_like(out_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def decode(sl):
        idx_c = idx_ref[0, 0, sl]
        t_c = t_ref[0, 0, sl]
        hi = idx_c // LANES
        lo = idx_c - hi * LANES
        return hi, lo, t_c

    def one(c, use_out):
        hi, lo, t_c = decode(pl.ds(c * s_chunk, s_chunk))

        def dst(row, part):
            if use_out:
                out_ref[0, row, :] = out_ref[0, row, :] + part
            else:
                acc_ref[row, :] = acc_ref[row, :] + part

        _banded_body(hi, lo, t_c, dst, s_chunk=s_chunk, s_delta=s_delta,
                     ncol=ncol, max_base=max_base)

    def body(i, _):
        one(2 * i, True)
        one(2 * i + 1, False)
        return 0

    jax.lax.fori_loop(0, n_iters, body, 0)
    _subband_pass(decode, acc_ref, n_chunks=2 * n_iters, s_chunk=s_chunk,
                  s_delta=s_delta, ncol=ncol, max_base=max_base, n_hi=n_hi)
    out_ref[0] = out_ref[0] + acc_ref[:]


@partial(jax.jit, static_argnames=("size", "precise", "s_chunk", "s_delta",
                                   "raw"))
def scatter_cnt_tsum_pallas_sorted(idx: jnp.ndarray, tvals: jnp.ndarray,
                                   valid: jnp.ndarray, size: int,
                                   precise: bool = True,
                                   s_chunk: int = S_CHUNK,
                                   s_delta: int = S_DELTA,
                                   raw: bool = False):
    """Batched fused count + value-sum histogram: sort + banded VMEM kernel.

    Same contract as mxu_scatter.scatter_cnt_tsum_sorted: idx/tvals/valid
    (B, E) → (cnt, tsum) each (B, size) f32, tvals expected in [-1, 0]
    (the TAF/EV normalised time column). Counts exact. precise=False uses a
    packed int32 sort key with ~2^-12 t quantisation (vs bf16's ~2^-9
    rounding in the XLA path); precise=True pair-sorts and carries bf16x2.
    """
    B, E = idx.shape
    n_hi = -(-size // LANES)
    V = s_delta // 2
    max_base = (n_hi // V) * V          # sentinel row n_hi's band base
    R = -(-(max_base + s_delta) // 8) * 8
    sentinel = n_hi * LANES
    idx = jnp.where(valid & (idx >= 0) & (idx < size), idx,
                    jnp.int32(sentinel))
    tvals = jnp.where(valid, tvals, 0.0)
    n_pad = (-E) % (2 * s_chunk)
    if n_pad:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad)), constant_values=sentinel)
        tvals = jnp.pad(tvals, ((0, 0), (0, n_pad)))
    E_pad = idx.shape[1]
    n_chunks = E_pad // s_chunk

    tq = _choose_tq(n_hi)
    use_packed = (not precise) and tq >= 256
    ncol = 3 if precise else 2
    vmem_cap = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                    vmem_limit_bytes=100 * 1024 * 1024)
    spec_e = pl.BlockSpec((1, 1, E_pad), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, R, ncol * LANES), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, R, ncol * LANES), jnp.float32)
    scratch = [pltpu.VMEM((R, ncol * LANES), jnp.float32)]

    if use_packed:
        tqv = jnp.clip(jnp.round((tvals + 1.0) * (tq - 1)), 0,
                       tq - 1).astype(jnp.int32)
        key_s = jax.lax.sort(idx * tq + tqv, dimension=1)
        idx_s = key_s // tq
        t_s = (key_s - idx_s * tq).astype(jnp.float32) / (tq - 1) - 1.0
        out = _pallas_call(
            partial(_packed_kernel, n_iters=n_chunks // 2, s_chunk=s_chunk,
                    s_delta=s_delta, tq=tq, max_base=max_base, n_hi=n_hi),
            grid=(B,),
            in_specs=[spec_e],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=vmem_cap,
        )(key_s.reshape(B, 1, E_pad))
    else:
        idx_s, t_s = jax.lax.sort((idx, tvals), num_keys=1, dimension=1)
        out = _pallas_call(
            partial(_pair_kernel, n_iters=n_chunks // 2, s_chunk=s_chunk,
                    s_delta=s_delta, ncol=ncol, max_base=max_base,
                    n_hi=n_hi),
            grid=(B,),
            in_specs=[spec_e, spec_e],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=vmem_cap,
        )(idx_s.reshape(B, 1, E_pad), t_s.reshape(B, 1, E_pad))

    # overflow fallback: events neither the chunk band nor the per-sub-chunk
    # second-level band covered (must mirror _banded_body exactly)
    hi_s = idx_s // LANES
    hic = hi_s.reshape(B, n_chunks, s_chunk)
    base = jnp.clip((hic[:, :, 0] // V) * V, 0, max_base)
    dh = hic - base[:, :, None]
    in_grid = hic < n_hi
    cov1 = (dh >= 0) & (dh < s_delta)
    unc1 = in_grid & ~cov1
    # level 2: per S_SUB sub-chunk, band anchored at its first uncovered row
    n_sub = s_chunk // S_SUB
    hisub = hic.reshape(B, n_chunks, n_sub, S_SUB)
    uncs = unc1.reshape(B, n_chunks, n_sub, S_SUB)
    m = jnp.min(jnp.where(uncs, hisub, n_hi), axis=3)
    base2 = jnp.clip((m // V) * V, 0, max_base)
    cov2 = uncs & (hisub - base2[..., None] < s_delta)
    overflow = (uncs & ~cov2).reshape(B, E_pad)

    def cols_of(t):
        if precise:
            thi = t.astype(jnp.bfloat16).astype(jnp.float32)
            return (jnp.ones_like(t), thi, t - thi)
        return (jnp.ones_like(t), t)

    def serial_scatter(d, idx_o, t_o):
        def one(dd, h, l, t):
            out3 = dd.reshape(R, ncol, LANES)
            for c, colv in enumerate(cols_of(t)):
                out3 = out3.at[h, c, l].add(colv.astype(jnp.float32),
                                            mode="drop")
            return out3.reshape(R, ncol * LANES)

        return jax.vmap(one)(d, idx_o // LANES, idx_o % LANES, t_o)

    # clustered streams overflow a few % of events; scattering the FULL
    # padded array serially costs ~135 ms at 1MEGAPIXEL batch 128, so the
    # overflow events are first compacted to a capped slice (XLA's serial
    # scatter prices every row, sentinels included)
    cap = max(E_pad // 8, 2 * s_chunk)
    sent = jnp.int32(R * LANES)

    def add_overflow_compact(d):
        key = jnp.where(overflow, idx_s, sent)
        key_s, t_o = jax.lax.sort((key, t_s), num_keys=1, dimension=1)
        return serial_scatter(d, key_s[:, :cap], t_o[:, :cap])

    def add_overflow_full(d):
        oob = jnp.where(overflow, idx_s, sent)
        return serial_scatter(d, oob, t_s)

    n_over = overflow.sum(axis=1)
    out = jax.lax.cond(
        jnp.any(n_over > 0),
        lambda d: jax.lax.cond(jnp.max(n_over) > cap, add_overflow_full,
                               add_overflow_compact, d),
        lambda d: d, out)

    if raw:
        # consumers with Pallas readers take the (B, R, ncol*LANES) layout
        # directly (cnt = lanes [0:128), tsum = lanes [128:256)) and skip
        # the (B, size) materialisation; only valid for precise=False
        assert not precise
        return out.reshape(B, R, ncol * LANES), R
    dense3 = out.reshape(B, R, ncol, LANES)
    cnt = dense3[:, :, 0, :].reshape(B, -1)[:, :size]
    if precise:
        tsum = (dense3[:, :, 1, :] + dense3[:, :, 2, :]).reshape(
            B, -1)[:, :size]
    else:
        tsum = dense3[:, :, 1, :].reshape(B, -1)[:, :size]
    return cnt, tsum
