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
  re-banded in-kernel per 128-event sub-chunk and per 32-event group
  (second/third band levels, gated by XLA-precomputed SMEM bitmask flags so
  dense chunks pay one scalar read); the rare events all three levels miss
  fall back to one XLA scatter pass, guarded by lax.cond (same scheme as
  the XLA sorted path).

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
    """pl.pallas_call, interpreted automatically on CPU execution (tests and
    the driver's virtual-CPU multichip dryrun run the same kernels).

    The decision honours, in order: the FRLW_PALLAS_INTERPRET env var (0/1
    explicit override), a `jax.default_device` pinned to a CPU device (a
    TPU-attached host steering this computation to CPU must get the
    interpreter, not a Mosaic lowering for a CPU device), then the default
    backend."""
    import os as _os

    import jax as _jax

    env = _os.environ.get("FRLW_PALLAS_INTERPRET")
    if env is not None:
        kwargs.setdefault("interpret", env not in ("0", "false", ""))
    else:
        dd = _jax.config.jax_default_device
        on_cpu = (getattr(dd, "platform", None) == "cpu" if dd is not None
                  else _jax.default_backend() == "cpu")
        if on_cpu:
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
S_SUB3 = 32           # group granularity of the third-level band


def _build_u(lo, t_c, n, ncol):
    """Lane one-hot with value columns: U[e] = onehot(lo[e]) ⊗ cols(t)."""
    oh_lo = (lo[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (n, LANES), 1)).astype(jnp.bfloat16)
    if ncol == 2:
        return jnp.concatenate(
            [oh_lo, oh_lo * t_c[:, None].astype(jnp.bfloat16)], axis=1)
    # minor-dim insertion must happen in f32 (Mosaic rejects the 1-D bf16
    # [:, None] reshape); round to bf16 after the 2-D broadcast
    t2 = t_c[:, None]
    t_hi = t2.astype(jnp.bfloat16)
    t_lo_col = (t2 - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([oh_lo, oh_lo * t_hi, oh_lo * t_lo_col], axis=1)


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


def _subband_pass(load, acc_ref, anyf_ref, f2_ref, f3_ref, *, n_chunks,
                  s_chunk, s_delta, ncol, max_base, n_hi):
    """Flag-gated second/third-level band pass (the clustered-stream path).

    Sparse regions of clustered streams break the one-band-per-chunk
    assumption; the events band 1 misses get per-128-event sub-chunk bands
    (level 2) and, within those, per-32-event bands (level 3), each
    anchored at its first still-uncovered row. WHICH sub-chunks fire is
    precomputed on the XLA side (vectorised, ~free) and shipped in as SMEM
    bitmasks, so the kernel pays one scalar read per chunk — an in-kernel
    span gate cost ~13 ms at gen4 batch 128 (64 chunks x 2 vector loads x
    128 sequential grid steps), and a python-unrolled variant made the
    Mosaic program so large the remote compile ran for tens of minutes.
    Level 3 drives the residual to zero for any window with >= ~0.13
    in-grid events per hi-row; only emptier streams reach the caller's
    serial fallback. load(dyn_slice) → (hi, lo, t_c) decodes events from
    the refs."""
    V = s_delta // 2
    n_sub = s_chunk // S_SUB
    n_s3 = S_SUB // S_SUB3

    def band_dot(hi_v, lo_v, t_v, unc_v, n, base):
        dh = jnp.where(unc_v, jnp.clip(hi_v - base, 0, s_delta), s_delta)
        oh = (dh[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (n, s_delta), 1)).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            oh, _build_u(lo_v, t_v, n, ncol), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = pl.ds(pl.multiple_of(base, V), s_delta)
        acc_ref[row, :] = acc_ref[row, :] + part

    @pl.when(anyf_ref[0, 0, 0] != 0)
    def _():
        def chunk_body(c, _):
            f2 = f2_ref[0, 0, c]

            @pl.when(f2 != 0)
            def _():
                hi0, _, _ = load(pl.ds(c * s_chunk, S_SUB))
                base1 = jnp.clip((jnp.min(hi0) // V) * V, 0, max_base)
                f3 = f3_ref[0, 0, c]

                def sub_body(j, _):
                    @pl.when(((f2 >> j) & 1) != 0)
                    def _():
                        hi, lo, t_c = load(
                            pl.ds(c * s_chunk + j * S_SUB, S_SUB))
                        unc = (hi < n_hi) & (hi - base1 >= s_delta)
                        # anchor at the first uncovered row (sorted →
                        # every uncovered row is ≥ it)
                        m = jnp.min(jnp.where(unc, hi, n_hi))
                        base2 = jnp.clip((m // V) * V, 0, max_base)
                        band_dot(hi, lo, t_c, unc, S_SUB, base2)

                        f3j = (f3 >> (j * n_s3)) & (2 ** n_s3 - 1)

                        @pl.when(f3j != 0)
                        def _():
                            for j3 in range(n_s3):
                                @pl.when(((f3j >> j3) & 1) != 0)
                                def _():
                                    sl3 = slice(j3 * S_SUB3,
                                                (j3 + 1) * S_SUB3)
                                    hi3, unc_p = hi[sl3], unc[sl3]
                                    unc3 = unc_p & (hi3 - base2 >= s_delta)
                                    m3 = jnp.min(
                                        jnp.where(unc3, hi3, n_hi))
                                    base3 = jnp.clip((m3 // V) * V, 0,
                                                     max_base)
                                    band_dot(hi3, lo[sl3], t_c[sl3],
                                             unc3, S_SUB3, base3)
                    return 0

                jax.lax.fori_loop(0, n_sub, sub_body, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def _packed_kernel(key_ref, anyf_ref, f2_ref, f3_ref, out_ref, acc_ref, *,
                   n_iters, s_chunk, s_delta, tq, max_base, n_hi):
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
    _subband_pass(decode, acc_ref, anyf_ref, f2_ref, f3_ref,
                  n_chunks=2 * n_iters, s_chunk=s_chunk,
                  s_delta=s_delta, ncol=2, max_base=max_base, n_hi=n_hi)
    out_ref[0] = out_ref[0] + acc_ref[:]


def _pair_kernel(idx_ref, t_ref, anyf_ref, f2_ref, f3_ref, out_ref, acc_ref,
                 *, n_iters, s_chunk, s_delta, ncol, max_base, n_hi):
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
    _subband_pass(decode, acc_ref, anyf_ref, f2_ref, f3_ref,
                  n_chunks=2 * n_iters, s_chunk=s_chunk,
                  s_delta=s_delta, ncol=ncol, max_base=max_base, n_hi=n_hi)
    out_ref[0] = out_ref[0] + acc_ref[:]


def _host_bands(idx_s, n_chunks, s_chunk, s_delta, n_hi, max_base):
    """XLA-side replica of the kernel's three band levels.

    Returns the SMEM gating flags (anyf (B,1,1); f2/f3 (B,1,n_chunks) int32
    bitmasks of which level-2 sub-chunks / level-3 groups fire) plus the
    residual-overflow mask for the serial fallback. Must mirror
    _banded_body/_subband_pass exactly — an event the host thinks is
    covered but the kernel drops would be silently lost, and vice versa
    double-counted."""
    B, E_pad = idx_s.shape
    V = s_delta // 2
    n_sub = s_chunk // S_SUB
    n_s3 = S_SUB // S_SUB3
    hic = (idx_s // LANES).reshape(B, n_chunks, s_chunk)
    base = jnp.clip((hic[:, :, 0] // V) * V, 0, max_base)
    dh = hic - base[:, :, None]
    in_grid = hic < n_hi
    unc1 = in_grid & ~((dh >= 0) & (dh < s_delta))
    # level 2: per S_SUB sub-chunk, band anchored at its first uncovered row
    hisub = hic.reshape(B, n_chunks, n_sub, S_SUB)
    uncs = unc1.reshape(B, n_chunks, n_sub, S_SUB)
    m = jnp.min(jnp.where(uncs, hisub, n_hi), axis=3)
    base2 = jnp.clip((m // V) * V, 0, max_base)
    unc2 = uncs & ~(hisub - base2[..., None] < s_delta)
    # level 3: per S_SUB3 group within still-uncovered sub-chunks
    hi3 = hisub.reshape(B, n_chunks, n_sub, n_s3, S_SUB3)
    unc3 = unc2.reshape(B, n_chunks, n_sub, n_s3, S_SUB3)
    m3 = jnp.min(jnp.where(unc3, hi3, n_hi), axis=4)
    base3 = jnp.clip((m3 // V) * V, 0, max_base)
    overflow = (unc3 & ~(hi3 - base3[..., None] < s_delta)
                ).reshape(B, E_pad)
    f2_bits = jnp.any(uncs, axis=3)
    f2 = jnp.sum(f2_bits.astype(jnp.int32)
                 << jnp.arange(n_sub, dtype=jnp.int32),
                 axis=2, dtype=jnp.int32)
    f3_bits = jnp.any(unc3, axis=4).reshape(B, n_chunks, n_sub * n_s3)
    f3 = jnp.sum(f3_bits.astype(jnp.int32)
                 << jnp.arange(n_sub * n_s3, dtype=jnp.int32),
                 axis=2, dtype=jnp.int32)
    anyf = jnp.any(f2_bits, axis=(1, 2)).astype(jnp.int32)
    return (anyf.reshape(B, 1, 1), f2.reshape(B, 1, n_chunks),
            f3.reshape(B, 1, n_chunks), overflow)


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
    # the level-2/3 gating flags are packed into single int32 bitmasks per
    # chunk (_host_bands); a larger s_chunk would shift past bit 31 and
    # silently never fire those bands while the host marks events covered
    if s_chunk // S_SUB > 32 or s_chunk // S_SUB3 > 32:
        raise ValueError(
            f"s_chunk={s_chunk} needs {s_chunk // S_SUB3} level-3 flag bits; "
            "the SMEM gating masks are single int32 words (max 32)")
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

    smem1 = pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM)
    smemc = pl.BlockSpec((1, 1, n_chunks), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM)

    if use_packed:
        tqv = jnp.clip(jnp.round((tvals + 1.0) * (tq - 1)), 0,
                       tq - 1).astype(jnp.int32)
        key_s = jax.lax.sort(idx * tq + tqv, dimension=1)
        idx_s = key_s // tq
        t_s = (key_s - idx_s * tq).astype(jnp.float32) / (tq - 1) - 1.0
    else:
        idx_s, t_s = jax.lax.sort((idx, tvals), num_keys=1, dimension=1)

    anyf, f2, f3, overflow = _host_bands(idx_s, n_chunks, s_chunk, s_delta,
                                         n_hi, max_base)

    if use_packed:
        out = _pallas_call(
            partial(_packed_kernel, n_iters=n_chunks // 2, s_chunk=s_chunk,
                    s_delta=s_delta, tq=tq, max_base=max_base, n_hi=n_hi),
            grid=(B,),
            in_specs=[spec_e, smem1, smemc, smemc],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=vmem_cap,
        )(key_s.reshape(B, 1, E_pad), anyf, f2, f3)
    else:
        out = _pallas_call(
            partial(_pair_kernel, n_iters=n_chunks // 2, s_chunk=s_chunk,
                    s_delta=s_delta, ncol=ncol, max_base=max_base,
                    n_hi=n_hi),
            grid=(B,),
            in_specs=[spec_e, spec_e, smem1, smemc, smemc],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=vmem_cap,
        )(idx_s.reshape(B, 1, E_pad), t_s.reshape(B, 1, E_pad),
          anyf, f2, f3)

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
