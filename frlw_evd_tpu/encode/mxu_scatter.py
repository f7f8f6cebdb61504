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
