"""Pallas TPU kernel for the event-histogram scatter (experimental).

Same algorithm as encode/mxu_scatter.py (scatter as one-hot matmuls), with the
one-hot operands generated inside VMEM per tile and fed to the MXU, so the
~38 MB/batch-item of one-hot tensors the XLA formulation materialises in HBM
is never written.

STATUS: numerically correct (tests/test_pallas_scatter.py) but currently much
slower than the XLA dot_general formulation on v5e (~220 ms vs ~4.4 ms per
batch-32 step) — the Mosaic lowering of the per-chunk fori_loop with
read-modify-write VMEM accumulation does not pipeline onto the MXU yet.
encode/mxu_scatter.py remains the production path; this kernel is kept as the
starting point for a hand-scheduled version (double-buffered chunk DMA,
accumulator in registers).

Layout: grid = (batch,); per cell, loop event chunks; build (CHUNK, LANES)
value one-hots once per chunk and (CHUNK, TILE_HI) hi one-hots per tile;
contract on the MXU into a VMEM (n_hi, 3*LANES) accumulator
[count | t_hi | t_lo].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK = 1024
TILE_HI = 256


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
    """Batched fused count+sum histogram on TPU via Pallas.

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
    out = pl.pallas_call(
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
