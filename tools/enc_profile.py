"""On-chip decomposition of the SAE encoder path (round-5 perf push).

The SAE segment-last formulation measured 553.6 w/s (231 ms per 128-stream
window batch) where its nominal ceiling — sort + the ECI banded histogram —
is ~2500 w/s (BASELINE.md round-5 encoder table). This profiler times each
sub-stage of `sae_stream` as its own jitted program on the same inputs the
bench uses, so the regression is attributed instead of guessed at:

  eci_ref       the dense one-hot count scatter (the 3550 w/s reference point)
  sort_kv       lax.sort((idx, t), num_keys=1)  — the 2-operand sort SAE pays
  sort_packed   lax.sort(packed int32)          — the single-key alternative
  seg_contract  segment-end mask + banded local-one-hot contraction on
                PRE-SORTED inputs (the post-sort remainder of
                segment_last_sorted)
  seg_last      segment_last_sorted end to end
  sae_tail      where/max-merge/exp-decay tail on a fixed t_img
  sae_full      sae_stream end to end (the 553.6 w/s row)
  sae_max       the .at[].max serial-scatter formulation (the 702.5 w/s row)

Run inside a warm r5_session process (tools/r5_session.py --set gen1d) or
standalone: python tools/enc_profile.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax_cache_env  # noqa: E402,F401  (before jax)

import jax
import jax.numpy as jnp
import numpy as np

from frlw_evd_tpu.encode import mxu_scatter as ms
from frlw_evd_tpu.encode.count_image import encode_count_image
from frlw_evd_tpu.encode.sae import encode_sae_batch
from frlw_evd_tpu.encode.streaming import sae_stream

B, E = 128, 16384
H, W = 240, 304
SIZE = H * W * 2
N_ITERS = 30

if "--quick" in sys.argv:  # CPU smoke: correctness of the harness, not perf
    B, N_ITERS = 4, 2


def _fence(out):
    """Force a host scalar read: through the axon tunnel,
    jax.block_until_ready returns at dispatch, not completion — only an
    actual device->host read drains the execution queue (bench.py uses the
    same fence; the bare read RTT is ~33 ms, amortised over N_ITERS)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim].astype(jnp.float32))


_RTT_MS = 0.0


def _time(name, fn, *args, n=None):
    n = N_ITERS if n is None else n
    out = fn(*args)
    _fence(out)  # compile + warmup
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    ms_ = (time.time() - t0) / n * 1000 - _RTT_MS / n
    print(f"[{name:<12}] {ms_:8.2f} ms / {B}-stream batch "
          f"({B / ms_ * 1000:7.1f} w/s)", flush=True)
    return ms_


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(0, W, (B, E)).astype(np.float32)
    y = rng.integers(0, H, (B, E)).astype(np.float32)
    t = np.sort(rng.uniform(0, 10000.0, (B, E)).astype(np.float32), axis=1)
    p = rng.integers(0, 2, (B, E)).astype(np.float32)
    xytp = jnp.asarray(np.stack([x, y, t + 10000.0, p], axis=-1))
    n_valid = jnp.full((B,), E, jnp.int32)
    now = jnp.float32(20000.0)
    idx = jnp.asarray(((y * W + x) * 2 + p).astype(np.int32))
    tval = jnp.asarray(t - 10000.0)  # centred dt in (-10000, 0]
    valid = jnp.ones((B, E), bool)
    memory = jnp.full((B, H, W, 2), -5_000_000.0, jnp.float32)

    lines = []

    # calibrate the read RTT so short stages aren't swamped by the fence
    global _RTT_MS
    trivial = jax.jit(lambda a: a * 2.0)
    z = jnp.float32(1.0)
    _fence(trivial(z))
    t0 = time.time()
    for _ in range(5):
        _fence(trivial(z))
    _RTT_MS = (time.time() - t0) / 5 * 1000
    print(f"[rtt         ] {_RTT_MS:8.2f} ms per fenced read", flush=True)

    def rec(name, fn, *args):
        lines.append((name, _time(name, fn, *args)))

    # --- reference point: the ECI dense one-hot scatter -------------------
    eci = jax.jit(jax.vmap(partial(encode_count_image, height=H, width=W)))
    rec("eci_ref", eci, xytp, n_valid)

    # --- sort variants -----------------------------------------------------
    sort_kv = jax.jit(lambda i, v: jax.lax.sort((i, v), num_keys=1,
                                                dimension=1))
    rec("sort_kv", sort_kv, idx, tval)

    # packed single-key: idx(18b) << 13 | rank(13b 8x-decimated position);
    # monotone in (idx, position) — enough to locate segment ends
    pos = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32) // 8, (B, E))

    @jax.jit
    def sort_packed(i, r):
        packed = (i << 13 | r) + jnp.int32(-(2**31) // 2) * 2
        return jax.lax.sort(packed, dimension=1)

    rec("sort_packed", sort_packed, idx, pos)

    # --- post-sort remainder of segment_last_sorted ------------------------
    idx_s, t_s = sort_kv(jnp.where(valid, idx, jnp.int32(ms.LANES * (
        (SIZE + ms.LANES - 1) // ms.LANES))), tval)

    @jax.jit
    def seg_contract(i_s, v_s):
        n_hi = (SIZE + ms.LANES - 1) // ms.LANES
        is_end = jnp.concatenate(
            [i_s[:, 1:] != i_s[:, :-1], jnp.ones((B, 1), bool)], axis=1)
        t_end = jnp.where(is_end, v_s, 0.0)

        def cols_fn(tc):
            thi = tc.astype(jnp.bfloat16).astype(jnp.float32)
            return (jnp.ones_like(tc), thi, tc - thi)

        dense, _ = jax.vmap(
            lambda i, v: ms._sorted_partials(i, v, n_hi, cols_fn,
                                             ms.SORT_DELTA, ms.SORT_CHUNK)
        )(i_s, t_end)
        return dense

    rec("seg_contract", seg_contract, idx_s, t_s)

    # --- segment_last_sorted end to end ------------------------------------
    seg_last = jax.jit(lambda i, v, m: ms.segment_last_sorted(i, v, m, SIZE))
    rec("seg_last", seg_last, idx, tval, valid)

    # --- decay/merge tail ---------------------------------------------------
    t_img0 = jnp.asarray(rng.uniform(-5e6, 0, (B, H, W, 2)).astype(np.float32))

    @jax.jit
    def sae_tail(ti, mem):
        ti = jnp.maximum(ti + now, mem)
        dt = ti - now
        ecd = jnp.concatenate([jnp.exp(jnp.float32(lam) * dt)
                               for lam in (1e-5, 2.5e-6, 1e-6)], axis=-1)
        return ecd * 255.0, ti

    rec("sae_tail", sae_tail, t_img0, memory)

    # --- full paths ---------------------------------------------------------
    full = jax.jit(partial(sae_stream, height=H, width=W))
    rec("sae_full", full, xytp, n_valid, memory, now)
    amax = jax.jit(partial(encode_sae_batch, height=H, width=W))
    rec("sae_max", amax, xytp, n_valid, memory,
        jnp.broadcast_to(now, (B,)))

    print("# decomposition: sae_full should be ~ sort_kv + seg_contract + "
          "sae_tail; the gap is the attribution target", flush=True)
    return {"metric": "enc_profile_sae", "value": None,
            "unit": "decomposition",
            "lines": [f"{n}: {v:.2f} ms" for n, v in lines]}


if __name__ == "__main__":
    main()
