"""On-TPU parity check for the Pallas kernels (VERDICT r2 weak #8).

The CPU test suite can only run the banded scatter / fused update kernels in
interpreter mode; this script runs the TPU-COMPILED kernels on the real chip
against independent numpy replicas, across shapes and adversarial event
statistics (uniform, single-cell, striped, clustered hotspots, bursty /
empty streams). Run once per round:

    python tools/tpu_kernel_check.py

Prints one PASS/FAIL line per case and a final JSON summary.

Reference semantics being checked: the event histogram of
generate_taf.py:23-27 and the queue update of generate_taf.py:39-58.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax_cache_env  # noqa: E402,F401  (before jax)

import jax
import jax.numpy as jnp
import numpy as np

from frlw_evd_tpu.encode.pallas_scatter import scatter_cnt_tsum_pallas_sorted
from frlw_evd_tpu.encode.pallas_update import (p64_init_state,
                                               taf_stream_step_kernel_p64)

K = 8


def make_events(rng, dist, B, E, H, W):
    x = rng.integers(0, W, (B, E)).astype(np.float32)
    y = rng.integers(0, H, (B, E)).astype(np.float32)
    if dist == "one_cell":
        x[:] = W // 3
        y[:] = H // 3
    elif dist == "striped":
        flat = (np.arange(B * E).reshape(B, E) * 997) % (H * W)
        x = (flat % W).astype(np.float32)
        y = (flat // W).astype(np.float32)
    elif dist == "clustered":
        n_hot = 5
        cx = rng.uniform(0, W, (B, n_hot))
        cy = rng.uniform(0, H, (B, n_hot))
        k = rng.integers(0, n_hot, (B, E))
        x = np.take_along_axis(cx, k, 1) + rng.normal(0, 3, (B, E))
        y = np.take_along_axis(cy, k, 1) + rng.normal(0, 3, (B, E))
        bg = rng.random((B, E)) < 0.25
        x = np.where(bg, rng.uniform(0, W, (B, E)), x).clip(0, W - 1)
        y = np.where(bg, rng.uniform(0, H, (B, E)), y).clip(0, H - 1)
        x, y = np.floor(x).astype(np.float32), np.floor(y).astype(np.float32)
    t = np.sort(rng.uniform(0, 1, (B, E)), axis=1).astype(np.float32)
    p = rng.integers(0, 2, (B, E)).astype(np.float32)
    return np.stack([x, y, t, p], -1)


def check_scatter(rng, dist, B, E, H, W, precise):
    size = H * W * 2
    ev = make_events(rng, dist, B, E, H, W)
    n_valid = rng.integers(E // 4, E + 1, B).astype(np.int32)
    if dist == "bursty":
        n_valid[0] = 0
    idx = (ev[..., 1].astype(np.int64) * W + ev[..., 0].astype(np.int64)) \
        * 2 + ev[..., 3].astype(np.int64)
    valid = np.arange(E)[None, :] < n_valid[:, None]
    tv = (ev[..., 2] - 1.0) * valid

    cnt, tsum = scatter_cnt_tsum_pallas_sorted(
        jnp.asarray(idx, jnp.int32), jnp.asarray(tv), jnp.asarray(valid),
        size, precise)
    cnt, tsum = np.asarray(cnt), np.asarray(tsum)

    ok = True
    for b in range(B):
        cref = np.zeros(size)
        np.add.at(cref, idx[b][valid[b]], 1.0)
        tref = np.zeros(size)
        np.add.at(tref, idx[b][valid[b]], tv[b][valid[b]])
        if not np.array_equal(cnt[b], cref):
            ok = False
        atol = 1e-3 if precise else 2.5e-2
        if not np.allclose(tsum[b], tref, atol=atol, rtol=5e-3):
            ok = False
    return ok


def p64_packed_oracle(state, ev, n_valid, H, W):
    """Numpy replica of the p64 streaming step: histogram → queue update →
    leaky, in the patchified folded layout (B, H/2, (W/2)*64)."""
    B = state.shape[0]
    H2, W2 = H // 2, W // 2
    P = H * W * 2
    x = ev[..., 0].astype(np.int64)
    y = ev[..., 1].astype(np.int64)
    t = ev[..., 2]
    p = ev[..., 3].astype(np.int64)
    valid = np.arange(ev.shape[1])[None, :] < n_valid[:, None]
    s = (x & 1) * 2 + (y & 1)
    cell = ((y >> 1) * W2 + (x >> 1)) * 4 + s
    idx = cell * 2 + p
    cnt = np.zeros((B, P))
    tsum = np.zeros((B, P))
    for b in range(B):
        np.add.at(cnt[b], idx[b][valid[b]], 1.0)
        np.add.at(tsum[b], idx[b][valid[b]], t[b][valid[b]] - 1.0)
    tm = np.where(cnt > 0, tsum / (cnt + 1e-8), -2.0)
    # cell (pixel-major, then subpixel, then polarity) → 2K channels each
    tm_f = np.repeat(tm.reshape(B, H2, W2 * 4, 2), K, axis=3) \
        .reshape(B, H2, W2 * 4, 2, K)
    tm_f = np.moveaxis(tm_f, 4, 3).reshape(B, H2, W2 * 4 * 2 * K)
    has_f = tm_f > -1.5
    aged = state - 1.0
    shifted = np.concatenate([np.zeros_like(state[..., :2]),
                              aged[..., :-2]], axis=-1)
    C = 2 * K
    mask01 = (np.arange(state.shape[-1]) % C) < 2
    new = np.where(mask01, tm_f, shifted)
    upd = np.where(has_f, new, aged)
    any_ev = valid.any(axis=1)
    upd = np.where(any_ev[:, None, None], upd, state)
    vol = np.maximum(1.0 - np.log1p(-upd) / 8.7, 0.0)
    return upd.astype(np.float32), vol.astype(np.float32)


def check_p64_step(rng, dist, B, E, H, W, steps=3):
    state = p64_init_state(B, H, W, K)
    state_np = np.asarray(state)
    ok = True
    for step in range(steps):
        ev = make_events(rng, dist, B, E, H, W)
        n_valid = rng.integers(E // 4, E + 1, B).astype(np.int32)
        if step == 1:
            n_valid[:] = 0          # whole-frame freeze
        elif dist == "bursty":
            n_valid[0] = 0
        state, vol = taf_stream_step_kernel_p64(
            state, jnp.asarray(ev), jnp.asarray(n_valid),
            height=H, width=W, scatter="pallas", precise=False)
        ref_state, ref_vol = p64_packed_oracle(state_np, ev, n_valid, H, W)
        state_np = ref_state
        got_state = np.asarray(state)
        got_vol = np.asarray(vol, np.float32).reshape(ref_vol.shape)
        # tmean carries the packed-key t quantisation + bf16 expansion
        # matmul rounding; aged cells are integer-exact
        if not np.allclose(got_state, ref_state, atol=2e-2):
            ok = False
        if not np.allclose(got_vol, ref_vol, atol=2e-2):
            ok = False
    return ok


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(42)
    results = {}

    scatter_cases = [
        ("gen1", 240, 304, 8, 16384),
        ("gen4", 512, 640, 4, 65536),
    ]
    for name, H, W, B, E in scatter_cases:
        for dist in ("uniform", "one_cell", "striped", "clustered",
                     "bursty"):
            for precise in (False, True):
                key = f"scatter/{name}/{dist}/{'precise' if precise else 'packed'}"
                ok = check_scatter(rng, dist, B, E, H, W, precise)
                results[key] = ok
                print(("PASS " if ok else "FAIL ") + key, flush=True)

    for name, H, W, B, E in [("gen4_p64", 512, 640, 2, 16384),
                             ("gen1res_p64", 256, 320, 4, 8192)]:
        for dist in ("uniform", "clustered", "bursty"):
            key = f"p64_step/{name}/{dist}"
            ok = check_p64_step(rng, dist, B, E, H, W)
            results[key] = ok
            print(("PASS " if ok else "FAIL ") + key, flush=True)

    n_fail = sum(not v for v in results.values())
    print(json.dumps({"metric": "tpu_kernel_parity",
                      "cases": len(results), "failures": n_fail,
                      "ok": n_fail == 0}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
