"""Bisect the SAE bench-vs-profiler gap (231 ms vs 16.8 ms per batch).

Result (log/round5/sae_warmup_bisect.log, v5e): warm-on-None 442.7 ms/step
vs warm-on-array 17.6 ms/step — the encoder bench's timed loop was paying
the carried-state jit variant's compile; steady-state SAE is 7255 w/s,
independent of state carry and input cycling.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frlw_evd_tpu.encode.streaming import sae_stream

B, E, H, W = 128, 16384, 240, 304

rng = np.random.default_rng(0)
S = 10
evs = []
for i in range(S):
    x = rng.integers(0, W, (B, E)).astype(np.float32)
    y = rng.integers(0, H, (B, E)).astype(np.float32)
    t = np.sort(rng.uniform(0, 10000.0, (B, E)).astype(np.float32), axis=1)
    p = rng.integers(0, 2, (B, E)).astype(np.float32)
    evs.append(jnp.asarray(np.stack([x, y, (i + t / 10000.0) * 10000.0, p],
                                    axis=-1)))
n_valid = jnp.full((B,), E, jnp.int32)
memory0 = jnp.full((B, H, W, 2), -5_000_000.0, jnp.float32)


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def run(name, warm_state, carry, cycle, n=50):
    fn = jax.jit(partial(sae_stream, height=H, width=W))
    out, st = fn(evs[0], n_valid, warm_state, jnp.float32(10000.0))
    fence(out)
    if not carry:
        st = memory0
    t0 = time.time()
    for i in range(n):
        ev = evs[i % S] if cycle else evs[0]
        out, st2 = fn(ev, n_valid, st, jnp.float32((i + 1) * 10000.0))
        if carry:
            st = st2
    fence(out)
    ms = (time.time() - t0) / n * 1000
    print(f"[{name:<28}] {ms:8.2f} ms/step ({B / ms * 1000:7.1f} w/s)",
          flush=True)


# exactly the bench: warm on None, carry state, cycle inputs
run("bench-like (None warm)", None, True, True)
# warm on the real array signature instead
run("array-warm, carry, cycle", memory0, True, True)
# no input cycling
run("array-warm, carry, same-ev", memory0, True, False)
# no state carry (fresh memory each step)
run("array-warm, no-carry, cycle", memory0, False, True)
run("bench-like again (now warm)", None, True, True)
