"""Surface of Active Events encoder (generate_surfaceofactiveevents.py:44-80).

Per-pixel-per-polarity last-event timestamp (scatter-max — valid because event
streams are time-ordered, so max == last write), monotonically max-merged with
a running memory, then exponentially decayed at several λ simultaneously.

State: (H, W, 2) float32 raw timestamps (HWC-ordered; the reference keeps
(2, H, W) — the oracle/file layout is recovered by transpose).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def sae_init_state(height: int, width: int, now: float = 0.0) -> jnp.ndarray:
    """Default memory: every pixel last fired 5 s before `now`."""
    return jnp.full((height, width, 2), now - 5_000_000.0, jnp.float32)


@partial(jax.jit, static_argnames=("height", "width"))
def encode_sae(xytp: jnp.ndarray, n_valid, memory, now, *, height: int,
               width: int,
               lamdas=(0.00001, 0.0000025, 0.000001)):
    """Returns ((H, W, len(lamdas)*2) float32 *255, new memory (H, W, 2)).

    Channel c = 2*lam_idx + p. Events with x >= W or y >= H are dropped
    (reference :72); t is the raw microsecond timestamp.
    """
    E = xytp.shape[0]
    x = xytp[:, 0].astype(jnp.int32)
    y = xytp[:, 1].astype(jnp.int32)
    t = xytp[:, 2]
    p = xytp[:, 3].astype(jnp.int32)
    valid = (jnp.arange(E) < n_valid) & (x < width) & (y < height)
    idx = jnp.where(valid, (y * width + x) * 2 + p, jnp.int32(2**30))

    base = jnp.full(height * width * 2, now - 5_000_000.0, jnp.float32)
    t_img = base.at[idx].max(t, mode="drop").reshape(height, width, 2)
    t_img = jnp.maximum(t_img, memory)
    new_memory = t_img
    dt = t_img - now
    surfaces = [jnp.exp(jnp.float32(lam) * dt) for lam in lamdas]
    ecd = jnp.concatenate(surfaces, axis=-1)  # (H, W, n_lam*2), c = 2*lam + p
    return ecd * 255.0, new_memory


@partial(jax.jit, static_argnames=("height", "width"))
def encode_sae_batch(xytp, n_valid, memory, now, *, height: int, width: int,
                     lamdas=(0.00001, 0.0000025, 0.000001)):
    fn = partial(encode_sae, height=height, width=width, lamdas=lamdas)
    return jax.vmap(fn)(xytp, n_valid, memory, now)
