"""Event Count Image encoder (generate_eventcountimage.py:19-41).

Each event adds 0.05 to its (y, x, p) cell; clamp at 1; ×255. HWC output with
channel = polarity (p=0 first), matching the reference CHW blob semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("height", "width"))
def encode_count_image(xytp: jnp.ndarray, n_valid, *, height: int,
                       width: int) -> jnp.ndarray:
    """(E, 4) padded events → (H, W, 2) float32 in [0, 255]."""
    E = xytp.shape[0]
    x = xytp[:, 0].astype(jnp.int32)
    y = xytp[:, 1].astype(jnp.int32)
    p = xytp[:, 3].astype(jnp.int32)
    valid = jnp.arange(E) < n_valid
    idx = jnp.where(valid, (y * width + x) * 2 + p, jnp.int32(2**30))
    img = jnp.zeros(height * width * 2, jnp.float32)
    img = img.at[idx].add(jnp.float32(0.05), mode="drop")
    img = jnp.minimum(img, 1.0)
    return img.reshape(height, width, 2) * 255.0


@partial(jax.jit, static_argnames=("height", "width"))
def encode_count_image_batch(xytp: jnp.ndarray, n_valid, *, height: int,
                             width: int) -> jnp.ndarray:
    fn = partial(encode_count_image, height=height, width=width)
    return jax.vmap(fn)(xytp, n_valid)
