"""Model EMA (reference: core/yolox/utils/ema.py — ModelEMA, decay 0.9999
with warm-up ramp exp(-updates/2000); available but unused by the reference
trainer, first-class here)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # real copies, not aliases: the train step donates the live param
    # buffers, which would leave an aliasing EMA tree pointing at deleted
    # arrays after the first update
    return jax.tree.map(jnp.copy, params)


def ema_update(ema_params, params, updates: jnp.ndarray,
               decay: float = 0.9999):
    """One EMA step with the reference's ramp:
    d = decay * (1 - exp(-updates / 2000))."""
    d = decay * (1.0 - jnp.exp(-updates / 2000.0))
    return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema_params, params)
