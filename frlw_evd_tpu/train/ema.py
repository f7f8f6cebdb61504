"""Model EMA (reference: core/yolox/utils/ema.py — ModelEMA, decay 0.9999
with warm-up ramp exp(-updates/2000); available but unused by the reference
trainer, first-class here)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(lambda p: p, params)


def ema_update(ema_params, params, updates: jnp.ndarray,
               decay: float = 0.9999):
    """One EMA step with the reference's ramp:
    d = decay * (1 - exp(-updates / 2000))."""
    d = decay * (1.0 - jnp.exp(-updates / 2000.0))
    return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema_params, params)
