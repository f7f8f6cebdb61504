"""yoloxwarmcos learning-rate schedule as an optax schedule function.

Reference: core/yolox/utils/lr_scheduler.py:121-148 — quadratic warmup from
warmup_lr_start, then cosine from lr to lr*min_lr_ratio. The reference updates
per iteration with `iters = step + 1` (core/exp.py:150).
"""

from __future__ import annotations

import jax.numpy as jnp


def yolox_warm_cos_schedule(lr: float, min_lr_ratio: float, total_iters: int,
                            warmup_total_iters: int, warmup_lr_start: float = 0.0,
                            no_aug_iter: int = 0):
    min_lr = lr * min_lr_ratio

    def schedule(step):
        iters = step + 1  # reference counts from 1
        warm = (lr - warmup_lr_start) * jnp.square(
            iters / max(float(warmup_total_iters), 1.0)) + warmup_lr_start
        cos = min_lr + 0.5 * (lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * (iters - warmup_total_iters)
                          / max(total_iters - warmup_total_iters - no_aug_iter, 1)))
        out = jnp.where(iters <= warmup_total_iters, warm, cos)
        if no_aug_iter > 0:
            out = jnp.where(iters >= total_iters - no_aug_iter, min_lr, out)
        return out

    return schedule
