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


def cos_schedule(lr: float, total_iters: int):
    """Plain cosine (lr_scheduler.py:94-100)."""

    def schedule(step):
        iters = step + 1
        return lr * 0.5 * (1.0 + jnp.cos(jnp.pi * iters / total_iters))

    return schedule


def warm_cos_schedule(lr: float, total_iters: int, warmup_total_iters: int,
                      warmup_lr_start: float = 1e-6):
    """Linear warmup + cosine (lr_scheduler.py:103-118)."""

    def schedule(step):
        iters = step + 1
        warm = (lr - warmup_lr_start) * iters / max(
            float(warmup_total_iters), 1.0) + warmup_lr_start
        cos = lr * 0.5 * (1.0 + jnp.cos(
            jnp.pi * (iters - warmup_total_iters)
            / max(total_iters - warmup_total_iters, 1)))
        return jnp.where(iters <= warmup_total_iters, warm, cos)

    return schedule


def multistep_schedule(lr: float, milestones, gamma: float = 0.1):
    """Step decay at milestone iterations (lr_scheduler.py multistep)."""
    import numpy as np

    ms = jnp.asarray(sorted(milestones))

    def schedule(step):
        iters = step + 1
        n_passed = jnp.sum(iters >= ms)
        return lr * gamma ** n_passed

    return schedule
