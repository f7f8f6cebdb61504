"""Multi-host utilities — the TPU-native replacements for the reference's
gloo side-channel and BN-stat all-reduce (SURVEY.md §2.7):

  * gather_objects   <- dist.all_gather (pickled-object gather over gloo,
                        core/yolox/utils/dist.py:186) — per-host evaluation
                        results collected with multihost_utils
  * sync_batch_stats <- allreduce_norm (core/yolox/utils/allreduce_norm.py):
                        cross-process mean of BN running stats. NOTE: within
                        one process, BatchNorm reductions over a GSPMD-sharded
                        batch are already global (sync-BN for free); this is
                        only needed across separate jax processes.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def gather_objects(obj: Any) -> List[Any]:
    """Gather a picklable object from every process (single-process: [obj])."""
    if not is_multiprocess():
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))


def sync_batch_stats(batch_stats):
    """Average BN running stats across processes (no-op single-process)."""
    if not is_multiprocess():
        return batch_stats
    from jax.experimental import multihost_utils

    def mean_across(x):
        gathered = multihost_utils.process_allgather(x)
        return jnp.mean(gathered, axis=0)

    return jax.tree.map(mean_across, batch_stats)
