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
    """Gather a picklable object from every process (single-process: [obj]).

    Mirrors the reference's pickle-over-gloo all_gather
    (core/yolox/utils/dist.py:186-265): the object is pickled to bytes,
    padded to the max size across processes (sizes exchanged first), moved
    through a device all-gather, and unpickled per process."""
    if not is_multiprocess():
        return [obj]
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(len(buf), jnp.int32))).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[:len(buf)] = buf
    gathered = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(padded)))
    return [pickle.loads(gathered[i, :sizes[i]].tobytes())
            for i in range(len(sizes))]


def sync_batch_stats(batch_stats):
    """Average BN running stats across processes (no-op single-process)."""
    if not is_multiprocess():
        return batch_stats
    from jax.experimental import multihost_utils

    def mean_across(x):
        gathered = multihost_utils.process_allgather(x)
        return jnp.mean(gathered, axis=0)

    return jax.tree.map(mean_across, batch_stats)
