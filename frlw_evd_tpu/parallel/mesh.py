"""Device mesh and sharding helpers.

The reference's only parallelism is single-node data parallelism over NCCL
DDP (SURVEY.md §2.7). The TPU-native equivalent: a 1-D `data` mesh axis over
ICI; the batch is sharded over it, parameters are replicated, and XLA GSPMD
inserts the gradient all-reduce inside the jitted train step — no hand-written
collectives. A second optional `model` axis is plumbed through for spatial /
tensor sharding of the 1 Mpx encode path (state grids shard over (H, W)).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first n_devices (all by default).

    For the default 1-D case the mesh is (n_devices,) over axis 'data'.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def make_data_mesh(batch_size: int, data_axis: str = "data") -> Mesh:
    """1-D data mesh over the largest device count that divides batch_size."""
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n, axis_names=(data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, data_axis: str = "data"):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(mesh: Mesh, tree):
    sharding = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
