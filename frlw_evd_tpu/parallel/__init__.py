"""Mesh / sharding utilities for multi-chip scale-out."""

from .mesh import make_mesh, shard_batch, replicate, batch_sharding
