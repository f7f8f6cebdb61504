"""Mesh / sharding utilities for multi-chip scale-out."""

from .mesh import make_mesh, make_data_mesh, shard_batch, replicate, batch_sharding
from .spatial import make_spatial_taf_step, shard_taf_state
from .multihost import gather_objects, sync_batch_stats
