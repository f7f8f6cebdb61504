"""Spatial sharding of encoder state grids — the context-parallelism analog
for event streams (SURVEY.md §5: scatter keys are spatially local, so the
(H, W) state grid shards halo-free across the mesh).

At 1 Mpx (720×1280×2×K float32 ≈ 15 MB/stream just for the TAF queue), a
single chip runs out of headroom quickly at large batch; sharding the H axis
over the mesh splits both the queue state and the scatter work. Events are
cheap to replicate (a few MB); each shard drops events outside its row range
via the encoder's OOB-drop path, so no communication happens inside the
encode step at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shard_map(f, mesh, in_specs, out_specs):
    """jax.shard_map on current jax (check_vma kwarg); falls back to the
    deprecated jax.experimental.shard_map path on older releases."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)


def shard_taf_state(mesh: Mesh, state: jnp.ndarray,
                    axis: str = "data") -> jnp.ndarray:
    """Place a (B, H, W, 2, K) queue with H sharded over `axis`."""
    return jax.device_put(state, NamedSharding(mesh, P(None, axis)))


def make_spatial_taf_step(mesh: Mesh, height: int, axis: str = "data",
                          use_mxu: bool = True, batch_axis=None):
    """Returns a jitted (state_sharded, events_replicated, n_valid) → state
    step where each mesh shard updates its own H-slice of the queue.

    Events carry GLOBAL y coordinates; each shard rebases y into its local
    range and lets the scatter's OOB drop discard foreign events — halo-free,
    zero collectives.

    batch_axis: optional second mesh axis to shard the batch dim over —
    combined data x spatial parallelism on a 2-D mesh (each (b, h) tile of
    the queue lives on one device; events shard over batch only).
    """
    from ..encode.streaming import taf_stream_step

    n_shards = mesh.shape[axis]
    local_h = height // n_shards

    def local_step(state, xytp, n_valid):
        # state: (B, local_h, W, 2, K); xytp: (B, E, 4) with global y
        shard = jax.lax.axis_index(axis)
        y0 = shard * local_h
        local = xytp.at[..., 1].add(-y0)
        # the empty-bin freeze must be a GLOBAL decision; events are
        # replicated, so every shard can evaluate it without a collective
        E = xytp.shape[1]
        valid = jnp.arange(E)[None, :] < n_valid[:, None]
        any_global = jnp.any(valid & (xytp[..., 1] >= 0)
                             & (xytp[..., 1] < height), axis=1)
        # foreign events fall outside [0, local_h) and are dropped by the
        # encoder's bounds check (coordinates left as-is: negative or >= H)
        return taf_stream_step(state, local, n_valid, any_global,
                               use_mxu=use_mxu)

    step = _shard_map(
        local_step, mesh=mesh,
        in_specs=(P(batch_axis, axis), P(batch_axis), P(batch_axis)),
        out_specs=P(batch_axis, axis))
    return jax.jit(step)


def shard_taf_state_p64(mesh: Mesh, state_f: jnp.ndarray,
                        axis: str = "data") -> jnp.ndarray:
    """Place a folded p64 queue (B, H/2, (W/2)*4*2K) with the quarter-row
    axis sharded over `axis`."""
    return jax.device_put(state_f, NamedSharding(mesh, P(None, axis)))


def make_spatial_taf_step_p64(mesh: Mesh, height: int, width: int,
                              axis: str = "data", scatter: str = "sorted",
                              batch_axis=None):
    """Spatially-sharded p64 streaming TAF step (the 1 Mpx multi-chip
    scale-out for the production pipeline layout).

    state_f (B, H/2, (W/2)*64) folded p64 queue with H/2 sharded; events
    carry GLOBAL coordinates and are replicated over the spatial axis — each
    shard rebases y into its own row range and the encoder's bounds check
    drops foreign events, so the encode step needs no collectives. Returns
    a jitted (state_f, xytp, n_valid) → (state_f, vol_folded) step.
    """
    from ..encode.pallas_update import taf_stream_step_kernel_p64

    n_shards = mesh.shape[axis]
    local_h2 = (height // 2) // n_shards

    def local_step(state_f, xytp, n_valid):
        shard = jax.lax.axis_index(axis)
        y0 = shard * local_h2 * 2
        local = xytp.at[..., 1].add(-y0)
        E = xytp.shape[1]
        valid = jnp.arange(E)[None, :] < n_valid[:, None]
        any_global = jnp.any(valid & (xytp[..., 1] >= 0)
                             & (xytp[..., 1] < height), axis=1)
        return taf_stream_step_kernel_p64(
            state_f, local, n_valid, any_global,
            height=local_h2 * 2, width=width, scatter=scatter,
            fold_output=True)

    step = _shard_map(
        local_step, mesh=mesh,
        in_specs=(P(batch_axis, axis), P(batch_axis), P(batch_axis)),
        out_specs=(P(batch_axis, axis), P(batch_axis, axis)))
    return jax.jit(step)
