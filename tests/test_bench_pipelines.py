"""bench.py pipeline invariants that don't need a chip or a full model:
the p64_input encode stage must produce exactly
space_to_depth_patches(nearest_resize(leaky_volume)) — the quarter-res block
gathers are a re-indexing of the same volume, not an approximation."""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
from frlw_evd_tpu.models.blocks import space_to_depth_patches  # noqa: E402


def test_p64_input_stage_matches_patchified_resize(rng):
    h, w = 60, 76          # mini gen1 sensor
    in_hw = (64, 96)
    B, E = 2, 1024
    # model/variables are only consumed by the detect stage, which this
    # test never invokes
    plain = bench.make_pipeline(None, None, (h, w), in_hw, "mxu",
                                fused=False)
    p64 = bench.make_pipeline(None, None, (h, w), in_hw, "mxu",
                              fused=False, p64_input=True)
    ev, nv = bench.synth_events(np.random.default_rng(0), 1, B, E, (h, w))
    s0 = jnp.full((B, h, w, 2, bench.K), -6000.0, jnp.float32)
    _, vol = plain.stages["encode_transform"](jnp.copy(s0), ev[0], nv[0])
    _, vol_p = p64.stages["encode_transform"](jnp.copy(s0), ev[0], nv[0])
    assert vol_p.shape == (B, in_hw[0] // 2, in_hw[1] // 2, 4 * 2 * bench.K)
    np.testing.assert_array_equal(
        np.asarray(space_to_depth_patches(vol)), np.asarray(vol_p))
