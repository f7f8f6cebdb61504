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


def test_int8_pipeline_wiring(rng):
    """--dtype int8 plumbing: the split pipeline's detect stage accepts a
    (scales, weight_table) pair, quantizes the calibrated conv sites, and
    still produces the exact bf16 result when no site is calibrated."""
    import jax

    from frlw_evd_tpu.models import build_detector
    from frlw_evd_tpu.models.quantize import (build_weight_table,
                                              calibrate_int8)

    h, w = 64, 96
    B, E = 2, 512
    model = build_detector(2, family="aed", stem="bfm",
                           in_channels=(64, 64, 64), stem_out_channels=64,
                           head_width=64)
    sample = jnp.zeros((1, h, w, 2 * bench.K), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), sample, False)
    f32_params = variables["params"]
    variables = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables)

    base = bench.make_pipeline(model, variables, (h, w), (h, w), "mxu",
                               fused=False)
    ev, nv = bench.synth_events(np.random.default_rng(0), 2, B, E, (h, w))
    s0 = jnp.full((B, h, w, 2, bench.K), -6000.0, jnp.float32)

    # calibrate exactly as bench.main does (jitted recording pass)
    state = jnp.copy(s0)
    vols = []
    for i in range(2):
        state, vol = base.stages["encode_transform"](state, ev[i], nv[i])
        vols.append(vol)
    scales = calibrate_int8(model, variables, vols)
    assert scales, "no conv sites calibrated"
    table = build_weight_table(f32_params, scales)

    quant = bench.make_pipeline(model, variables, (h, w), (h, w), "mxu",
                                fused=False, quant=(scales, table))
    kept_q = quant.stages["detect"](vol)
    assert np.isfinite(float(kept_q))

    # empty scales ⇒ bit-exact identical detect program
    noop = bench.make_pipeline(model, variables, (h, w), (h, w), "mxu",
                               fused=False, quant=({}, {}))
    np.testing.assert_array_equal(
        np.asarray(base.stages["detect"](vol)),
        np.asarray(noop.stages["detect"](vol)))


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
