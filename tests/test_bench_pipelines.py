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


def test_gen1_pipeline_variants_agree(rng):
    """The three gen1 pipeline formulations — canonical unpacked state
    (make_pipeline), packed state + scatter (make_pipeline_packed), and the
    folded fused-Pallas-kernel path (make_pipeline_kernel) — must produce
    the same detector input volume at GEN1-style geometry (input > sensor,
    nearest-resize after encoding: generate_eventvolume.py:143-149 branch).
    This gates the gen1_taf_packed / gen1_taf_kernel bench A/B rows: a
    throughput win only counts if the volume is the same."""
    h, w = 60, 72          # mini gen1 sensor (W*2K = 1152 = 9*128 lanes)
    in_hw = (64, 96)
    B, E = 2, 1024
    plain = bench.make_pipeline(None, None, (h, w), in_hw, "mxu",
                                fused=False)
    packed = bench.make_pipeline_packed(None, None, (h, w), in_hw,
                                        scatter="xla")
    kernel = bench.make_pipeline_kernel(None, None, (h, w), in_hw,
                                        scatter="pallas")
    s_plain = jnp.full((B, h, w, 2, bench.K), -6000.0, jnp.float32)
    s_packed = jnp.full((B, h, w, 2 * bench.K), -6000.0, jnp.float32)
    s_kernel = jnp.full((B, h, w * 2 * bench.K), -6000.0, jnp.float32)
    ev, nv = bench.synth_events(np.random.default_rng(0), 3, B, E, (h, w))
    for i in range(3):
        s_plain, v_plain = plain.stages["encode_transform"](
            s_plain, ev[i], nv[i])
        s_packed, v_packed = packed.stages["encode_transform"](
            s_packed, ev[i], nv[i])
        s_kernel, v_kernel = kernel.stages["encode_transform"](
            s_kernel, ev[i], nv[i])
        assert v_packed.shape == v_plain.shape == v_kernel.shape \
            == (B, *in_hw, 2 * bench.K)
        np.testing.assert_allclose(np.asarray(v_packed, np.float32),
                                   np.asarray(v_plain, np.float32),
                                   atol=2e-2, err_msg=f"packed step {i}")
        np.testing.assert_allclose(np.asarray(v_kernel, np.float32),
                                   np.asarray(v_plain, np.float32),
                                   atol=2e-2, err_msg=f"kernel step {i}")


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


def test_validate_args_gate():
    """The arg x config compatibility gate: int8 on the kernel flagship must
    pass (the 3299.6 w/s headline — the int8 auto-split must not trip the
    --fused guard), while mislabeling combos raise."""
    import pytest

    def parse(*argv):
        return bench.make_parser().parse_args(list(argv))

    # the headline int8 path: auto-split happens, no guard trip
    a = parse("--config", "gen1_taf", "--dtype", "int8")
    cfg = bench.validate_args(a)
    assert cfg.get("kernel") and a.fused == "off" and a.nms == "fixpoint"

    # dense config keeps the auto-split too
    a = parse("--config", "gen1_taf_dense", "--dtype", "int8")
    bench.validate_args(a)
    assert a.fused == "off"

    # explicit --fused on a kernel/p64 pipeline is rejected
    with pytest.raises(SystemExit):
        bench.validate_args(parse("--config", "gen1_taf", "--fused", "on"))
    with pytest.raises(SystemExit):
        bench.validate_args(parse("--config", "gen4_taf", "--fused", "off"))
    # inapplicable flags are rejected, not ignored
    with pytest.raises(SystemExit):
        bench.validate_args(parse("--config", "gen1_sae", "--scatter",
                                  "sorted"))
    with pytest.raises(SystemExit):
        bench.validate_args(parse("--config", "gen1_train", "--nms",
                                  "sequential"))
    with pytest.raises(SystemExit):
        bench.validate_args(parse("--config", "gen1_train", "--dtype",
                                  "int8"))
    with pytest.raises(SystemExit):
        bench.validate_args(parse("--config", "gen1_taf", "--p64"))
    # train levers pass through on train configs
    a = parse("--config", "gen1_train", "--rng", "rbg", "--p64")
    assert bench.validate_args(a).get("train")
    # the alias can never fork from the flagship
    assert bench.CONFIGS["gen1_taf_kernel"] is bench.CONFIGS["gen1_taf"]
