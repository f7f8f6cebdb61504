"""Golden tests: the offline generator CLIs reproduce the oracle-encoded
blobs bit-for-bit (modulo uint8 rounding at bin boundaries) on the synthetic
mini dataset."""

import os
import subprocess
import sys

import numpy as np
import pytest

import fixtures

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_gen")
    paths = fixtures.build_mini_gen1(str(root), streams=("seq0",),
                                    splits=("test",),
                                    ann_times=(600_000, 700_000))
    return str(root), paths


def run_tool(script, raw_dir, label_dir, target_dir, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    # tools read geometry from the dataset flag; patch in mini geometry
    code = f"""
import sys
sys.path.insert(0, {REPO + "/tools"!r})
sys.argv = [{script!r}, "-raw_dir", {raw_dir!r}, "-label_dir", {label_dir!r},
            "-target_dir", {target_dir!r}, "-dataset", "gen1"]
import generate_common
generate_common.GEOMETRY["gen1"] = dict(shape={fixtures.SENSOR_HW!r},
                                        target_shape={fixtures.INPUT_HW!r})
import jax
jax.config.update("jax_platforms", "cpu")
import {script} as tool
tool.main()
"""
    result = subprocess.run([sys.executable, "-c", code], env=env,
                            capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr[-2000:]
    return result


def test_event_volume_generator_matches_oracle(mini, tmp_path):
    root, paths = mini
    out = str(tmp_path / "gen")
    run_tool("generate_eventvolume", paths["events"], paths["labels"], out)
    for ts in (600_000, 700_000):
        produced = np.fromfile(
            os.path.join(out, "EventVolume250000", "test", f"seq0_{ts}.npy"),
            dtype=np.uint8)
        golden = np.fromfile(
            os.path.join(paths["ev_dir"], "test", f"seq0_{ts}.npy"),
            dtype=np.uint8)
        assert produced.shape == golden.shape
        # float32 scatter order may flip a value across a uint8 boundary
        diff = np.abs(produced.astype(int) - golden.astype(int))
        assert (diff > 1).mean() < 1e-4, f"ts={ts}: {(diff > 1).mean()}"


def test_taf_generator_matches_oracle(mini, tmp_path):
    root, paths = mini
    out = str(tmp_path / "gen")
    run_tool("generate_taf", paths["events"], paths["labels"], out)
    for ts in (600_000, 700_000):
        for bins in ("bins4", "bins8"):
            produced = np.fromfile(
                os.path.join(out, "taf", "test", bins, f"seq0_{ts}.npy"),
                dtype=np.uint8)
            golden = np.fromfile(
                os.path.join(paths["taf_dir"], "test", bins, f"seq0_{ts}.npy"),
                dtype=np.uint8)
            assert produced.shape == golden.shape
            diff = np.abs(produced.astype(int) - golden.astype(int))
            assert (diff > 1).mean() < 1e-3, \
                f"{bins} ts={ts}: {(diff > 1).mean()}"
