"""End-to-end dress rehearsal: .dat → TAF encode (resume logic) → checkpoint
import → eval → mAP via tools/dress_rehearsal.py (VERDICT r1 #5)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from fixtures import INPUT_HW, SENSOR_HW, build_mini_gen1

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dress_rehearsal_cli(tmp_path):
    paths = build_mini_gen1(str(tmp_path), splits=("test",))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dress_rehearsal.py"),
         "-raw_dir", paths["events"], "-label_dir", paths["labels"],
         "-dataset", "gen1", "-split", "test",
         "-sensor_hw", f"{SENSOR_HW[0]},{SENSOR_HW[1]}",
         "-input_hw", f"{INPUT_HW[0]},{INPUT_HW[1]}",
         "-eval_filter", "none"],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["windows"] == 6          # 2 streams x 3 annotations
    assert result["streams"] == 2
    assert 0.0 <= result["value"] <= 1.0   # random init: pipeline smoke


def test_dress_rehearsal_blob_dir_mode(tmp_path):
    """-blob_dir consumes a precomputed blob tree in the reference layout
    (no raw events needed) and produces the same windows/streams counts
    (VERDICT r2 next #10)."""
    paths = build_mini_gen1(str(tmp_path), splits=("test",))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dress_rehearsal.py"),
         "-blob_dir", paths["taf_dir"], "-label_dir", paths["labels"],
         "-dataset", "gen1", "-split", "test",
         "-sensor_hw", f"{SENSOR_HW[0]},{SENSOR_HW[1]}",
         "-input_hw", f"{INPUT_HW[0]},{INPUT_HW[1]}",
         "-eval_filter", "none"],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["windows"] == 6 and result["streams"] == 2
    assert 0.0 <= result["value"] <= 1.0


def test_dress_rehearsal_encode_matches_dataset_blobs(tmp_path):
    """The tool's streaming TAF encode equals the fixture's dataset blobs
    (both replicate generate_taf.py's resume window logic)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from dress_rehearsal import encode_stream_taf
    finally:
        sys.path.pop(0)

    paths = build_mini_gen1(str(tmp_path), splits=("test",))
    stream = "seq0"
    event_path = os.path.join(paths["events"], "test", f"{stream}_td.dat")
    bbox_path = os.path.join(paths["labels"], "test", f"{stream}_bbox.npy")
    from frlw_evd_tpu.events.npy_codec import load_bboxes

    ann_times = np.unique(load_bboxes(bbox_path)["t"])
    for t_ann, blob in encode_stream_taf(event_path, ann_times, SENSOR_HW,
                                         INPUT_HW, 10_000, 8):
        b4 = np.fromfile(os.path.join(paths["taf_dir"], "test", "bins4",
                                      f"{stream}_{t_ann}.npy"),
                         np.uint8).reshape(8, *INPUT_HW)
        b8 = np.fromfile(os.path.join(paths["taf_dir"], "test", "bins8",
                                      f"{stream}_{t_ann}.npy"),
                         np.uint8).reshape(8, *INPUT_HW)
        want = np.concatenate([b4, b8], axis=0)
        np.testing.assert_array_equal(blob, want, err_msg=str(t_ann))
