"""Fixture tests for the offline analysis tail (VERDICT r1 #8):
sampling_dataset round-trip, optical-flow generation, the motion-level
statistics/evaluation chain, the psee_evaluator folder CLI, visualization
PNG rendering, and stream_infer on a fixture .dat.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fixtures import INPUT_HW, SENSOR_HW, build_mini_gen1

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")


def _run(script, *args, cwd=None, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, os.path.join(TOOLS, script),
                          *args], capture_output=True, text=True, env=env,
                         cwd=cwd or REPO, timeout=timeout)
    assert out.returncode == 0, f"{script}: {out.stderr[-3000:]}"
    return out


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_gen1")
    paths = build_mini_gen1(str(root), splits=("test",))
    return paths


def test_sampling_dataset_roundtrip(mini, tmp_path):
    """Sampled .dat + bbox re-parse identically (reference
    sampling_dataset.py:30-118 semantics)."""
    from frlw_evd_tpu.events import PSEELoader
    from frlw_evd_tpu.events.npy_codec import load_bboxes

    # the mini fixture keeps labels in a separate dir; the 1MEGAPIXEL layout
    # expects them next to the events — build that layout
    merged = tmp_path / "merged"
    (merged / "test").mkdir(parents=True)
    for f in os.listdir(os.path.join(mini["events"], "test")):
        os.symlink(os.path.join(mini["events"], "test", f),
                   merged / "test" / f)
    for f in os.listdir(os.path.join(mini["labels"], "test")):
        os.symlink(os.path.join(mini["labels"], "test", f),
                   merged / "test" / f)

    target = tmp_path / "sampled"
    _run("sampling_dataset.py", "-raw_dir", str(merged),
         "-target_dir", str(target), "-sampling_period", "100000",
         "-height", str(SENSOR_HW[0]), "-width", str(SENSOR_HW[1]))

    out_dat = target / "test" / "seq0_td.dat"
    out_bbox = target / "test" / "seq0_bbox.npy"
    assert out_dat.exists() and out_bbox.exists()
    loader = PSEELoader(str(out_dat))
    ev = loader.load_n_events(loader.event_count())
    assert len(ev) > 1000
    assert (np.diff(ev["ts"].astype(np.int64)) >= 0).all()
    assert ev["x"].max() < SENSOR_HW[1] and ev["y"].max() < SENSOR_HW[0]
    boxes = load_bboxes(str(out_bbox))
    # all three fixture annotations are > 0.5 s and >= 0.1 s apart → sampled
    assert len(np.unique(boxes["t"])) == 3


@pytest.fixture(scope="module")
def flow_dir(mini, tmp_path_factory):
    out = tmp_path_factory.mktemp("flow")
    _run("generate_opticalflow.py", "-raw_dir", mini["events"],
         "-label_dir", mini["labels"], "-dataset", "gen1_mini",
         "-out_dir", str(out))
    return str(out)


def test_generate_opticalflow(flow_dir):
    files = sorted(os.listdir(flow_dir))
    assert len(files) == 6              # 2 streams x 3 annotations
    flow = np.load(os.path.join(flow_dir, files[0]))
    assert flow.shape == (*SENSOR_HW, 2)
    assert np.isfinite(flow).all()


@pytest.fixture(scope="module")
def merged_raw(mini, tmp_path_factory):
    """events+labels in one dir (the layout the motion tools expect)."""
    merged = tmp_path_factory.mktemp("merged_raw")
    (merged / "test").mkdir(parents=True, exist_ok=True)
    for src_dir in (os.path.join(mini["events"], "test"),
                    os.path.join(mini["labels"], "test")):
        for f in os.listdir(src_dir):
            os.symlink(os.path.join(src_dir, f), merged / "test" / f)
    return str(merged)


@pytest.mark.slow
def test_motion_level_chain(mini, flow_dir, merged_raw, tmp_path_factory):
    """gt stats → recorded detections → dt stats → stratified mAP."""
    work = tmp_path_factory.mktemp("motion")
    stats_dir = work / "stats"
    log_path = work / "log"
    exp = "mini_exp"
    (log_path / exp).mkdir(parents=True)

    _run("motion_level_statistics_gt.py", "-raw_dir", merged_raw,
         "-dataset", "gen1_mini", "-flow_dir", flow_dir,
         "-out_dir", str(stats_dir))
    gt_npz = np.load(stats_dir / "gt_gen1_mini.npz")
    assert len(gt_npz["densitys"]) > 0
    assert len(gt_npz["gts"]) == len(gt_npz["densitys"])

    # record perfect detections as a summarise.npz (Recorder schema)
    from frlw_evd_tpu.evaluate.evaluator import Recorder
    from frlw_evd_tpu.events.npy_codec import load_bboxes

    rec = Recorder(str(log_path / exp))
    for stream in ("seq0", "seq1"):
        boxes = load_bboxes(os.path.join(mini["labels"], "test",
                                         f"{stream}_bbox.npy"))
        dt = np.zeros((len(boxes), 8))
        dt[:, 0] = boxes["t"]
        dt[:, 1] = boxes["x"]
        dt[:, 2] = boxes["y"]
        dt[:, 3] = boxes["w"]
        dt[:, 4] = boxes["h"]
        dt[:, 5] = boxes["class_id"]
        dt[:, 7] = 0.95
        rec.record(dt, stream)
    rec.save()

    _run("motion_level_statistics_dt.py", "-raw_dir", merged_raw,
         "-dataset", "gen1_mini", "-exp_name", exp,
         "-log_path", str(log_path) + "/", "-flow_dir", flow_dir)
    dt_npz = np.load(log_path / exp / "summarise_stats.npz")
    assert len(dt_npz["densitys"]) > 0

    out = _run("motion_level_evaluation.py", "-dataset", "gen1_mini",
               "-exp_name", exp, "-log_path", str(log_path) + "/",
               "-stats_dir", str(stats_dir))
    # last printed line is the 5-quintile mAP list
    line = [l for l in out.stdout.splitlines() if l.startswith("[")][-1]
    vals = eval(line, {"nan": float("nan")})
    assert len(vals) == 5
    finite = [v for v in vals if v == v]
    assert finite, "no quintile produced a finite mAP"
    assert all(v > 0.5 for v in finite)   # perfect detections


def test_psee_evaluator_cli(mini, tmp_path):
    """Folder-vs-folder mAP CLI on BBOX_DTYPE .npy files."""
    from frlw_evd_tpu.evaluate.psee_evaluator import evaluate_folders
    from frlw_evd_tpu.events.box_loading import BBOX_DTYPE
    from frlw_evd_tpu.events.npy_codec import load_bboxes

    gt_dir = tmp_path / "gt"
    dt_dir = tmp_path / "dt"
    gt_dir.mkdir()
    dt_dir.mkdir()
    for stream in ("seq0", "seq1"):
        src = os.path.join(mini["labels"], "test", f"{stream}_bbox.npy")
        boxes = load_bboxes(src)
        # scale boxes up so the gen1 size filter keeps them
        big = boxes.copy()
        big["w"] *= 4
        big["h"] *= 4
        np.save(gt_dir / f"{stream}_bbox.npy", big)
        dt = big.copy()
        dt["class_confidence"] = 0.9
        np.save(dt_dir / f"{stream}_bbox.npy", dt)
    stats = evaluate_folders(str(dt_dir), str(gt_dir), time_tol=4999,
                             dataset="gen1")
    assert stats[0] > 0.95


def test_visualization_smoke(mini, flow_dir, tmp_path):
    """Representation + boxes + flow render to PNGs."""
    out_dir = tmp_path / "viz"
    r = _run("visualization.py", "-item", "seq0", "-end", "600000",
             "-data_path", mini["taf_dir"], "-bbox_path", mini["labels"],
             "-dataset", "gen1_mini", "-event_type", "taf",
             "-result_path", str(out_dir), "-flow_dir", flow_dir)
    png = out_dir / "seq0_600000_taf.png"
    flow_png = out_dir / "seq0_600000_flow.png"
    assert png.exists(), r.stdout
    assert flow_png.exists()
    import cv2

    img = cv2.imread(str(png))
    assert img is not None and img.shape == (*SENSOR_HW, 3)


@pytest.mark.slow
def test_stream_infer_on_fixture_dat(mini, tmp_path):
    """Streaming encode→detect CLI over a fixture .dat (random init)."""
    out = tmp_path / "dets.npz"
    r = _run("stream_infer.py", "-event_file",
             os.path.join(mini["events"], "test", "seq0_td.dat"),
             "-dataset", "gen1_mini", "-max_windows", "3",
             "-out", str(out), timeout=900)
    assert out.exists(), r.stdout[-2000:]
    dump = np.load(out, allow_pickle=True)
    assert "dts" in dump and "file_names" in dump
