"""Event I/O round-trip and seek-semantics tests on synthetic streams."""

import numpy as np
import pytest

from frlw_evd_tpu.events import (
    BBOX_DTYPE,
    PSEELoader,
    boxes_to_array,
    count_events,
    load_td_data,
    pack_events,
    reformat_boxes,
    unpack_events,
)
from frlw_evd_tpu.events.dat_codec import write_dat_file
from frlw_evd_tpu.events.npy_codec import load_bboxes, parse_npy_header


def synthetic_events(rng, n=5000, height=240, width=304, t_max=1_000_000):
    ts = np.sort(rng.integers(0, t_max, n).astype(np.uint32))
    x = rng.integers(0, width, n).astype(np.uint16)
    y = rng.integers(0, height, n).astype(np.uint16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    ev = np.empty(n, dtype=[("ts", "u4"), ("x", "u2"), ("y", "u2"), ("p", "u1")])
    ev["ts"], ev["x"], ev["y"], ev["p"] = ts, x, y, p
    return ev


def test_pack_unpack_roundtrip(rng):
    ev = synthetic_events(rng)
    packed = pack_events(ev["ts"], ev["x"], ev["y"], ev["p"])
    dec = unpack_events(packed)
    np.testing.assert_array_equal(dec["ts"], ev["ts"])
    np.testing.assert_array_equal(dec["x"], ev["x"])
    np.testing.assert_array_equal(dec["y"], ev["y"])
    np.testing.assert_array_equal(dec["p"], ev["p"])


def test_dat_file_roundtrip(tmp_path, rng):
    ev = synthetic_events(rng, n=1234)
    path = str(tmp_path / "seq_td.dat")
    write_dat_file(path, ev, height=240, width=304)
    assert count_events(path) == 1234
    loaded = load_td_data(path)
    np.testing.assert_array_equal(loaded["ts"], ev["ts"])
    np.testing.assert_array_equal(loaded["x"], ev["x"])
    np.testing.assert_array_equal(loaded["p"], ev["p"])


@pytest.fixture
def dat_path(tmp_path, rng):
    ev = synthetic_events(rng, n=20000, t_max=2_000_000)
    path = str(tmp_path / "seq_td.dat")
    write_dat_file(path, ev, height=240, width=304)
    return path, ev


def test_loader_header(dat_path):
    path, ev = dat_path
    ld = PSEELoader(path)
    assert ld.event_count() == len(ev)
    assert ld.get_size() == (240, 304)
    assert ld.total_time() == ev["ts"][-1]


def test_load_n_events(dat_path):
    path, ev = dat_path
    ld = PSEELoader(path)
    got = ld.load_n_events(100)
    np.testing.assert_array_equal(got["ts"], ev["ts"][:100])
    # current_time = timestamp of the first unloaded event
    assert ld.current_time == ev["ts"][100]
    got2 = ld.load_n_events(50)
    np.testing.assert_array_equal(got2["x"], ev["x"][100:150])


def test_load_past_end(dat_path):
    path, ev = dat_path
    ld = PSEELoader(path)
    got = ld.load_n_events(10 * len(ev))
    assert len(got) == len(ev)
    assert ld.done
    assert ld.current_time == ev["ts"][-1] + 1


def test_seek_time_exact(dat_path):
    path, ev = dat_path
    ld = PSEELoader(path)
    target = int(ev["ts"][len(ev) // 2])
    idx = ld.seek_time(target, term_criterion=16)
    # index = first event with ts >= target
    expected = int(np.searchsorted(ev["ts"], target))
    assert idx == expected
    nxt = ld.load_n_events(1)
    assert nxt["ts"][0] >= target


def test_seek_time_past_end(dat_path):
    path, ev = dat_path
    ld = PSEELoader(path)
    assert ld.seek_time(int(ev["ts"][-1]) + 10) is None
    assert ld.done


def test_load_delta_t(dat_path):
    path, ev = dat_path
    ld = PSEELoader(path)
    window = ld.load_delta_t(500_000)
    expected = ev[ev["ts"] < 500_000]
    np.testing.assert_array_equal(window["ts"], expected["ts"])
    assert ld.current_time == 500_000
    window2 = ld.load_delta_t(500_000)
    expected2 = ev[(ev["ts"] >= 500_000) & (ev["ts"] < 1_000_000)]
    np.testing.assert_array_equal(window2["ts"], expected2["ts"])


def test_seek_then_window(dat_path):
    """The encoder access pattern: seek_time + load_delta_t reproduces a slice."""
    path, ev = dat_path
    ld = PSEELoader(path)
    end_time = int(ev["ts"][len(ev) * 3 // 4])
    start_time = end_time - 250_000
    ld.seek_time(start_time)
    window = ld.load_delta_t(end_time - start_time)
    expected = ev[(ev["ts"] >= start_time) & (ev["ts"] < end_time)]
    np.testing.assert_array_equal(window["ts"], expected["ts"])


def test_npy_bbox_roundtrip(tmp_path, rng):
    boxes = np.zeros(7, dtype=BBOX_DTYPE)
    boxes["t"] = np.sort(rng.integers(0, 10_000_000, 7))
    boxes["x"] = rng.uniform(0, 300, 7).astype(np.float32)
    boxes["y"] = rng.uniform(0, 230, 7).astype(np.float32)
    boxes["w"] = rng.uniform(5, 60, 7).astype(np.float32)
    boxes["h"] = rng.uniform(5, 60, 7).astype(np.float32)
    boxes["class_id"] = rng.integers(0, 2, 7)
    path = tmp_path / "seq_bbox.npy"
    np.save(path, boxes)
    loaded = load_bboxes(str(path))
    np.testing.assert_array_equal(loaded["t"], boxes["t"])
    np.testing.assert_allclose(loaded["w"], boxes["w"])
    arr = boxes_to_array(loaded)
    assert arr.shape == (7, 8)
    np.testing.assert_allclose(arr[:, 3], boxes["w"], rtol=1e-6)


def test_npy_loader_class(tmp_path, rng):
    boxes = np.zeros(5, dtype=BBOX_DTYPE)
    boxes["t"] = np.arange(5) * 1000
    path = str(tmp_path / "seq_bbox.npy")
    np.save(path, boxes)
    ld = PSEELoader(path)
    assert ld.event_count() == 5
    got = ld.load_n_events(3)
    np.testing.assert_array_equal(got["t"], [0, 1000, 2000])


def test_reformat_boxes():
    legacy = np.zeros(3, dtype=[("ts", "<i8"), ("x", "<f4"), ("y", "<f4"),
                                ("w", "<f4"), ("h", "<f4"), ("class_id", "<u4"),
                                ("track_id", "<u4"), ("confidence", "<f4")])
    legacy["ts"] = [1, 2, 3]
    legacy["confidence"] = [0.5, 0.6, 0.7]
    out = reformat_boxes(legacy)
    assert out.dtype == BBOX_DTYPE
    np.testing.assert_array_equal(out["t"], [1, 2, 3])
    np.testing.assert_allclose(out["class_confidence"], [0.5, 0.6, 0.7])
