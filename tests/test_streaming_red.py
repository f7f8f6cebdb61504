"""Tests: MXU-matmul scatter, streaming encoders, fetcher, RED family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frlw_evd_tpu.encode import oracle
from frlw_evd_tpu.encode.mxu_scatter import scatter_add_mxu, scatter_cnt_tsum_mxu
from frlw_evd_tpu.encode.streaming import (
    ev_init_state,
    event_frame_stream,
    event_volume_stream,
    sae_stream,
    taf_stream_step,
)
from frlw_evd_tpu.data.fetcher import Fetcher, FetcherTrain
from frlw_evd_tpu.models.red import (
    REDDetector,
    assign_priors,
    build_priors,
    center_to_corner,
    hard_negative_mining,
    locations_to_boxes,
    boxes_to_locations,
    red_eval_decode,
    red_loss,
)

H, W = 48, 64


def make_events_batch(rng, B, E, t_lo=0.0, t_hi=1.0):
    ev = np.zeros((B, E, 4), np.float32)
    ev[..., 0] = rng.integers(0, W, (B, E))
    ev[..., 1] = rng.integers(0, H, (B, E))
    ev[..., 2] = np.sort(rng.uniform(t_lo, t_hi, (B, E)), axis=1)
    ev[..., 3] = rng.integers(0, 2, (B, E))
    return ev


# ---------------------------------------------------------------------------
# mxu scatter
# ---------------------------------------------------------------------------

def test_mxu_scatter_matches_numpy(rng):
    size = 2000
    idx = rng.integers(0, size, 1500).astype(np.int32)
    vals = rng.uniform(-2, 2, 1500).astype(np.float32)
    out = np.asarray(scatter_add_mxu(jnp.asarray(idx), jnp.asarray(vals), size))
    ref = np.zeros(size)
    np.add.at(ref, idx, vals)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_mxu_cnt_tsum(rng):
    size = 1000
    idx = rng.integers(0, size, 700).astype(np.int32)
    tv = rng.uniform(-1, 0, 700).astype(np.float32)
    valid = rng.random(700) < 0.8
    cnt, tsum = scatter_cnt_tsum_mxu(jnp.asarray(idx), jnp.asarray(tv),
                                     jnp.asarray(valid), size)
    cnt_ref = np.zeros(size); np.add.at(cnt_ref, idx[valid], 1.0)
    ts_ref = np.zeros(size); np.add.at(ts_ref, idx[valid], tv[valid])
    np.testing.assert_allclose(np.asarray(cnt), cnt_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tsum), ts_ref, atol=1e-4)


def _cnt_tsum_ref(idx, tv, valid, size):
    cnt = np.zeros((len(idx), size))
    ts = np.zeros((len(idx), size))
    for b in range(len(idx)):
        m = valid[b] & (idx[b] >= 0) & (idx[b] < size)
        np.add.at(cnt[b], idx[b][m], 1.0)
        np.add.at(ts[b], idx[b][m], tv[b][m])
    return cnt, ts


def test_sorted_scatter_matches_numpy(rng):
    """scatter_cnt_tsum_sorted across distributions, incl. the chunk-span
    overflow fallback (events striped across the whole grid so every sorted
    512-event chunk spans far more than Δ=128 hi rows)."""
    from frlw_evd_tpu.encode.mxu_scatter import scatter_cnt_tsum_sorted

    size = 40_000                      # ~313 hi rows of 128
    B, E = 3, 2100                     # E not a multiple of the 512 chunk
    cases = {
        "uniform": rng.integers(0, size, (B, E)),
        "one_cell": np.full((B, E), 12345),
        "striped": (np.arange(B * E).reshape(B, E) * 997) % size,
        "low_band": rng.integers(0, 300, (B, E)),
    }
    for name, idx in cases.items():
        idx = idx.astype(np.int32)
        tv = rng.uniform(-1, 0, (B, E)).astype(np.float32)
        valid = rng.random((B, E)) < 0.9
        for precise in (True, False):
            cnt, tsum = scatter_cnt_tsum_sorted(
                jnp.asarray(idx), jnp.asarray(tv), jnp.asarray(valid),
                size, precise)
            cnt_ref, ts_ref = _cnt_tsum_ref(idx, tv * valid, valid, size)
            np.testing.assert_allclose(np.asarray(cnt), cnt_ref, atol=1e-6,
                                       err_msg=f"{name} cnt")
            atol, rtol = (1e-3, 0) if precise else (2e-2, 5e-3)
            np.testing.assert_allclose(np.asarray(tsum), ts_ref, atol=atol,
                                       rtol=rtol,
                                       err_msg=f"{name} precise={precise}")


def test_sorted_scatter_empty_and_oob(rng):
    from frlw_evd_tpu.encode.mxu_scatter import scatter_cnt_tsum_sorted

    size = 5000
    idx = rng.integers(-100, size + 100, (2, 600)).astype(np.int32)
    tv = rng.uniform(-1, 0, (2, 600)).astype(np.float32)
    valid = np.zeros((2, 600), bool)
    valid[0] = rng.random(600) < 0.5   # stream 1 entirely invalid
    cnt, tsum = scatter_cnt_tsum_sorted(jnp.asarray(idx), jnp.asarray(tv),
                                        jnp.asarray(valid), size)
    cnt_ref, ts_ref = _cnt_tsum_ref(idx, tv * valid, valid, size)
    np.testing.assert_allclose(np.asarray(cnt), cnt_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tsum), ts_ref, atol=1e-3)
    assert np.asarray(cnt)[1].sum() == 0


def test_taf_stream_sorted_matches_mxu(rng):
    B, E, K = 2, 700, 8
    ev = make_events_batch(rng, B, E)
    state = jnp.full((B, H, W, 2, K), -6000.0, jnp.float32)
    nv = jnp.asarray([E, E - 300], jnp.int32)
    ref = taf_stream_step(state, jnp.asarray(ev), nv, use_mxu=False)
    out = taf_stream_step(state, jnp.asarray(ev), nv, use_sorted=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


# ---------------------------------------------------------------------------
# streaming encoders
# ---------------------------------------------------------------------------

def test_taf_stream_matches_oracle(rng):
    B, E, K = 2, 500, 8
    ev = make_events_batch(rng, B, E)
    state = jnp.full((B, H, W, 2, K), -6000.0, jnp.float32)
    nv = jnp.full(B, E, jnp.int32)
    for use_mxu in (False, True):
        s = taf_stream_step(state, jnp.asarray(ev), nv, use_mxu=use_mxu)
        for b in range(B):
            ref = oracle.taf_bin(ev[b], (H, W), oracle.taf_init_state((H, W), K))
            np.testing.assert_allclose(np.asarray(s[b]), ref, atol=2e-3)


def test_event_volume_stream_first_window(rng):
    """First call = full-window splat with the 0-based bin grid of
    data/sparse_ops.py:17 (the streaming path deliberately differs from the
    offline generator's 1-based grid, generate_eventvolume.py:27)."""
    B, E = 2, 800
    window = 50_000
    ev = make_events_batch(rng, B, E, 0, window)
    out, state = event_volume_stream(jnp.asarray(ev), jnp.full(B, E, jnp.int32),
                                     None, jnp.float32(window),
                                     height=H, width=W, bins=5,
                                     events_window=window, use_mxu=False)
    for b in range(B):
        ref = np.zeros((H, W, 5, 2), np.float32)
        t_star = 5 * ev[b, :, 2] / window
        for k in range(5):
            wgt = np.maximum(0.0, 1 - np.abs(k - t_star))
            for e in range(E):
                xi, yi, pi = int(ev[b, e, 0]), int(ev[b, e, 1]), int(ev[b, e, 3])
                ref[yi, xi, k, 1 - pi] += wgt[e]
        ref = ref.reshape(H, W, 10) / 5 * 255
        np.testing.assert_allclose(np.asarray(out[b]), ref, atol=2e-2)


def test_event_volume_stream_incremental_shifts(rng):
    """Second call shifts one bin: channel c of new vol = channel c+2 of a
    full recompute is NOT exact (incremental accumulates), but the oldest bin
    must drop and shapes stay put."""
    B, E = 1, 400
    window, infer = 50_000, 10_000
    ev0 = make_events_batch(rng, B, E, 0, window)
    out0, st = event_volume_stream(jnp.asarray(ev0), jnp.full(B, E, jnp.int32),
                                   None, jnp.float32(window), height=H,
                                   width=W, events_window=window,
                                   infer_time=infer, use_mxu=False)
    ev1 = make_events_batch(rng, B, E, window, window + infer)
    out1, st1 = event_volume_stream(jnp.asarray(ev1), jnp.full(B, E, jnp.int32),
                                    st, jnp.float32(window + infer), height=H,
                                    width=W, events_window=window,
                                    infer_time=infer, use_mxu=False)
    assert out1.shape == (B, H, W, 10)
    assert np.isfinite(np.asarray(out1)).all()


def test_event_frame_stream(rng):
    B, E = 2, 300
    ev = make_events_batch(rng, B, E)
    out, _ = event_frame_stream(jnp.asarray(ev), jnp.full(B, E, jnp.int32),
                                None, height=H, width=W)
    assert out.shape == (B, H, W, 2)
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({0.0, 255.0})
    np.testing.assert_array_equal(np.asarray(out[..., 0]),
                                  np.asarray(out[..., 1]))


def test_segment_last_unordered_and_overflow(rng):
    """segment_last_sorted keeps index_put_ last-WRITE semantics (stable
    sort: the later event in stream order wins even when timestamps are
    not monotone), and the banded overflow fallback path reproduces it on
    a striped index pattern where every sorted chunk spans the whole grid.
    """
    from frlw_evd_tpu.encode.mxu_scatter import (LANES, SORT_DELTA,
                                                 segment_last_sorted)

    B, E = 2, 2048
    for size, name in ((64 * LANES, "inband"),
                       ((SORT_DELTA * 40) * LANES, "overflow")):
        if name == "overflow":
            # striped: consecutive events land far apart so each sorted
            # chunk spans >> Δ hi rows and the fallback must fire
            idx = ((np.arange(B * E).reshape(B, E) * 7919) % size)
            idx = idx.astype(np.int32)
        else:
            idx = rng.integers(0, size, (B, E)).astype(np.int32)
        vals = rng.uniform(-100.0, 100.0, (B, E)).astype(np.float32)
        valid = rng.random((B, E)) < 0.9
        cnt_ref = np.zeros((B, size), np.float32)
        last_ref = np.zeros((B, size), np.float32)
        for b in range(B):
            for e in range(E):
                if valid[b, e]:
                    cnt_ref[b, idx[b, e]] += 1
                    last_ref[b, idx[b, e]] = vals[b, e]  # last write wins
        cnt, last = segment_last_sorted(jnp.asarray(idx), jnp.asarray(vals),
                                        jnp.asarray(valid), size)
        np.testing.assert_array_equal(np.asarray(cnt), cnt_ref, err_msg=name)
        got = np.where(cnt_ref > 0, np.asarray(last), 0.0)
        np.testing.assert_allclose(got, last_ref, rtol=2e-4, atol=2e-2,
                                   err_msg=name)


def test_sae_stream(rng):
    B, E = 2, 300
    now = 100_000.0
    ev = make_events_batch(rng, B, E, 0, now)
    out, mem = sae_stream(jnp.asarray(ev), jnp.full(B, E, jnp.int32), None,
                          jnp.float32(now), height=H, width=W)
    assert out.shape == (B, H, W, 6)
    assert mem.shape == (B, H, W, 2)
    ref, _ = oracle.sae(ev[0], (H, W), [1e-5, 2.5e-6, 1e-6], None, now)
    np.testing.assert_allclose(np.asarray(out[0]).transpose(2, 0, 1), ref,
                               rtol=1e-3, atol=1e-2)
    # the serial `.at[].max` A/B formulation (bench gen1_sae_max) must
    # produce the same surface as the sorted segment-last default, incl.
    # with a padded tail of invalid events and a carried memory
    out_m, mem_m = sae_stream(jnp.asarray(ev), jnp.full(B, E - 37, jnp.int32),
                              None, jnp.float32(now), height=H, width=W,
                              impl="max")
    out_s, mem_s = sae_stream(jnp.asarray(ev), jnp.full(B, E - 37, jnp.int32),
                              None, jnp.float32(now), height=H, width=W)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                               rtol=1e-3, atol=1e-2)
    out_m2, _ = sae_stream(jnp.asarray(ev), jnp.full(B, E, jnp.int32), mem_m,
                           jnp.float32(now + 10_000.0), height=H, width=W,
                           impl="max")
    out_s2, _ = sae_stream(jnp.asarray(ev), jnp.full(B, E, jnp.int32), mem_s,
                           jnp.float32(now + 10_000.0), height=H, width=W)
    np.testing.assert_allclose(np.asarray(out_m2), np.asarray(out_s2),
                               rtol=1e-3, atol=1e-2)


# ---------------------------------------------------------------------------
# fetcher
# ---------------------------------------------------------------------------

def test_fetcher_windows(rng):
    B, n = 1, 2000
    duration = 100_000
    events = np.zeros((n, 5), np.float32)
    events[:, 0] = 0
    events[:, 1] = rng.integers(0, W, n)
    events[:, 2] = rng.integers(0, H, n)
    events[:, 3] = np.sort(rng.integers(0, duration, n))
    events[:, 4] = rng.integers(0, 2, n)
    # labels: [batch, cx, cy, w, h, cls, t] — on-window timestamps (the
    # ±(infer_time/2 - 1) tolerance misses mid-window labels by design)
    labels = np.array([[0, 30, 20, 10, 10, 1, 60_000],
                       [0, 40, 25, 12, 12, 0, 70_000]], np.float32)
    timestamps = np.array([[0, duration]])

    captured = []

    def to_volume(ev, n_valid, state):
        captured.append((ev.copy(), n_valid))
        return np.zeros((1, H, W, 2)), state

    f = Fetcher(events, (H, W), labels, timestamps, ["s0"],
                events_window=50_000, event_volume_bins=5, infer_time=10_000,
                to_volume=to_volume, max_events=4096)
    # first window covers [0, 50ms): no label at 50ms ± 4999? 55_000 > 50_000+4999
    vol, lab, ts, names, rt = f.fetch()
    assert ts[0] == 50_000 and lab is None
    vol, lab, ts, names, rt = f.fetch()
    assert ts[0] == 60_000
    assert lab is not None and (lab[0].sum(1) > 0).sum() == 1  # label at 60k
    # window events: [50k, 60k)
    ev, nv = captured[1]
    tvals = ev[:nv, 3]
    assert (tvals >= 50_000).all() and (tvals < 60_000).all()
    # run to the end
    while not f.finish:
        f.fetch()
    assert f.iter >= duration


def test_fetcher_train_label_order(rng):
    events = np.zeros((10, 5), np.float32)
    events[:, 3] = np.arange(10) * 1000
    labels = np.array([[0, 30, 20, 10, 10, 1, 10_000]], np.float32)
    timestamps = np.array([[0, 20_000]])
    f = FetcherTrain(events, (H, W), labels, timestamps, ["s0"],
                     events_window=10_000, event_volume_bins=5,
                     infer_time=10_000,
                     to_volume=lambda e, n, s: (None, s), max_events=64)
    vol, lab, ts, names, rt = f.fetch()
    # train rows: [class, cx, cy, w, h]
    np.testing.assert_allclose(lab[0, 0], [1, 30, 20, 10, 10])


# ---------------------------------------------------------------------------
# RED
# ---------------------------------------------------------------------------

def test_priors_shape_and_range():
    from frlw_evd_tpu.models.red import pyramid_shapes
    priors = build_priors(256, 320)
    assert priors.shape[1] == 4
    assert (priors >= 0).all() and (priors <= 1).all()
    # boxes_per_location [6,6,6,4,4] over the actual pyramid maps
    maps = pyramid_shapes(256, 320)
    expected = sum(y * x * b for (y, x), b in zip(maps, (6, 6, 6, 4, 4)))
    assert priors.shape[0] == expected


def test_location_coding_roundtrip(rng):
    priors = jnp.asarray(build_priors(256, 320)[:50])
    boxes = priors * jnp.asarray([1.1, 0.9, 1.2, 0.8])
    locs = boxes_to_locations(boxes, priors)
    rec = locations_to_boxes(locs, priors)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), atol=1e-5)


def test_assign_priors_forces_best():
    priors_corner = center_to_corner(jnp.asarray(
        [[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.05, 0.05]]))
    gt = center_to_corner(jnp.asarray([[0.52, 0.52, 0.2, 0.2]]))
    boxes, labels = assign_priors(gt, jnp.asarray([1]), jnp.asarray([True]),
                                  priors_corner)
    assert int(labels[0]) == 1       # best prior forced positive
    assert int(labels[1]) == 0       # background


def test_hard_negative_mining():
    loss = jnp.asarray([[0.9, 0.8, 0.7, 0.6, 0.5, 0.4]])
    labels = jnp.asarray([[1, 0, 0, 0, 0, 0]])
    mask = hard_negative_mining(loss, labels, 3)
    # 1 positive → 3 negatives with the highest bg loss
    np.testing.assert_array_equal(np.asarray(mask[0]),
                                  [True, True, True, True, False, False])


@pytest.mark.slow
def test_red_forward_and_loss(rng):
    model = REDDetector(2)
    h, w = 128, 128
    x = jnp.asarray(rng.uniform(0, 1, (1, h, w, 10)).astype(np.float32))
    carries = model.init_carries(1, h, w)
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0), carries, x, False)
    carries, (cls_logits, bbox_pred) = jax.jit(
        lambda v, c, x: model.apply(v, c, x, False))(variables, carries, x)
    priors = build_priors(h, w)
    assert cls_logits.shape == (1, priors.shape[0], 3)
    assert bbox_pred.shape == (1, priors.shape[0], 4)

    labels = np.zeros((1, 80, 5), np.float32)
    labels[0, 0] = [0, 60, 60, 40, 40]
    losses = jax.jit(lambda c, b, l: red_loss(c, b, l, h, w, priors))(
        cls_logits, bbox_pred, jnp.asarray(labels))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    dec = jax.jit(lambda c, b: red_eval_decode(c, b, priors, h, w))(
        cls_logits, bbox_pred)
    assert dec.shape == (1, priors.shape[0], 7)


def test_taf_packed_matches_unpacked(rng):
    """taf_stream_step_packed == pack(taf_stream_step(unpack(...)))."""
    from frlw_evd_tpu.encode.streaming import (taf_pack_state,
                                               taf_stream_step_packed,
                                               taf_unpack_state)

    B, E, K = 2, 500, 8
    state = jnp.asarray(
        np.random.default_rng(1).uniform(-50, 0, (B, H, W, 2, K))
    ).astype(jnp.float32)
    packed = taf_pack_state(state)
    np.testing.assert_allclose(np.asarray(taf_unpack_state(packed, K)),
                               np.asarray(state))

    for step in range(3):
        ev = make_events_batch(rng, B, E)
        if step == 2:
            nv = jnp.zeros(B, jnp.int32)       # empty bin freezes state
        else:
            nv = jnp.full(B, E, jnp.int32)
        state = taf_stream_step(state, jnp.asarray(ev), nv, use_mxu=False)
        packed = taf_stream_step_packed(packed, jnp.asarray(ev), nv,
                                        scatter="xla")
        np.testing.assert_allclose(np.asarray(packed),
                                   np.asarray(taf_pack_state(state)),
                                   atol=1e-5, err_msg=f"step {step}")
