"""Differential parity against the reference's OWN code, executed on CPU.

VERDICT r1 item #2: every parity claim was previously validated against
builder-written oracles. Here the reference's actual torch implementations
(/root/reference: generate_taf.py, generate_eventvolume.py,
generate_eventcountimage.py, generate_surfaceofactiveevents.py,
data/sparse_ops.py, core/yolox/models/yolo_head.py) are imported under light
module stubs + a torch.cuda no-op patch and run on the same synthetic
fixtures as the numpy oracle (encode/oracle.py) and the jitted TPU encoders.
A shared misreading of the semantics is now detectable.

The reference tree is imported, never copied: these tests treat it as an
executable specification.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from frlw_evd_tpu.encode import oracle

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not mounted")


def _stub_module(name, **attrs):
    if name in sys.modules:
        return None
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return name


class _SilentLogger:
    def __getattr__(self, _):
        return lambda *a, **k: None


@pytest.fixture(scope="module")
def ref(request):
    """Import the reference modules with stubs for absent deps + CPU cuda."""
    added = []
    for name, attrs in [
        ("sqlalchemy", {"false": False}),
        ("loguru", {"logger": _SilentLogger()}),
        ("thop", {"profile": lambda *a, **k: (0.0, 0.0)}),
        ("torchvision", {"ops": types.SimpleNamespace(nms=None),
                         "__version__": "0.0-stub"}),
        ("turtle", {"forward": None}),
    ]:
        n = _stub_module(name, **attrs)
        if n:
            added.append(n)

    # timm.models.layers: only DropPath / trunc_normal_ are referenced
    if "timm" not in sys.modules:
        class _DropPath(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                return x

        layers = types.ModuleType("timm.models.layers")
        layers.DropPath = _DropPath
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        models = types.ModuleType("timm.models")
        models.layers = layers
        timm = types.ModuleType("timm")
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
        added += ["timm", "timm.models", "timm.models.layers"]

    mp = pytest.MonkeyPatch()
    mp.setattr(torch.cuda, "synchronize", lambda *a, **k: None, raising=False)
    mp.setattr(torch.cuda, "empty_cache", lambda *a, **k: None, raising=False)

    sys.path.insert(0, REF_ROOT)
    try:
        import generate_eventcountimage as ref_eci
        import generate_eventvolume as ref_ev
        import generate_surfaceofactiveevents as ref_sae
        import generate_taf as ref_taf
        from data import sparse_ops as ref_sparse
        from core.yolox.models.yolo_head import YOLOXHead as RefYOLOXHead
    except Exception as e:  # pragma: no cover - env-specific
        pytest.skip(f"reference import failed: {e!r}")

    def teardown():
        mp.undo()
        if REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
        for name in list(sys.modules):
            top = name.split(".")[0]
            if top in ("generate_eventcountimage", "generate_eventvolume",
                       "generate_surfaceofactiveevents", "generate_taf",
                       "data", "src", "core") and \
                    getattr(sys.modules[name], "__file__", "").startswith(REF_ROOT):
                del sys.modules[name]
        for name in added:
            sys.modules.pop(name, None)

    request.addfinalizer(teardown)
    return types.SimpleNamespace(
        eci=ref_eci, ev=ref_ev, sae=ref_sae, taf=ref_taf,
        sparse=ref_sparse, YOLOXHead=RefYOLOXHead)


H, W = 24, 32


def _events(rng, n, h=H, w=W, t_lo=0.0, t_hi=1.0, sort_t=True):
    ev = np.zeros((n, 4), np.float32)
    ev[:, 0] = rng.integers(0, w, n)
    ev[:, 1] = rng.integers(0, h, n)
    t = rng.uniform(t_lo, t_hi, n)
    ev[:, 2] = np.sort(t) if sort_t else t
    ev[:, 3] = rng.integers(0, 2, n)
    return ev


# ---------------------------------------------------------------------------
# Event Count Image
# ---------------------------------------------------------------------------

def test_count_image_matches_reference(ref, rng):
    from frlw_evd_tpu.encode.count_image import encode_count_image

    ev = _events(rng, 700)
    # hammer a few cells so the clamp engages (>20 events in one cell)
    ev[:60, 0], ev[:60, 1], ev[:60, 3] = 5, 7, 1

    t_ev = torch.from_numpy(ev)
    ref_img, _ = ref.eci.generate_eventframe(t_ev, (H, W))
    ref_img = ref_img.numpy()                       # (2, H, W)

    got_oracle = oracle.count_image(ev, (H, W))
    np.testing.assert_array_equal(got_oracle, ref_img)

    got_jax = np.asarray(encode_count_image(
        jnp.asarray(ev), jnp.int32(len(ev)), height=H, width=W))
    np.testing.assert_allclose(got_jax.transpose(2, 0, 1), ref_img, atol=1e-4)


# ---------------------------------------------------------------------------
# Event Volume (offline generator, 1-based bins)
# ---------------------------------------------------------------------------

def test_event_volume_matches_reference(ref, rng):
    from frlw_evd_tpu.encode.event_volume import encode_event_volume

    ev = _events(rng, 900)
    # exercise exact bin centres and the window edges
    ev[0, 2], ev[1, 2], ev[2, 2] = 0.0, 1.0, 0.2

    ref_img, _ = ref.ev.generate_agile_event_volume_cuda(
        torch.from_numpy(ev), (H, W), volume_bins=5)
    ref_img = ref_img.numpy()                       # (10, H, W), ch = 2*bin+pol

    got_oracle = oracle.event_volume(ev, (H, W), volume_bins=5)
    np.testing.assert_allclose(got_oracle, ref_img, atol=1e-4)

    got_jax = np.asarray(encode_event_volume(
        jnp.asarray(ev), jnp.int32(len(ev)), height=H, width=W, volume_bins=5))
    np.testing.assert_allclose(got_jax.transpose(2, 0, 1), ref_img, atol=1e-3)

    # uint8 disk blob: clip + truncate
    np.testing.assert_array_equal(oracle.to_uint8(got_oracle),
                                  np.where(ref_img > 255, 255,
                                           ref_img).astype(np.uint8))


# ---------------------------------------------------------------------------
# Surface of Active Events (memory chain)
# ---------------------------------------------------------------------------

def test_sae_matches_reference(ref, rng):
    from frlw_evd_tpu.encode.sae import encode_sae

    lamdas = [1e-5, 2.5e-6, 1e-6]
    memory_ref = None
    memory_oracle = None
    memory_jax = None
    now = 0.0
    for step in range(3):
        now += 100_000.0
        ev = _events(rng, 500, t_lo=now - 100_000, t_hi=now)
        # out-of-sensor events must be dropped (reference :72)
        ev[:10, 0] = W + rng.integers(0, 5, 10)

        ref_out, memory_ref, _ = ref.sae.generate_leaky_cuda(
            torch.from_numpy(ev.astype(np.float64)), (H, W), lamdas,
            memory_ref, now)
        ref_out = ref_out.numpy()                   # (6, H, W)

        got_oracle, memory_oracle = oracle.sae(ev, (H, W), lamdas,
                                               memory_oracle, now)
        np.testing.assert_allclose(got_oracle, ref_out, atol=2e-3)

        got_jax, memory_jax = encode_sae(
            jnp.asarray(ev), jnp.int32(len(ev)),
            memory_jax if memory_jax is not None
            else jnp.full((H, W, 2), now - 5_000_000.0, jnp.float32),
            jnp.float32(now), height=H, width=W, lamdas=tuple(lamdas))
        # jax keeps HWC with c = 2*lam + p; reference keeps (lam*2, H, W)
        got_jax_chw = np.asarray(got_jax).transpose(2, 0, 1)
        np.testing.assert_allclose(got_jax_chw, ref_out, atol=2e-3)
        # raw-timestamp memories identical
        np.testing.assert_allclose(memory_oracle, memory_ref.numpy(), atol=1.0)


# ---------------------------------------------------------------------------
# TAF queue (flagship): multi-window with resume
# ---------------------------------------------------------------------------

def _ref_taf_window(ref, events, start_time, end_time, bin_us, memory, K):
    """Drive the reference's own per-bin loop (generate_taf.py:199-222)."""
    import math

    ev = torch.from_numpy(events.astype(np.float64))
    z = torch.zeros_like(ev[:, 0])
    bins = math.ceil((end_time - start_time) / bin_us)
    for i in range(bins):
        z = torch.where((ev[:, 2] >= start_time + i * bin_us)
                        & (ev[:, 2] <= start_time + (i + 1) * bin_us),
                        torch.zeros_like(ev[:, 2]) + i, z)
    ev = torch.cat([ev, z[:, None]], dim=1)
    volume = None
    for it in range(bins):
        ev_ = ev[ev[..., 4] == it]
        t_max = start_time + (it + 1) * bin_us
        t_min = start_time + it * bin_us
        ev_ = ev_.clone()
        ev_[:, 2] = (ev_[:, 2] - t_min) / (t_max - t_min + 1e-8)
        volume, memory, _ = ref.taf.generate_taf_cuda(ev_, (H, W), memory, K)
    return volume.numpy(), memory


def test_taf_queue_matches_reference(ref, rng):
    from frlw_evd_tpu.encode.taf import (bucket_events_for_taf,
                                         encode_taf_window, taf_init_state,
                                         taf_state_to_volume)

    K, bin_us = 4, 10_000
    memory_ref = torch.zeros((H, W, 2, K), dtype=torch.float64) - 6000
    state_oracle = oracle.taf_init_state((H, W), K)
    state_jax = taf_init_state(H, W, K)

    t0 = 0
    for win in range(3):
        start, end = t0, t0 + K * bin_us
        n = int(rng.integers(300, 600))
        ev = _events(rng, n, t_lo=start, t_hi=end)
        if win == 1:
            # empty micro-bin inside the window: no events in [start, start+bin]
            ev[:, 2] = np.sort(rng.uniform(start + bin_us + 1, end, n))

        ref_vol, memory_ref = _ref_taf_window(ref, ev, start, end, bin_us,
                                              memory_ref, K)

        vol_oracle, state_oracle = oracle.taf_window(ev, (H, W), start, end,
                                                     bin_us, state_oracle)
        np.testing.assert_allclose(vol_oracle, ref_vol, atol=1e-5,
                                   err_msg=f"window {win} (oracle)")

        binned, bin_valid = bucket_events_for_taf(ev, start, end, bin_us, n)
        state_jax = encode_taf_window(state_jax, jnp.asarray(binned),
                                      jnp.asarray(bin_valid))
        ref_state = memory_ref.numpy()              # (H, W, 2, K)
        np.testing.assert_allclose(np.asarray(state_jax), ref_state,
                                   atol=1e-4, err_msg=f"window {win} (jax)")

        # uint8 blob parity: leaky + flip + bins{K/2}/bins{K} split
        t_vol = torch.from_numpy(ref_vol).view(K, 2, H, W)
        t_vol = ref.taf.leaky_transform(t_vol)
        ecd = np.flip(t_vol.numpy(), axis=0)
        ref_new = ecd[:K // 2].reshape(-1, H, W).astype(np.uint8)
        ref_old = ecd[K // 2:].reshape(-1, H, W).astype(np.uint8)
        blob_new, blob_old = oracle.taf_blob(vol_oracle, K)
        assert np.abs(blob_new.astype(int) - ref_new.astype(int)).max() <= 1
        assert np.abs(blob_old.astype(int) - ref_old.astype(int)).max() <= 1
        assert (blob_new != ref_new).mean() < 1e-3
        assert (blob_old != ref_old).mean() < 1e-3

        # jax network-input layout (newest first, c = 2*age + p)
        net = np.asarray(taf_state_to_volume(state_jax))   # (H, W, 2K)
        flat_ref = ecd.reshape(K * 2, H, W)                # newest first
        np.testing.assert_allclose(net.transpose(2, 0, 1), flat_ref,
                                   atol=0.51, err_msg=f"window {win} (net)")
        t0 = end


def test_taf_all_empty_bin_freezes_state(ref):
    """torch.all(forward) shortcut: an entirely-empty bin leaves the state
    untouched (no aging)."""
    K = 4
    memory = torch.rand((H, W, 2, K), dtype=torch.float64) * -5
    before = memory.clone()
    empty = torch.zeros((0, 5), dtype=torch.float64)
    # need the ref fixture only for semantics; build locally to avoid reimport
    sys.path.insert(0, REF_ROOT)
    try:
        import generate_taf as ref_taf
        _, after, _ = ref_taf.generate_taf_cuda(empty, (H, W), memory, K)
    finally:
        sys.path.remove(REF_ROOT)
    assert torch.equal(after, before)

    st = oracle.taf_bin(np.zeros((0, 4), np.float32), (H, W),
                        before.numpy().astype(np.float32))
    np.testing.assert_array_equal(st, before.numpy().astype(np.float32))


# ---------------------------------------------------------------------------
# Streaming sparse_ops variants
# ---------------------------------------------------------------------------

def test_streaming_event_volume_matches_sparse_ops(ref, rng):
    """First full-window call AND the incremental 2-channel update
    (sparse_ops.py:4-35) against event_volume_stream."""
    from frlw_evd_tpu.encode.streaming import event_volume_stream

    B, E = 2, 600
    window, infer, bins = 50_000, 10_000, 5

    def to_ref(ev_b, t_offset):
        """(B, E, 4) -> reference (N, 5) [b, x, y, t, p] with relative t."""
        rows = []
        for b in range(B):
            r = np.zeros((E, 5))
            r[:, 0] = b
            r[:, 1] = ev_b[b, :, 0]
            r[:, 2] = ev_b[b, :, 1]
            r[:, 3] = ev_b[b, :, 2] - t_offset
            r[:, 4] = ev_b[b, :, 3]
            rows.append(r)
        return torch.from_numpy(np.concatenate(rows))

    # window 1: full splat, t relative to stream start
    ev0 = np.stack([_events(rng, E, t_lo=0, t_hi=window) for _ in range(B)])
    ref_vol, ref_state = ref.sparse.generate_agile_event_volume_cuda(
        to_ref(ev0, 0), B, (H, W), window, None, window, bins, infer)
    got0, st = event_volume_stream(
        jnp.asarray(ev0), jnp.full(B, E, jnp.int32), None,
        jnp.float32(window), height=H, width=W, bins=bins,
        events_window=window, infer_time=infer, use_mxu=False)
    # ref: (B, 2*bins, H, W, 1) raw counts; repo: (B, H, W, 2*bins) /bins*255
    ref_hwc = ref_vol.numpy()[..., 0].transpose(0, 2, 3, 1) / bins * 255.0
    np.testing.assert_allclose(np.asarray(got0), ref_hwc, atol=1e-3,
                               err_msg="first window")

    # window 2: incremental shift; iter (= window end) passed per reference
    now = window + infer
    ev1 = np.stack([_events(rng, E, t_lo=window, t_hi=now) for _ in range(B)])
    ref_vol1, _ = ref.sparse.generate_agile_event_volume_cuda(
        to_ref(ev1, 0), B, (H, W), now, ref_state, window, bins, infer)
    got1, _ = event_volume_stream(
        jnp.asarray(ev1), jnp.full(B, E, jnp.int32), st, jnp.float32(now),
        height=H, width=W, bins=bins, events_window=window, infer_time=infer,
        use_mxu=False)
    ref_hwc1 = ref_vol1.numpy()[..., 0].transpose(0, 2, 3, 1) / bins * 255.0
    np.testing.assert_allclose(np.asarray(got1), ref_hwc1, atol=1e-3,
                               err_msg="incremental window")


def test_streaming_event_frame_matches_sparse_ops(ref, rng):
    from frlw_evd_tpu.encode.streaming import event_frame_stream

    B, E = 2, 400
    ev = np.stack([_events(rng, E) for _ in range(B)])
    rows = []
    for b in range(B):
        r = np.zeros((E, 5))
        r[:, 0] = b
        r[:, 1:5] = ev[b]
        rows.append(r)
    ref_img, _ = ref.sparse.generate_event_frame_cuda(
        torch.from_numpy(np.concatenate(rows)), B, (H, W), 0)
    # ref: (B, 2, H, W, 1)
    ref_hwc = ref_img.numpy()[..., 0].transpose(0, 2, 3, 1)
    got, _ = event_frame_stream(jnp.asarray(ev), jnp.full(B, E, jnp.int32),
                                None, height=H, width=W)
    np.testing.assert_array_equal(np.asarray(got), ref_hwc)


# ---------------------------------------------------------------------------
# SimOTA against the reference head
# ---------------------------------------------------------------------------

from fixtures import simota_cost_replica as _simota_cost_replica  # noqa: E402


def test_simota_gen1_scale_20_seeds(ref):
    """SimOTA parity at production anchor counts (6720 anchors = the
    512x640 grid), 20 seeds; every fg disagreement must sit ON the
    dynamic-k cost boundary of its gt (an exact tie-break artifact), not
    anywhere else (VERDICT r2 weak #4)."""
    from frlw_evd_tpu.models.assign import simota_assign
    from frlw_evd_tpu.models.heads import level_grids

    num_classes = 7
    radius = 2.5
    xs, ys, ss = level_grids([(64, 80), (32, 40), (16, 20)], [8, 16, 32])
    A = len(xs)
    assert A == 6720
    total_disagree = 0
    for seed in range(20):
        rng = np.random.default_rng(100 + seed)
        n_real = int(rng.integers(1, 40))
        G = 60
        gt_boxes = np.zeros((G, 4), np.float32)
        gt_boxes[:n_real, 0] = rng.uniform(20, 620, n_real)
        gt_boxes[:n_real, 1] = rng.uniform(20, 492, n_real)
        gt_boxes[:n_real, 2] = rng.uniform(10, 120, n_real)
        gt_boxes[:n_real, 3] = rng.uniform(10, 100, n_real)
        gt_classes = rng.integers(0, num_classes, G).astype(np.int32)
        gt_valid = np.arange(G) < n_real
        pred_boxes = np.zeros((A, 4), np.float32)
        pred_boxes[:, 0] = (xs + 0.5) * ss + rng.normal(0, 3, A)
        pred_boxes[:, 1] = (ys + 0.5) * ss + rng.normal(0, 3, A)
        pred_boxes[:, 2] = rng.uniform(6, 140, A)
        pred_boxes[:, 3] = rng.uniform(6, 120, A)
        pred_boxes = pred_boxes.astype(np.float32)
        obj = rng.normal(-2, 1, A).astype(np.float32)
        cls = rng.normal(0, 1, (A, num_classes)).astype(np.float32)

        t_fg, t_matched, t_iou, t_num = _run_ref_assignments(
            ref, gt_boxes[:n_real], gt_classes[:n_real], pred_boxes, obj,
            cls, xs, ys, ss, radius, num_classes)
        a = simota_assign(jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
                          jnp.asarray(gt_valid), jnp.asarray(pred_boxes),
                          jnp.asarray(obj), jnp.asarray(cls),
                          jnp.asarray((xs + 0.5) * ss),
                          jnp.asarray((ys + 0.5) * ss), jnp.asarray(ss),
                          radius, num_classes=num_classes)
        j_fg = np.asarray(a.fg_mask)
        diff = np.flatnonzero(j_fg != t_fg)
        total_disagree += len(diff)
        if len(diff) == 0:
            continue
        cost, ks = _simota_cost_replica(
            gt_boxes[:n_real], gt_classes[:n_real], pred_boxes, obj, cls,
            xs, ys, ss, radius, num_classes)
        t_matched_full = np.zeros(A, int)
        t_matched_full[t_fg] = t_matched
        j_matched = np.asarray(a.matched_gt)
        for d in diff:
            g = int(t_matched_full[d]) if t_fg[d] else int(j_matched[d])
            # the k-th smallest candidate cost for this gt is the pick
            # boundary; a tie-break artifact sits within float32 noise of it
            order = np.sort(cost[g])
            boundary = order[ks[g] - 1]
            rel = abs(cost[g, d] - boundary) / max(1.0, abs(boundary))
            assert rel < 1e-5, (
                f"seed {seed}: anchor {d} (gt {g}) is off-boundary: "
                f"cost {cost[g, d]:.8f} vs k-th {boundary:.8f} (rel {rel:.2e})"
            )
    # disagreements must stay rare even at 6k+ anchors
    assert total_disagree <= 20, total_disagree

def _run_ref_assignments(ref, gt_boxes, gt_classes, pred_boxes, obj, cls,
                         xs, ys, ss, radius, num_classes):
    head = ref.YOLOXHead(num_classes, strides=[8, 16, 32],
                         in_channels=[32, 32, 32], radius=radius)
    G, A = len(gt_boxes), len(pred_boxes)
    with torch.no_grad():
        (gt_matched_classes, fg_mask, pred_ious, matched_gt_inds,
         num_fg) = head.get_assignments(
            0, G, A,
            torch.tensor(gt_boxes), torch.tensor(gt_classes.astype(np.float32)),
            torch.tensor(pred_boxes),
            torch.tensor(ss, dtype=torch.float32)[None],
            torch.tensor(xs, dtype=torch.float32)[None],
            torch.tensor(ys, dtype=torch.float32)[None],
            torch.tensor(cls)[None], None,
            torch.tensor(obj)[None, :, None], None, None, mode="gpu")
    return (fg_mask.numpy(), matched_gt_inds.numpy(), pred_ious.numpy(),
            int(num_fg))


def test_simota_matches_reference_head(ref):
    from frlw_evd_tpu.models.assign import simota_assign
    from frlw_evd_tpu.models.heads import level_grids

    num_classes = 2
    radius = 5.0
    xs, ys, ss = level_grids([(8, 10), (4, 5), (2, 3)], [8, 16, 32])
    A = len(xs)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        n_real = int(rng.integers(1, 7))
        G = 80
        gt_boxes = np.zeros((G, 4), np.float32)
        gt_boxes[:n_real, 0] = rng.uniform(10, 70, n_real)
        gt_boxes[:n_real, 1] = rng.uniform(10, 54, n_real)
        gt_boxes[:n_real, 2] = rng.uniform(8, 30, n_real)
        gt_boxes[:n_real, 3] = rng.uniform(8, 30, n_real)
        gt_classes = rng.integers(0, num_classes, G).astype(np.int32)
        gt_valid = np.arange(G) < n_real
        pred_boxes = np.zeros((A, 4), np.float32)
        pred_boxes[:, 0] = (xs + 0.5) * ss + rng.normal(0, 2, A)
        pred_boxes[:, 1] = (ys + 0.5) * ss + rng.normal(0, 2, A)
        pred_boxes[:, 2] = rng.uniform(4, 40, A)
        pred_boxes[:, 3] = rng.uniform(4, 40, A)
        pred_boxes = pred_boxes.astype(np.float32)
        obj = rng.normal(-2, 1, A).astype(np.float32)
        cls = rng.normal(0, 1, (A, num_classes)).astype(np.float32)

        t_fg, t_matched, t_iou, t_num = _run_ref_assignments(
            ref, gt_boxes[:n_real], gt_classes[:n_real], pred_boxes, obj,
            cls, xs, ys, ss, radius, num_classes)

        a = simota_assign(jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
                          jnp.asarray(gt_valid), jnp.asarray(pred_boxes),
                          jnp.asarray(obj), jnp.asarray(cls),
                          jnp.asarray((xs + 0.5) * ss),
                          jnp.asarray((ys + 0.5) * ss), jnp.asarray(ss),
                          radius, num_classes=num_classes)

        j_fg = np.asarray(a.fg_mask)
        disagree = int((j_fg != t_fg).sum())
        assert disagree <= 1, f"seed {seed}: {disagree} fg disagreements"
        common = j_fg & t_fg
        t_matched_full = np.zeros(A, int)
        t_iou_full = np.zeros(A)
        t_matched_full[t_fg] = t_matched
        t_iou_full[t_fg] = t_iou
        np.testing.assert_array_equal(np.asarray(a.matched_gt)[common],
                                      t_matched_full[common],
                                      err_msg=f"seed {seed}")
        np.testing.assert_allclose(np.asarray(a.pred_iou)[common],
                                   t_iou_full[common], atol=1e-4,
                                   err_msg=f"seed {seed}")


# ---------------------------------------------------------------------------
# Full-size checkpoint dress rehearsal (VERDICT r1 #5)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_full_model(ref, tmp_path_factory):
    """The reference's OWN full-size flagship model (AED + BFM, TAF K=8,
    GEN1), built from its actual classes — its state_dict is exactly the key
    set the released AED_TAF_K8_GEN1.pth contains."""
    from core.Others.Temporal_Active_Focus import Temporal_Active_Focus_connect
    from core.model import model as RefModel
    from core.yolox.models.darknet import Darknet as RefDarknet
    from core.yolox.models.yolo_pafpn import YOLOPAFPN as RefPAFPN

    torch.manual_seed(0)
    backbone = RefDarknet(21, (256, 320), Temporal_Active_Focus_connect,
                          in_channels=16, stem_out_channels=64,
                          out_channels=[256, 256, 256],
                          out_features=("dark3", "dark4", "dark5"),
                          act="silu")
    neck = RefPAFPN(0.33, in_features=("dark3", "dark4", "dark5"),
                    in_channels=[256, 256, 256], act="silu")
    head = ref.YOLOXHead(2, in_channels=[256, 256, 256], act="silu",
                         strides=[8, 16, 32], radius=5)
    tmodel = RefModel(backbone, neck, None, head)
    # exercise BN running stats
    tmodel.train()
    with torch.no_grad():
        for _ in range(2):
            x5 = torch.randn(1, 16, 64, 64, 1)
            feats = tmodel.backbone(x5)
            tmodel.neck(feats)
    tmodel.eval()
    path = tmp_path_factory.mktemp("full_pth") / "AED_TAF_K8_GEN1_twin.pth"
    torch.save({"state_dict": {"module." + k: v for k, v in
                               tmodel.state_dict().items()},
                "epoch": 34}, path)
    return tmodel, str(path)


@pytest.mark.slow
def test_fullsize_import_covers_all_keys(ref_full_model):
    """Every key of the flagship checkpoint maps into the flax AED+BFM
    (incl. weight-norm weight_g/weight_v and BN buffers)."""
    import jax
    import jax.numpy as jnp

    from frlw_evd_tpu.models import build_detector
    from frlw_evd_tpu.train.checkpoints import import_torch_checkpoint

    tmodel, path = ref_full_model
    fmodel = build_detector(2, family="aed", stem="bfm")
    x = jnp.zeros((1, 64, 64, 16), jnp.float32)
    variables = jax.jit(fmodel.init, static_argnums=(2,))(
        jax.random.key(0), x, False)

    params, bs, report = import_torch_checkpoint(
        path, variables["params"], variables["batch_stats"])
    sd = tmodel.state_dict()
    n_mappable = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    assert report["unmatched"] == [], report["unmatched"][:10]
    assert report["loaded"] == n_mappable, (report["loaded"], n_mappable)


@pytest.mark.slow
def test_fullsize_forward_parity_after_import(ref_full_model):
    """Full-size AED+BFM forward parity: reference torch modules vs the
    imported flax model on a random TAF-like input (head pre-decode maps)."""
    import jax
    import jax.numpy as jnp

    from frlw_evd_tpu.models import build_detector
    from frlw_evd_tpu.train.checkpoints import import_torch_checkpoint

    tmodel, path = ref_full_model
    fmodel = build_detector(2, family="aed", stem="bfm")
    xj = jnp.zeros((1, 128, 160, 16), jnp.float32)
    variables = jax.jit(fmodel.init, static_argnums=(2,))(
        jax.random.key(0), xj, False)
    params, bs, _ = import_torch_checkpoint(
        path, variables["params"], variables["batch_stats"])

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 16, 128, 160)).astype(np.float32)
    with torch.no_grad():
        feats = tmodel.backbone(torch.from_numpy(x)[..., None])
        p2, p1, p0 = tmodel.neck(feats)
        t_outs = []
        for k, f in enumerate((p2, p1, p0)):
            h = tmodel.head
            s = h.stems[k](f)
            cls_feat = h.cls_convs[k](s)
            reg_feat = h.reg_convs[k](s)
            t_outs.append(torch.cat([h.reg_preds[k](reg_feat),
                                     h.obj_preds[k](reg_feat),
                                     h.cls_preds[k](cls_feat)], 1))

    f_outs = jax.jit(lambda v, xx: fmodel.apply(v, xx, False))(
        {"params": params, "batch_stats": bs},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    for lvl, (t, f) in enumerate(zip(t_outs, f_outs)):
        t_np = t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(f), t_np, atol=5e-4, rtol=1e-3,
                                   err_msg=f"level {lvl}")
