"""Tests for the YOLOv3 family, recurrent memory cells, seq-NMS, and the
native kernel bindings."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from frlw_evd_tpu.models.yolov3 import (
    ANCHOR_SIZE2,
    YOLOv3Detector,
    decode_boxes,
    giou_xyxy,
    gt_creator,
    upsample_bilinear_2x_aligned,
    yolov3_eval_decode,
    yolov3_loss,
)
from frlw_evd_tpu.models.memory import ConvGRUCell, ConvLSTMCell, MemoryModel
from frlw_evd_tpu.models.seq_nms import SeqNMSState, build_box_sequences, seq_nms
from frlw_evd_tpu.utils.native import compute_overlap, event_queue_tensor, has_native
from frlw_evd_tpu.encode import oracle


# ---------------------------------------------------------------------------
# native kernels
# ---------------------------------------------------------------------------

def test_native_library_builds():
    assert has_native(), "native/libfrlw_kernels.so failed to build"


def test_native_overlap_matches_numpy(rng):
    a = rng.uniform(0, 100, (7, 2))
    boxes = np.concatenate([a, a + rng.uniform(5, 40, (7, 2))], -1)
    b = rng.uniform(0, 100, (5, 2))
    query = np.concatenate([b, b + rng.uniform(5, 40, (5, 2))], -1)
    got = compute_overlap(boxes, query)
    # independent numpy computation
    tl = np.maximum(boxes[:, None, :2], query[None, :, :2])
    br = np.minimum(boxes[:, None, 2:], query[None, :, 2:])
    inter = np.prod(np.maximum(br - tl, 0), -1)
    ua = (np.prod(boxes[:, 2:] - boxes[:, :2], -1)[:, None]
          + np.prod(query[:, 2:] - query[:, :2], -1)[None] - inter)
    np.testing.assert_allclose(got, np.where(inter > 0, inter / ua, 0),
                               atol=1e-9)


def test_native_event_queue_matches_oracle(rng):
    H, W, K, bins = 16, 20, 8, 5
    n = 800
    ev = np.zeros((n, 6))
    ev[:, 0] = 0                                  # batch
    ev[:, 1] = rng.integers(0, W, n)              # x
    ev[:, 2] = rng.integers(0, H, n)              # y
    ev[:, 3] = rng.uniform(0, 1, n)               # t (normalised)
    ev[:, 4] = rng.integers(0, 2, n)              # p
    ev[:, 5] = np.sort(rng.integers(0, bins, n))  # z
    got = event_queue_tensor(ev, 1, H, W, K, bins)[0]

    state = oracle.taf_init_state((H, W), K)
    for i in range(bins):
        sel = ev[ev[:, 5] == i]
        state = oracle.taf_bin(sel[:, [1, 2, 3, 4]].astype(np.float32),
                               (H, W), state)
    np.testing.assert_allclose(got, state, atol=1e-4)


# ---------------------------------------------------------------------------
# yolov3
# ---------------------------------------------------------------------------

def test_upsample_aligned_corners():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = upsample_bilinear_2x_aligned(x)
    assert up.shape == (1, 4, 4, 1)
    # corners preserved with align_corners=True
    assert float(up[0, 0, 0, 0]) == 0.0
    assert float(up[0, 3, 3, 0]) == 3.0
    assert float(up[0, 0, 3, 0]) == 1.0


def test_gt_creator_assignment():
    labels = np.zeros((1, 80, 5), np.float32)
    labels[0, 0] = [1, 100, 100, 30, 60]  # best anchor [30, 61] → scale 1
    gt = gt_creator(640, (8, 16, 32), labels)
    A = (80 * 80 + 40 * 40 + 20 * 20) * 3
    assert gt.shape == (1, A, 7)
    pos = np.nonzero(gt[0, :, 0])[0]
    assert len(pos) == 1
    row = gt[0, pos[0]]
    assert row[1] == 1  # class preserved
    # anchor index: [30,61] is anchors[3] → scale 1, anchor 0; grid (6,6) @ s16
    base = 80 * 80 * 3
    expected = base + (6 * 40 + 6) * 3 + 0
    assert pos[0] == expected
    np.testing.assert_allclose(row[2:6], [85 / 640, 70 / 640, 115 / 640,
                                          130 / 640], atol=1e-6)


def test_giou_known_values():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10]])
    assert float(giou_xyxy(a, b)[0]) == pytest.approx(1.0)
    c = jnp.array([[20.0, 0, 30, 10]])
    # disjoint: iou 0, enclosing area 300 → giou = -(300-200)/300
    assert float(giou_xyxy(a, c)[0]) == pytest.approx(-1 / 3, abs=1e-5)


@pytest.fixture(scope="module")
def v3_outputs():
    model = YOLOv3Detector(2)
    x = jnp.zeros((1, 64, 64, 10), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False)
    outs = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)
    return model, variables, outs


def test_yolov3_forward_shapes(v3_outputs):
    model, variables, outs = v3_outputs
    # 3 levels: strides 8/16/32 of 64 → 8, 4, 2; KA*(1+C+4) = 3*7 = 21
    assert [o.shape for o in outs] == [(1, 8, 8, 21), (1, 4, 4, 21),
                                       (1, 2, 2, 21)]


def test_yolov3_loss_finite(v3_outputs):
    model, variables, outs = v3_outputs
    labels = np.zeros((1, 80, 5), np.float32)
    labels[0, 0] = [0, 32, 32, 20, 20]
    gt = gt_creator(64, (8, 16, 32), labels)
    losses = jax.jit(lambda o, g: yolov3_loss(o, g, 2, 64))(outs,
                                                            jnp.asarray(gt))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_yolov3_eval_decode_shapes(v3_outputs):
    model, variables, outs = v3_outputs
    dec = jax.jit(lambda o: yolov3_eval_decode(o, 2, 64))(outs)
    A = (8 * 8 + 4 * 4 + 2 * 2) * 3
    assert dec.shape == (1, A, 7)
    conf = np.asarray(dec[0, :, 4])
    assert ((conf >= 0) & (conf <= 1)).all()


# ---------------------------------------------------------------------------
# memory cells
# ---------------------------------------------------------------------------

def test_convlstm_scan():
    cell = ConvLSTMCell(hidden_dim=8)
    x = jnp.ones((1, 8, 8, 4))
    carry = cell.init_carry(1, 8, 8)
    variables = cell.init(jax.random.key(0), carry, x)

    def step(c, _):
        c, y = cell.apply(variables, c, x)
        return c, y

    carry, ys = jax.lax.scan(step, carry, jnp.arange(5))
    assert ys.shape == (5, 1, 8, 8, 8)
    # state evolves across steps
    assert not np.allclose(np.asarray(ys[0]), np.asarray(ys[4]))


def test_convgru_memory_model():
    mm = MemoryModel(cell_type="convgru", hidden_dims=(8, 8),
                     kernel_sizes=(3, 3))
    feats = [jnp.ones((1, 8, 8, 8)), jnp.ones((1, 4, 4, 8))]
    carries = (None, None)
    variables = mm.init(jax.random.key(0), carries, feats, False)
    carries, outs = mm.apply(variables, carries, feats, False)
    assert [o.shape for o in outs] == [(1, 8, 8, 8), (1, 4, 4, 8)]
    carries2, outs2 = mm.apply(variables, carries, feats, False)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs2[0]))


# ---------------------------------------------------------------------------
# seq-NMS
# ---------------------------------------------------------------------------

def test_seq_nms_links_and_suppresses():
    # two frames: one persistent object (linked), one flicker
    f0 = np.array([[10.0, 10, 50, 50], [100, 100, 140, 140]])
    f1 = np.array([[12.0, 11, 52, 51], [200, 200, 240, 240]])
    scores = [np.array([0.9, 0.8]), np.array([0.85, 0.7])]
    graph = build_box_sequences([f0, f1], scores)
    assert graph[0][0] == [0]     # box 0 links to box 0 in next frame
    assert graph[0][1] == []      # box 1 has no link
    keep = seq_nms([f0, f1], scores)
    assert keep[0] == False       # consumed by a tube
    assert keep[1] == True


def test_seq_nms_state_streaming():
    st = SeqNMSState()
    dets0 = np.array([[30.0, 30, 40, 40, 0, 0.9]])
    out0 = st.link(dets0)
    assert out0.shape[0] == 1
    dets1 = np.array([[31.0, 31, 40, 40, 0, 0.85]])
    out1 = st.link(dets1)
    # memory box overlaps the new one heavily → suppressed to a single det
    assert out1.shape[0] == 1
    st.clean()
    assert st.dets is None
