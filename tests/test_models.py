"""Model zoo tests: shapes, decode semantics, SimOTA assignment sanity, NMS
parity with an independent greedy reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frlw_evd_tpu.models import build_detector
from frlw_evd_tpu.models.assign import simota_assign
from frlw_evd_tpu.models.detector import detector_loss, eval_decode
from frlw_evd_tpu.models.heads import decode_outputs, level_grids
from frlw_evd_tpu.models.losses import iou_elementwise_cxcywh, pairwise_iou_cxcywh
from frlw_evd_tpu.models.postprocess import (
    cxcywh_to_xyxy,
    finalize_detections,
    nms_mask,
    postprocess_image,
)

H, W, C = 64, 64, 4  # tiny inputs keep CPU compile fast


@pytest.fixture(scope="module")
def small_model():
    model = build_detector(2, family="aed", stem="focus",
                           in_channels=(32, 32, 32), stem_out_channels=16,
                           head_width=32)
    x = jnp.zeros((1, H, W, C), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False)
    apply_fn = jax.jit(lambda v, x: model.apply(v, x, False))
    return model, variables, apply_fn


def test_forward_shapes(small_model):
    model, variables, apply_fn = small_model
    x = jnp.zeros((2, H, W, C), jnp.float32)
    outs = apply_fn(variables, x)
    assert [o.shape for o in outs] == [
        (2, H // 8, W // 8, 7), (2, H // 16, W // 16, 7), (2, H // 32, W // 32, 7)]


def test_decode_square_wh():
    """wh decode is square(pred)*stride, not exp (yolo_head.py:254)."""
    A = 4
    raw = np.zeros((1, A, 7), np.float32)
    raw[0, 0, :4] = [0.5, 0.25, 2.0, 3.0]
    x_shift = jnp.array([1.0, 0, 0, 0])
    y_shift = jnp.array([2.0, 0, 0, 0])
    stride = jnp.array([8.0, 8, 8, 8])
    dec = decode_outputs(jnp.asarray(raw), x_shift, y_shift, stride)
    np.testing.assert_allclose(dec[0, 0, :4], [12.0, 18.0, 32.0, 72.0])


def test_level_grids_order():
    xs, ys, ss = level_grids([(2, 3), (1, 1)], [8, 16])
    np.testing.assert_array_equal(xs, [0, 1, 2, 0, 1, 2, 0])
    np.testing.assert_array_equal(ys, [0, 0, 0, 1, 1, 1, 0])
    np.testing.assert_array_equal(ss, [8, 8, 8, 8, 8, 8, 16])


def test_pairwise_iou():
    a = jnp.array([[10.0, 10, 10, 10]])      # cxcywh → [5,5,15,15]
    b = jnp.array([[10.0, 10, 10, 10], [16, 16, 10, 10], [100, 100, 2, 2]])
    iou = pairwise_iou_cxcywh(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 16 / 184, atol=1e-5)  # 4x4 overlap
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-6)


def test_simota_assigns_center_anchor():
    """A well-predicted box on a gt center must be a positive."""
    G, A, C_ = 8, 64, 2
    xs, ys, ss = level_grids([(8, 8)], [8])
    gt_boxes = np.zeros((G, 4), np.float32)
    gt_boxes[0] = [28, 28, 24, 24]
    gt_classes = np.zeros(G, np.int32)
    gt_valid = np.zeros(G, bool)
    gt_valid[0] = True
    pred = np.tile(np.array([[0.0, 0, 1, 1]], np.float32), (A, 1))
    # anchor 27 = (y=3,x=3) center (28,28): perfect prediction
    pred_boxes = np.zeros((A, 4), np.float32)
    pred_boxes[:, 0] = (xs + 0.5) * ss
    pred_boxes[:, 1] = (ys + 0.5) * ss
    pred_boxes[:, 2:] = 8.0
    pred_boxes[27] = [28, 28, 24, 24]
    obj = np.full(A, -2.0, np.float32)
    cls = np.zeros((A, C_), np.float32)
    a = simota_assign(jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
                      jnp.asarray(gt_valid), jnp.asarray(pred_boxes),
                      jnp.asarray(obj), jnp.asarray(cls),
                      jnp.asarray((xs + 0.5) * ss), jnp.asarray((ys + 0.5) * ss),
                      jnp.asarray(ss), 5.0, num_classes=C_)
    fg = np.asarray(a.fg_mask)
    assert fg[27]
    assert np.asarray(a.matched_gt)[27] == 0
    assert float(a.num_fg) >= 1
    # no positives for padded gts
    assert float(a.num_gt) == 1.0


def test_simota_no_gt():
    G, A, C_ = 4, 16, 2
    xs, ys, ss = level_grids([(4, 4)], [8])
    a = simota_assign(jnp.zeros((G, 4)), jnp.zeros(G, jnp.int32),
                      jnp.zeros(G, bool), jnp.ones((A, 4)),
                      jnp.zeros(A), jnp.zeros((A, C_)),
                      jnp.asarray((xs + 0.5) * ss), jnp.asarray((ys + 0.5) * ss),
                      jnp.asarray(ss), 5.0, num_classes=C_)
    assert not np.asarray(a.fg_mask).any()
    assert float(a.num_fg) == 0


def test_loss_finite_and_decreasing_on_perfect_pred(small_model):
    model, variables, apply_fn = small_model
    x = jnp.zeros((1, H, W, C), jnp.float32)
    outs = apply_fn(variables, x)
    labels = np.zeros((1, 80, 5), np.float32)
    labels[0, 0] = [1, 32, 32, 16, 16]
    loss_fn = jax.jit(lambda o, l: detector_loss(o, l, (8, 16, 32), 2, 5.0))
    losses = loss_fn(outs, jnp.asarray(labels))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_loss_gradients_flow(small_model):
    model, variables, apply_fn = small_model
    labels = np.zeros((1, 80, 5), np.float32)
    labels[0, 0] = [0, 20, 20, 12, 12]
    x = jnp.ones((1, H, W, C), jnp.float32) * 0.1

    def loss_fn(params):
        outs = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]}, x, False)
        return detector_loss(outs, jnp.asarray(labels), (8, 16, 32), 2, 5.0)[
            "total_loss"]

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    gnorm = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def greedy_nms_reference(boxes_xyxy, scores, thresh):
    """Plain O(n²) torchvision-style NMS in numpy (scores pre-sorted desc)."""
    keep = []
    sup = np.zeros(len(boxes_xyxy), bool)
    for i in range(len(boxes_xyxy)):
        if sup[i]:
            continue
        keep.append(i)
        for j in range(i + 1, len(boxes_xyxy)):
            tl = np.maximum(boxes_xyxy[i, :2], boxes_xyxy[j, :2])
            br = np.minimum(boxes_xyxy[i, 2:], boxes_xyxy[j, 2:])
            inter = np.prod(np.maximum(br - tl, 0))
            a1 = np.prod(boxes_xyxy[i, 2:] - boxes_xyxy[i, :2])
            a2 = np.prod(boxes_xyxy[j, 2:] - boxes_xyxy[j, :2])
            if inter / max(a1 + a2 - inter, 1e-12) > thresh:
                sup[j] = True
    mask = np.zeros(len(boxes_xyxy), bool)
    mask[keep] = True
    return mask


def test_nms_matches_greedy_reference(rng):
    K = 64
    boxes = np.zeros((K, 4), np.float32)
    boxes[:, 0] = rng.uniform(20, 200, K)
    boxes[:, 1] = rng.uniform(20, 200, K)
    boxes[:, 2] = rng.uniform(10, 60, K)
    boxes[:, 3] = rng.uniform(10, 60, K)
    scores = np.sort(rng.uniform(0.31, 1.0, K))[::-1].astype(np.float32)
    xyxy = np.asarray(cxcywh_to_xyxy(jnp.asarray(boxes)))
    ref = greedy_nms_reference(xyxy, scores, 0.6)
    got = np.asarray(nms_mask(jnp.asarray(xyxy), jnp.asarray(scores),
                              jnp.ones(K, bool), 0.6))
    np.testing.assert_array_equal(got, ref)


def test_nms_fixpoint_matches_sequential(rng):
    """The while-loop fixpoint NMS must equal the K-step sequential scan
    bit-for-bit — incl. long suppression chains (worst case for the
    fixpoint's convergence) and all-invalid inputs — and stay exact under
    vmap (batched convergence condition)."""
    from frlw_evd_tpu.models.postprocess import nms_mask_sequential

    cases = []
    for seed in range(20):
        r = np.random.default_rng(seed)
        K = 100
        n = int(r.integers(1, K + 1))
        boxes = np.zeros((K, 4), np.float32)
        boxes[:n, :2] = r.uniform(0, 200, (n, 2))
        boxes[:n, 2:] = r.uniform(5, 80, (n, 2))
        scores = np.sort(r.uniform(0, 1, K).astype(np.float32))[::-1].copy()
        valid = np.arange(K) < n
        cases.append((boxes, scores, valid))
    # adversarial: a 100-box chain where each box overlaps only its
    # neighbours (each iteration settles ~one decision)
    K = 100
    chain = np.zeros((K, 4), np.float32)
    chain[:, 0] = np.arange(K) * 6.0       # cx, width 10 → IoU(adj) = 0.25
    chain[:, 1] = 50.0
    chain[:, 2:] = 10.0
    cases.append((chain, np.linspace(1, 0.5, K, dtype=np.float32),
                  np.ones(K, bool)))
    cases.append((chain, np.linspace(1, 0.5, K, dtype=np.float32),
                  np.zeros(K, bool)))       # all invalid

    batched = [jnp.asarray(np.stack([c[i] for c in cases]))
               for i in range(3)]
    xyxy = cxcywh_to_xyxy(batched[0])
    got_b = np.asarray(jax.vmap(lambda b, s, v: nms_mask(b, s, v, 0.2))(
        xyxy, batched[1], batched[2]))
    for i, (boxes, scores, valid) in enumerate(cases):
        ref = np.asarray(nms_mask_sequential(
            cxcywh_to_xyxy(jnp.asarray(boxes)), jnp.asarray(scores),
            jnp.asarray(valid), 0.2))
        np.testing.assert_array_equal(got_b[i], ref, err_msg=f"case {i}")


def test_postprocess_confidence_gate(rng):
    A, C_ = 100, 2
    dec = np.zeros((A, 5 + C_), np.float32)
    dec[:, :4] = rng.uniform(20, 200, (A, 4))
    dec[:, 4] = 0.1          # all below threshold
    dec[5, 4] = 0.9
    dec[5, 5] = 0.8
    dets, keep = postprocess_image(jnp.asarray(dec), max_detections=16)
    out = finalize_detections(dets[None], keep[None])[0]
    assert out.shape[0] == 1
    assert out[0, 5] == pytest.approx(0.9 * 0.8, abs=1e-5)
    # empty case → dummy zero row (reference yolo_head.py:277-278)
    dec[:, 4] = 0.0
    dets, keep = postprocess_image(jnp.asarray(dec), max_detections=16)
    out = finalize_detections(dets[None], keep[None])[0]
    assert out.shape == (1, 6) and (out == 0).all()


def test_eval_decode_sigmoid(small_model):
    model, variables, apply_fn = small_model
    x = jnp.zeros((1, H, W, C), jnp.float32)
    outs = apply_fn(variables, x)
    dec = jax.jit(lambda o: eval_decode(o, (8, 16, 32)))(outs)
    obj = np.asarray(dec[0, :, 4])
    assert ((obj >= 0) & (obj <= 1)).all()


def test_merged_head_matches_canonical():
    """YOLOXHead(merged_branches=True) — the cls+reg towers as two
    double-width convs — has the IDENTICAL parameter tree and matching
    outputs/batch-stats in both modes (an MXU layout A/B, not a new model)."""
    import jax
    import jax.numpy as jnp

    from frlw_evd_tpu.models.heads import YOLOXHead

    W = 64
    r = np.random.default_rng(0)
    feats = [jnp.asarray(r.normal(0, 1, (2, 16, 20, W)), jnp.float32),
             jnp.asarray(r.normal(0, 1, (2, 8, 10, W)), jnp.float32),
             jnp.asarray(r.normal(0, 1, (2, 4, 5, W)), jnp.float32)]
    h0 = YOLOXHead(num_classes=3, width=W)
    h1 = YOLOXHead(num_classes=3, width=W, merged_branches=True)
    v0 = h0.init(jax.random.key(0), feats, False)
    v1 = h1.init(jax.random.key(0), feats, False)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)

    o0 = h0.apply(v0, feats, False)
    o1 = h1.apply(v0, feats, False)
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    o0, u0 = h0.apply(v0, feats, True, mutable=["batch_stats"])
    o1, u1 = h1.apply(v0, feats, True, mutable=["batch_stats"])
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), u0, u1)
