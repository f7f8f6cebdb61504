"""Coverage for the utility layer: meters, logger, demo NMS, schedules,
part checkpoints + freeze, in-loop visualizers, mobilenet."""

import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from frlw_evd_tpu.models import build_detector
from frlw_evd_tpu.train.checkpoints import (
    freeze_backbone_tx,
    load_pretrained_backbone,
    save_part_checkpoints,
)
from frlw_evd_tpu.train.schedule import (
    cos_schedule,
    multistep_schedule,
    warm_cos_schedule,
)
from frlw_evd_tpu.train.trainer import create_train_state
from frlw_evd_tpu.utils import AverageMeter, MeterBuffer, setup_logger
from frlw_evd_tpu.utils.demo_utils import (
    cxcywh2xyxy,
    multiclass_nms,
    nms,
    xyxy2cxcywh,
)


def test_average_meter():
    m = AverageMeter(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        m.update(v)
    assert m.avg == pytest.approx(3.0)        # window (2, 3, 4)
    assert m.global_avg == pytest.approx(2.5)
    assert m.latest == 4.0
    m.reset()
    assert m.global_avg < 1e-4


def test_meter_buffer():
    mb = MeterBuffer(window_size=4)
    mb.update(loss=1.0, iter_time=0.2)
    mb.update({"loss": 3.0})
    assert mb["loss"].avg == pytest.approx(2.0)
    assert "iter_time" in mb.get_filtered_meter("time")


def test_setup_logger(tmp_path):
    logger = setup_logger(str(tmp_path), distributed_rank=0)
    logger.info("hello from tests")
    files = [f for f in os.listdir(tmp_path) if f.startswith("file_")]
    assert files
    content = open(tmp_path / files[0]).read()
    assert "hello from tests" in content


def test_demo_nms():
    boxes = np.array([[0.0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]])
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms(boxes, scores, 0.5)
    assert keep == [0, 2]


def test_multiclass_nms():
    boxes = np.array([[0.0, 0, 10, 10], [50, 50, 60, 60]])
    scores = np.array([[0.9, 0.1], [0.2, 0.8]])
    out = multiclass_nms(boxes, scores, nms_thr=0.5, score_thr=0.3)
    assert out.shape == (2, 6)
    assert set(out[:, 5]) == {0.0, 1.0}


def test_box_converters_roundtrip(rng):
    xyxy = rng.uniform(0, 100, (5, 4))
    xyxy[:, 2:] = xyxy[:, :2] + rng.uniform(1, 20, (5, 2))
    back = cxcywh2xyxy(xyxy2cxcywh(xyxy))
    np.testing.assert_allclose(back, xyxy, atol=1e-6)


def test_schedules():
    assert float(cos_schedule(0.1, 100)(99)) == pytest.approx(0.0, abs=1e-4)
    s = warm_cos_schedule(0.1, 100, 10)
    assert float(s(4)) < 0.1                 # warming
    assert float(s(9)) == pytest.approx(0.1, rel=1e-2)
    ms = multistep_schedule(1.0, [5, 10], gamma=0.1)
    assert float(ms(3)) == pytest.approx(1.0)
    assert float(ms(6)) == pytest.approx(0.1)
    assert float(ms(11)) == pytest.approx(0.01, rel=1e-4)


@pytest.mark.slow
def test_part_checkpoint_and_freeze(tmp_path):
    model = build_detector(2, in_channels=(16, 16, 16), stem_out_channels=8,
                           head_width=16)
    x = jnp.zeros((1, 64, 64, 4))
    st = create_train_state(model, jax.random.key(0), x, optax.adam(1e-3))
    save_part_checkpoints(str(tmp_path / "best"), st)
    st2 = create_train_state(model, jax.random.key(1), x, optax.adam(1e-3))
    st2 = load_pretrained_backbone(str(tmp_path / "best_backbone"), st2)
    a = jax.tree.leaves(st.params["backbone"])[0]
    b = jax.tree.leaves(st2.params["backbone"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    tx = freeze_backbone_tx(optax.adam(1e-3), st2.params)
    opt = tx.init(st2.params)
    grads = jax.tree.map(jnp.ones_like, st2.params)
    updates, _ = tx.update(grads, opt, st2.params)
    assert float(jnp.abs(jax.tree.leaves(updates["backbone"])[0]).max()) == 0
    assert float(jnp.abs(jax.tree.leaves(updates["head"])[0]).max()) > 0


def test_visualizer(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    from frlw_evd_tpu.evaluate.visualizations import Visualizer, visualize_taf

    vol = rng.uniform(0, 255, (10, 48, 64)).astype(np.float32)
    gt = np.array([[20.0, 20, 10, 10]])
    dt = np.array([[22.0, 21, 10, 10]])
    vis = Visualizer(str(tmp_path))
    out = vis(vol, gt, dt, "seq0", 600000)
    assert os.path.exists(out)
    out2 = visualize_taf(vol, gt, dt, "seq0", str(tmp_path), 600000)
    assert os.path.exists(out2)


@pytest.mark.slow
def test_mobilenet_forward(rng):
    from frlw_evd_tpu.models.mobilenet import MBV2CA

    m = MBV2CA(num_classes=4, width_mult=0.5)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    v = jax.jit(m.init, static_argnums=(2,))(jax.random.key(0), x, False)
    y = jax.jit(lambda v, x: m.apply(v, x, False))(v, x)
    assert y.shape == (1, 4)
