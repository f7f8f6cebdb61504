"""Trainer integration for the recurrent exp families: one convlstm train
step + eval, and seq-NMS linking inside eval_epoch."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from frlw_evd_tpu.train import Trainer, make_config

from fixtures import INPUT_HW, build_mini_gen1


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_mem")
    return build_mini_gen1(str(root))


def small_trainer(mini, exp_type, tmp_path, **over):
    cfg = make_config(
        exp_type,
        data_path=mini["ev_dir"],
        bbox_path=mini["labels"],
        batch_size=2, num_workers=2, max_epoch=2, max_epoch_to_stop=1,
        warmup_epochs=1, augmentation=False, half_precision=False,
        event_volume_bins=5, img_size_override=INPUT_HW,
        sensor_hw_override=(60, 76), log_path=str(tmp_path),
        in_channels=(16, 16, 16), **over)
    return Trainer(cfg)


def test_convlstm_train_and_eval(mini, tmp_path):
    t = small_trainer(mini, "convlstm", tmp_path)
    t.create_datasets()
    t.build(len(t.train_loader))
    losses = t.train_epoch()
    assert np.isfinite(losses["total_loss"])
    stats = t.eval_epoch(t.make_evaluator())
    assert len(stats) == 6


def test_seqnms_eval(mini, tmp_path):
    t = small_trainer(mini, "seqnms", tmp_path)
    t.create_datasets()
    t.build(len(t.train_loader))
    # eval with seq-NMS linking across consecutive windows
    stats = t.eval_epoch(t.make_evaluator())
    assert len(stats) == 6
