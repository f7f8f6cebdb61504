"""Patchified (p64) training path: make_train_step(patchify=True) with the
bfm_p64 stem must be the SAME optimization problem as the canonical BFM stem
on the raw volume — identical parameter tree, identical loss and gradients
(up to float association) when dropout is disabled. This is the layout trick
that keeps full-resolution 16-channel-minor tensors (12.5% TPU lane
occupancy) out of the forward AND backward pass (VERDICT r3 next #1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from frlw_evd_tpu.models.darknet import Darknet
from frlw_evd_tpu.models.detector import EventDetector
from frlw_evd_tpu.models.heads import YOLOXHead
from frlw_evd_tpu.models.pafpn import YOLOPAFPN
from frlw_evd_tpu.models.stems import (BinsFusionModule,
                                       BinsFusionModulePatched)
from frlw_evd_tpu.train.trainer import create_train_state, make_train_step

H, W, C = 64, 96, 16
NC = 2


def _build(stem_cls, dropout=0.0):
    return EventDetector(
        backbone=Darknet(depth=21, stem=partial(stem_cls,
                                                dropout_rate=dropout),
                         stem_out_channels=16, out_channels=(32, 32, 32)),
        neck=YOLOPAFPN(depth=0.33, in_channels=(32, 32, 32)),
        head=YOLOXHead(num_classes=NC, strides=(8, 16, 32), width=32))


def _batch(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (4, H, W, C)), jnp.float32)
    labels = np.zeros((4, 10, 5), np.float32)
    for b in range(4):
        labels[b, :3] = [[rng.integers(0, NC), rng.uniform(20, W - 20),
                          rng.uniform(20, H - 20), rng.uniform(8, 30),
                          rng.uniform(8, 30)] for _ in range(3)]
    return imgs, jnp.asarray(labels)


def test_p64_train_step_matches_canonical():
    rng = np.random.default_rng(0)
    imgs, labels = _batch(rng)
    key = jax.random.key(0)

    canon = _build(BinsFusionModule)
    # SGD so the post-step parameter delta IS the gradient (Adam's
    # g/(sqrt(v)+eps) amplifies float-association noise on near-zero grads)
    tx = optax.sgd(1e-2)
    state_c = create_train_state(canon, jax.random.key(1),
                                 jnp.zeros((1, H, W, C)), tx)

    patched = _build(BinsFusionModulePatched)
    from frlw_evd_tpu.models.blocks import space_to_depth_patches

    state_p = create_train_state(patched, jax.random.key(1),
                                 space_to_depth_patches(
                                     jnp.zeros((1, H, W, C))), tx)
    # identical parameter trees (one checkpoint serves both)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), state_c.params, state_p.params)

    step_c = make_train_step((8, 16, 32), NC, 2.5, half_precision=False)
    step_p = make_train_step((8, 16, 32), NC, 2.5, half_precision=False,
                             patchify=True)
    sc, lc = step_c(state_c, imgs, labels, key)
    sp, lp = step_p(state_p, imgs, labels, key)
    for k in lc:
        np.testing.assert_allclose(float(lc[k]), float(lp[k]), rtol=2e-4,
                                   err_msg=k)
    # post-update parameters agree leaf by leaf (same grads through SGD)
    flat_c = jax.tree.leaves(sc.params)
    flat_p = jax.tree.leaves(sp.params)
    for a, b in zip(flat_c, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_p64_train_step_with_dropout_and_rbg():
    """With dropout active the masks differ (different shapes/streams) but
    the p64 step must train: finite losses, params move; and the 'rbg'
    hardware-bit-generator key works through flax dropout."""
    rng = np.random.default_rng(1)
    imgs, labels = _batch(rng)
    patched = _build(BinsFusionModulePatched, dropout=0.1)
    from frlw_evd_tpu.models.blocks import space_to_depth_patches

    state = create_train_state(patched, jax.random.key(2),
                               space_to_depth_patches(
                                   jnp.zeros((1, H, W, C))),
                               optax.adam(1e-3))
    step = make_train_step((8, 16, 32), NC, 2.5, half_precision=True,
                           patchify=True)
    before = jax.tree.map(jnp.copy, state.params)
    key = jax.random.key(3, impl="rbg")
    state, losses = step(state, imgs, labels, key)
    assert np.isfinite(float(losses["total_loss"]))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         before, state.params)
    assert max(jax.tree.leaves(moved)) > 0
