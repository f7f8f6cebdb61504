"""Video Swin 3D tests: window partition round-trip, shift mask, attention
shapes, stage downsampling, and the TAF swin stem."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frlw_evd_tpu.models.swin3d import (
    BasicLayer3D,
    PatchEmbed3D,
    PatchMerging,
    PatchMergingTime,
    SwinBlock3D,
    TemporalActiveFocusSwin,
    WindowAttention3D,
    compute_shift_mask,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 4, 8, 8, 6)).astype(np.float32))
    ws = (2, 4, 4)
    w = window_partition(x, ws)
    assert w.shape == (2 * 2 * 2 * 2, 2 * 4 * 4, 6)
    back = window_reverse(w, ws, 2, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region():
    mask = compute_shift_mask(2, 8, 8, (2, 4, 4), (0, 2, 2))
    assert mask.shape == (4, 32, 32)
    assert (mask <= 0).all()
    assert (mask < 0).any()  # some pairs masked


def test_window_attention_shapes(rng):
    attn = WindowAttention3D(dim=24, window_size=(2, 4, 4), num_heads=3)
    x = jnp.asarray(rng.uniform(0, 1, (6, 32, 24)).astype(np.float32))
    v = attn.init(jax.random.key(0), x)
    y = attn.apply(v, x)
    assert y.shape == x.shape


@pytest.mark.slow
def test_swin_block_with_shift(rng):
    blk = SwinBlock3D(dim=16, num_heads=2, window_size=(2, 4, 4),
                      shift_size=(0, 2, 2))
    x = jnp.asarray(rng.uniform(0, 1, (1, 2, 8, 12, 16)).astype(np.float32))
    v = blk.init(jax.random.key(0), x)
    y = blk.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_patch_merging_dims(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 2, 8, 8, 16)).astype(np.float32))
    pm = PatchMerging(16)
    v = pm.init(jax.random.key(0), x)
    y = pm.apply(v, x)
    assert y.shape == (1, 2, 4, 4, 32)

    pmt = PatchMergingTime(16, 32)
    v = pmt.init(jax.random.key(0), x)
    y = pmt.apply(v, x)
    assert y.shape == (1, 1, 8, 8, 32)


def test_basic_layer_time_downsample(rng):
    layer = BasicLayer3D(in_dim=16, out_dim=32, depth=2, num_heads=2,
                         window_size=(2, 4, 4), downsample="time")
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 8, 8, 16)).astype(np.float32))
    v = layer.init(jax.random.key(0), x)
    y = layer.apply(v, x)
    assert y.shape == (1, 2, 8, 8, 32)


@pytest.mark.slow
def test_taf_swin_stem(rng):
    stem = TemporalActiveFocusSwin(out_channels=32)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 16)).astype(np.float32))
    v = jax.jit(stem.init, static_argnums=(2,))(jax.random.key(0), x, False)
    y = jax.jit(lambda v, x: stem.apply(v, x, False))(v, x)
    # stem halves resolution like Focus
    assert y.shape == (1, 16, 24, 32)
    assert np.isfinite(np.asarray(y)).all()
