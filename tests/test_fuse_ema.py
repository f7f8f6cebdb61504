"""Conv+BN fusion and EMA tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frlw_evd_tpu.models import build_detector
from frlw_evd_tpu.models.fuse import fuse_conv_bn_params
from frlw_evd_tpu.train.ema import ema_init, ema_update


@pytest.mark.slow
def test_fuse_preserves_forward(rng):
    model = build_detector(2, family="aed", stem="focus",
                           in_channels=(16, 16, 16), stem_out_channels=8,
                           head_width=16)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 4)).astype(np.float32))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x, False)
    # make BN stats non-trivial
    _, updates = model.apply(variables, x, True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}

    ref = model.apply(variables, x, False)
    fp, fb = fuse_conv_bn_params(variables["params"],
                                 variables["batch_stats"])
    fused = model.apply({"params": fp, "batch_stats": fb}, x, False)
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_ema_ramp():
    params = {"w": jnp.ones(3)}
    ema = ema_init(params)
    new = {"w": jnp.zeros(3)}
    # early updates: d ≈ 0 → ema follows params almost exactly
    e1 = ema_update(ema, new, jnp.float32(1.0))
    assert float(e1["w"][0]) < 0.01
    # late updates: d ≈ decay → ema barely moves
    e2 = ema_update(ema, new, jnp.float32(1e6))
    assert float(e2["w"][0]) > 0.99
