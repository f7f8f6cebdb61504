"""SpmdBatchNorm parity with flax nn.BatchNorm.

The drop-in (models/blocks.py:40) changes only HOW batch statistics are
computed under an active mesh (explicit two-sum reduction pinned replicated,
so GSPMD reduces locally + all-reduces once instead of resharding fused
partials — VERDICT r4 weak #3). Math, parameter tree, and batch_stats
collection must be identical to nn.BatchNorm in every mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frlw_evd_tpu.models.blocks import SpmdBatchNorm

BN_KW = dict(momentum=0.9, epsilon=1e-5)


def _init_and_apply(mod_cls, x, train):
    m = mod_cls(use_running_average=not train, **BN_KW)
    variables = m.init(jax.random.key(0), x)
    out, mut = m.apply(variables, x, mutable=["batch_stats"] if train else [])
    return variables, out, mut


@pytest.mark.parametrize("train", [True, False])
def test_unmeshed_parity(rng, train):
    x = jnp.asarray(rng.normal(0, 2, (4, 6, 5, 16)).astype(np.float32))
    v_ref, out_ref, mut_ref = _init_and_apply(nn.BatchNorm, x, train)
    v_new, out_new, mut_new = _init_and_apply(SpmdBatchNorm, x, train)

    # identical variable trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(v_ref) == \
        jax.tree_util.tree_structure(v_new)
    np.testing.assert_allclose(out_ref, out_new, rtol=2e-5, atol=2e-5)
    if train:
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                mut_ref["batch_stats"][k],
                mut_new["batch_stats"][k],
                rtol=2e-5, atol=2e-6)


def test_grad_parity(rng):
    x = jnp.asarray(rng.normal(0, 1, (4, 6, 5, 16)).astype(np.float32))

    def loss(mod_cls, params, stats, xx):
        m = mod_cls(use_running_average=False, **BN_KW)
        out, _ = m.apply({"params": params, "batch_stats": stats}, xx,
                         mutable=["batch_stats"])
        return jnp.sum(out * out), out

    ref = nn.BatchNorm(use_running_average=False, **BN_KW)
    v = ref.init(jax.random.key(0), x)
    g_ref, out_ref = jax.grad(
        lambda p: loss(nn.BatchNorm, p, v["batch_stats"], x),
        has_aux=True)(v["params"])
    g_new, out_new = jax.grad(
        lambda p: loss(SpmdBatchNorm, p, v["batch_stats"], x),
        has_aux=True)(v["params"])
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            g_ref[k], g_new[k],
            rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(out_ref, out_new, rtol=2e-5, atol=2e-5)


def test_meshed_matches_unmeshed(rng):
    """Under a dp x sp mesh with the input sharded on batch AND height, the
    pinned-replicated stats path must produce the same outputs and updated
    running stats as the single-device reference."""
    x_host = rng.normal(0, 2, (8, 16, 4, 8)).astype(np.float32)
    x = jnp.asarray(x_host)

    m = SpmdBatchNorm(use_running_average=False, **BN_KW)
    variables = m.init(jax.random.key(0), x)
    out_ref, mut_ref = m.apply(variables, x, mutable=["batch_stats"])

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))

    @jax.jit
    def step(v, xx):
        return m.apply(v, xx, mutable=["batch_stats"])

    with mesh:
        out_sh, mut_sh = step(variables, xs)

    np.testing.assert_allclose(out_ref, out_sh, rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            mut_ref["batch_stats"][k],
            mut_sh["batch_stats"][k],
            rtol=2e-5, atol=2e-6)


def test_grad_under_mesh(rng):
    """Backward through the meshed stats path matches the unmeshed one."""
    x_host = rng.normal(0, 1, (8, 8, 4, 8)).astype(np.float32)
    x = jnp.asarray(x_host)
    m = SpmdBatchNorm(use_running_average=False, **BN_KW)
    variables = m.init(jax.random.key(0), x)

    def loss(params, xx):
        out, _ = m.apply({"params": params,
                          "batch_stats": variables["batch_stats"]}, xx,
                         mutable=["batch_stats"])
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(loss)(variables["params"], x)

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    with mesh:
        g_sh = jax.jit(jax.grad(loss))(variables["params"], xs)

    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            g_ref[k], g_sh[k],
            rtol=2e-4, atol=2e-5)


def test_meshed_exact_variance(rng):
    """use_fast_variance=False must give the SAME (recentred-exact) numerics
    under a mesh as the unmeshed flax path — meshing is a layout decision,
    not a numerics switch."""
    # large mean makes E[x^2]-E[x]^2 visibly lossy in f32, separating the
    # two variance formulas
    x_host = (1e4 + rng.normal(0, 0.5, (8, 8, 4, 8))).astype(np.float32)
    x = jnp.asarray(x_host)
    m = SpmdBatchNorm(use_running_average=False, use_fast_variance=False,
                      **BN_KW)
    m_ref = nn.BatchNorm(use_running_average=False, use_fast_variance=False,
                         **BN_KW)
    variables = m_ref.init(jax.random.key(0), x)
    out_ref, mut_ref = m_ref.apply(variables, x, mutable=["batch_stats"])

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    m_fast = SpmdBatchNorm(use_running_average=False, **BN_KW)
    with mesh:
        out_sh, mut_sh = jax.jit(
            lambda v, xx: m.apply(v, xx, mutable=["batch_stats"]))(
                variables, xs)
        out_fast, mut_fast = jax.jit(
            lambda v, xx: m_fast.apply(v, xx, mutable=["batch_stats"]))(
                variables, xs)

    # exact-vs-exact agrees to f32 mean round-off at this offset…
    np.testing.assert_allclose(out_ref, out_sh, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(mut_ref["batch_stats"]["var"],
                               mut_sh["batch_stats"]["var"],
                               rtol=0.02, atol=1e-6)
    # …while the fast E[x^2]-E[x]^2 formula is catastrophically lossy here
    # (true var 0.25 vs eps*mu^2 ≈ 10 representation error), proving the
    # meshed branch really honored use_fast_variance=False
    fast_var_err = np.max(np.abs(np.asarray(mut_fast["batch_stats"]["var"])
                                 - np.asarray(mut_ref["batch_stats"]["var"])))
    assert fast_var_err > 0.02, fast_var_err


def test_private_api_contract():
    """SpmdBatchNorm leans on private jax/flax internals; this test exists
    to turn a silent failure mode into a loud one. If _ambient_mesh stops
    seeing the enclosing mesh after a jax upgrade (its bare except returns
    None), every other test here still passes — the pinned-stats branch
    just silently dies and GSPMD reverts to involuntary rematerialization.
    Pin the contract explicitly instead."""
    from flax.linen import normalization as _N

    from frlw_evd_tpu.models.blocks import _ambient_mesh

    assert _ambient_mesh() is None  # no mesh active
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    with mesh:
        m = _ambient_mesh()
        assert m is not None and set(m.axis_names) == {"data", "model"}
    # the flax privates the meshed/unmeshed branches call
    for name in ("_compute_stats", "_canonicalize_axes", "_normalize"):
        assert callable(getattr(_N, name)), name
