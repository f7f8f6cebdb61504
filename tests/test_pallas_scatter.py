"""Pallas scatter kernel correctness (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_scatter_matches_numpy(rng, monkeypatch):
    from jax.experimental import pallas as pl
    from frlw_evd_tpu.encode import pallas_scatter

    # run the kernel in interpreter mode (no TPU in the test env)
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_scatter.pl, "pallas_call", interp_call)

    B, E, size = 2, 2048, 5000
    idx = rng.integers(0, size, (B, E)).astype(np.int32)
    tv = rng.uniform(-1, 0, (B, E)).astype(np.float32)
    valid = rng.random((B, E)) < 0.9
    cnt, tsum = pallas_scatter.scatter_cnt_tsum_pallas(
        jnp.asarray(idx), jnp.asarray(tv), jnp.asarray(valid), size)
    for b in range(B):
        cref = np.zeros(size)
        np.add.at(cref, idx[b][valid[b]], 1.0)
        tref = np.zeros(size)
        np.add.at(tref, idx[b][valid[b]], tv[b][valid[b]])
        np.testing.assert_allclose(np.asarray(cnt[b]), cref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(tsum[b]), tref, atol=1e-3)


@pytest.mark.parametrize("dist", ["uniform", "one_cell", "striped",
                                  "low_band"])
@pytest.mark.parametrize("precise", [True, False])
def test_pallas_sorted_banded_matches_numpy(rng, monkeypatch, dist, precise):
    """Sorted-banded production kernel across distributions, incl. the
    chunk-span overflow fallback (striped indices make every sorted chunk
    span far more than Δ hi rows)."""
    from jax.experimental import pallas as pl
    from frlw_evd_tpu.encode import pallas_scatter

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_scatter.pl, "pallas_call", interp_call)

    size = 45_000                      # ~352 hi rows
    B, E = 2, 2100                     # E not a multiple of the chunk
    if dist == "uniform":
        idx = rng.integers(0, size, (B, E))
    elif dist == "one_cell":
        idx = np.full((B, E), 12345)
    elif dist == "striped":
        idx = (np.arange(B * E).reshape(B, E) * 997) % size
    else:
        idx = rng.integers(0, 300, (B, E))
    idx = idx.astype(np.int32)
    tv = rng.uniform(-1, 0, (B, E)).astype(np.float32)
    valid = rng.random((B, E)) < 0.9

    cnt, tsum = pallas_scatter.scatter_cnt_tsum_pallas_sorted(
        jnp.asarray(idx), jnp.asarray(tv), jnp.asarray(valid), size,
        precise)
    for b in range(B):
        cref = np.zeros(size)
        np.add.at(cref, idx[b][valid[b]], 1.0)
        tref = np.zeros(size)
        np.add.at(tref, idx[b][valid[b]], tv[b][valid[b]])
        np.testing.assert_allclose(np.asarray(cnt[b]), cref, atol=1e-6,
                                   err_msg=f"{dist} cnt")
        atol = 1e-3 if precise else 2e-2
        np.testing.assert_allclose(np.asarray(tsum[b]), tref, atol=atol,
                                   rtol=5e-3, err_msg=f"{dist} tsum")


def test_pallas_sorted_level3_band(rng, monkeypatch):
    """Multi-blob clusters whose sorted sub-chunks span far more than Δ
    hi-rows: the flag-gated third band level (32-event groups) must fire
    (f3 != 0) and the result must still match numpy exactly."""
    from jax.experimental import pallas as pl
    from frlw_evd_tpu.encode import pallas_scatter

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_scatter.pl, "pallas_call", interp_call)

    size = 500_000                     # ~3907 hi rows >> Δ=256
    B, E = 2, 2048
    centers = rng.integers(0, size, 20)
    blob = centers[rng.integers(0, 20, (B, E))]
    idx = np.clip(blob + rng.integers(-40, 40, (B, E)), 0,
                  size - 1).astype(np.int32)
    tv = rng.uniform(-1, 0, (B, E)).astype(np.float32)
    valid = rng.random((B, E)) < 0.95

    # the level-3 flags must actually fire on this pattern
    sent = pallas_scatter.LANES * (-(-size // pallas_scatter.LANES))
    idx_m = np.where(valid & (idx < size), idx, sent)
    idx_s = jnp.sort(jnp.asarray(idx_m), axis=1)
    n_hi = -(-size // pallas_scatter.LANES)
    max_base = (n_hi // 128) * 128
    _, f2, f3, _ = pallas_scatter._host_bands(
        idx_s, E // 1024, 1024, 256, n_hi, max_base)
    assert int(jnp.sum(f2 != 0)) > 0 and int(jnp.sum(f3 != 0)) > 0

    for precise in (True, False):
        cnt, tsum = pallas_scatter.scatter_cnt_tsum_pallas_sorted(
            jnp.asarray(idx), jnp.asarray(tv), jnp.asarray(valid), size,
            precise)
        for b in range(B):
            cref = np.zeros(size)
            np.add.at(cref, idx[b][valid[b]], 1.0)
            tref = np.zeros(size)
            np.add.at(tref, idx[b][valid[b]], tv[b][valid[b]])
            np.testing.assert_allclose(np.asarray(cnt[b]), cref, atol=1e-6,
                                       err_msg=f"precise={precise} cnt")
            atol = 1e-3 if precise else 2e-2
            np.testing.assert_allclose(np.asarray(tsum[b]), tref, atol=atol,
                                       rtol=5e-3,
                                       err_msg=f"precise={precise} tsum")


def test_taf_update_kernel_matches_packed(rng, monkeypatch):
    """taf_stream_step_kernel (fused Pallas update+leaky) == the packed
    reference path, on the folded state."""
    from jax.experimental import pallas as pl
    from frlw_evd_tpu.encode import pallas_scatter, pallas_update
    from frlw_evd_tpu.encode.streaming import taf_stream_step_packed
    from frlw_evd_tpu.encode.taf import leaky_transform

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_scatter.pl, "pallas_call", interp_call)
    monkeypatch.setattr(pallas_update.pl, "pallas_call", interp_call)

    B, H, W, K, E = 2, 32, 64, 8, 900
    state_p = jnp.asarray(
        np.random.default_rng(1).uniform(-50, 0, (B, H, W, 2 * K))
    ).astype(jnp.float32)
    state_f = state_p.reshape(B, H, W * 2 * K)

    for step in range(3):
        ev = np.zeros((B, E, 4), np.float32)
        ev[..., 0] = rng.integers(0, W, (B, E))
        ev[..., 1] = rng.integers(0, H, (B, E))
        ev[..., 2] = np.sort(rng.uniform(0, 1, (B, E)), axis=1)
        ev[..., 3] = rng.integers(0, 2, (B, E))
        nv = jnp.full(B, E if step != 1 else 0, jnp.int32)  # step 1: freeze
        state_p = taf_stream_step_packed(state_p, jnp.asarray(ev), nv,
                                         scatter="xla")
        state_f, vol = pallas_update.taf_stream_step_kernel(
            state_f, jnp.asarray(ev), nv, height=H, width=W)
        np.testing.assert_allclose(
            np.asarray(state_f).reshape(B, H, W, 2 * K),
            np.asarray(state_p), atol=5e-3, err_msg=f"step {step} state")
        want_vol = leaky_transform(state_p) / 255.0
        np.testing.assert_allclose(np.asarray(vol), np.asarray(want_vol),
                                   atol=2e-2, err_msg=f"step {step} vol")


def test_p64_state_matches_packed(rng, monkeypatch):
    """Patchified-state step == canonical packed step under the subpixel
    channel mapping, volume included."""
    from jax.experimental import pallas as pl
    from frlw_evd_tpu.encode import pallas_scatter, pallas_update
    from frlw_evd_tpu.encode.streaming import taf_stream_step_packed
    from frlw_evd_tpu.encode.taf import leaky_transform

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_scatter.pl, "pallas_call", interp_call)
    monkeypatch.setattr(pallas_update.pl, "pallas_call", interp_call)

    B, H, W, K, E = 2, 32, 64, 8, 800

    def to_p64(state_p):
        """(B, H, W, 2K) → (B, H/2, (W/2)*4*2K) folded with s-major blocks."""
        Bq, Hq, Wq, C = state_p.shape
        st = np.asarray(state_p).reshape(Bq, Hq // 2, 2, Wq // 2, 2, C)
        #  s = sx*2 + sy → order (sx, sy): transpose to (B, H2, W2, sx, sy, C)
        st = st.transpose(0, 1, 3, 4, 2, 5)
        return st.reshape(Bq, Hq // 2, (Wq // 2) * 4 * C)

    state_p = jnp.asarray(
        np.random.default_rng(1).uniform(-50, 0, (B, H, W, 2 * K))
    ).astype(jnp.float32)
    state_64 = jnp.asarray(to_p64(state_p))

    for step in range(2):
        ev = np.zeros((B, E, 4), np.float32)
        ev[..., 0] = rng.integers(0, W, (B, E))
        ev[..., 1] = rng.integers(0, H, (B, E))
        ev[..., 2] = np.sort(rng.uniform(0, 1, (B, E)), axis=1)
        ev[..., 3] = rng.integers(0, 2, (B, E))
        nv = jnp.full(B, E, jnp.int32)
        state_p = taf_stream_step_packed(state_p, jnp.asarray(ev), nv,
                                         scatter="xla")
        state_64, vol = pallas_update.taf_stream_step_kernel_p64(
            state_64, jnp.asarray(ev), nv, height=H, width=W)
        np.testing.assert_allclose(np.asarray(state_64),
                                   to_p64(state_p), atol=5e-3,
                                   err_msg=f"step {step}")
        want_vol = to_p64(leaky_transform(state_p) / 255.0).reshape(
            B, H // 2, W // 2, 8 * K)
        np.testing.assert_allclose(np.asarray(vol), want_vol, atol=2e-2,
                                   err_msg=f"step {step} vol")


@pytest.mark.slow
def test_p64_stems_match_canonical(rng):
    """BinsFusionModulePatched / FocusPatched on patchified input ==
    canonical stems on the raw grid, with SHARED parameters."""
    import jax
    from frlw_evd_tpu.models.blocks import Focus, space_to_depth_patches
    from frlw_evd_tpu.models.stems import (BinsFusionModule,
                                           BinsFusionModulePatched,
                                           FocusPatched)

    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 24, 16)).astype(np.float32))
    xp = space_to_depth_patches(x)

    for name, canon, patched in [
        ("bfm", BinsFusionModule(out_channels=24),
         BinsFusionModulePatched(out_channels=24)),
        ("focus", Focus(out_channels=24),
         FocusPatched(out_channels=24)),
    ]:
        v = jax.jit(canon.init, static_argnums=(2,))(jax.random.key(0), x,
                                                     False)
        v2 = jax.jit(patched.init, static_argnums=(2,))(jax.random.key(0),
                                                        xp, False)
        s1 = jax.tree.map(lambda a: a.shape, v)
        s2 = jax.tree.map(lambda a: a.shape, v2)
        assert s1 == s2, (name, s1, s2)
        y1 = canon.apply(v, x, False)
        y2 = patched.apply(v, xp, False)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   atol=1e-5, err_msg=name)


@pytest.mark.slow
def test_p64_kernel_stem_matches_canonical(rng, monkeypatch):
    """BinsFusionModulePatchedKernel (Pallas chain) == canonical BFM on the
    raw grid, shared parameters (eval mode)."""
    import jax
    from jax.experimental import pallas as pl
    from frlw_evd_tpu.models import pallas_stem
    from frlw_evd_tpu.models.blocks import space_to_depth_patches
    from frlw_evd_tpu.models.stems import (BinsFusionModule,
                                           BinsFusionModulePatchedKernel)

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_stem.pl, "pallas_call", interp_call)

    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 24, 16)).astype(np.float32))
    xp = space_to_depth_patches(x)
    canon = BinsFusionModule(out_channels=24)
    pk = BinsFusionModulePatchedKernel(out_channels=24)
    v = jax.jit(canon.init, static_argnums=(2,))(jax.random.key(0), x, False)
    v2 = jax.jit(pk.init, static_argnums=(2,))(jax.random.key(0), xp, False)
    s1 = jax.tree.map(lambda a: a.shape, v)
    s2 = jax.tree.map(lambda a: a.shape, v2)
    assert s1 == s2, (s1, s2)
    y1 = canon.apply(v, x, False)
    y2 = pk.apply(v, xp, False)
    # chain runs in bf16 inside the kernel
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=3e-2,
                               rtol=1e-2)


@pytest.mark.slow
def test_folded_kernel_stem_matches_canonical(rng, monkeypatch):
    """BinsFusionModuleFolded (pair-packed folded Pallas chain + zero-padded
    final conv) == canonical BFM on the raw grid, shared params."""
    import jax
    from jax.experimental import pallas as pl
    from frlw_evd_tpu.models import pallas_stem
    from frlw_evd_tpu.models.blocks import space_to_depth_patches
    from frlw_evd_tpu.models.stems import (BinsFusionModule,
                                           BinsFusionModuleFolded)

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pallas_stem.pl, "pallas_call", interp_call)

    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 24, 16)).astype(np.float32))
    xp = space_to_depth_patches(x)                  # (2, 8, 12, 64)
    xf = xp.reshape(2, 8, 12 * 64)
    canon = BinsFusionModule(out_channels=24)
    fold = BinsFusionModuleFolded(out_channels=24)
    v = jax.jit(canon.init, static_argnums=(2,))(jax.random.key(0), x, False)
    v2 = jax.jit(fold.init, static_argnums=(2,))(jax.random.key(0), xf,
                                                 False)
    s1 = jax.tree.map(lambda a: a.shape, v)
    s2 = jax.tree.map(lambda a: a.shape, v2)
    assert s1 == s2, (s1, s2)
    y1 = canon.apply(v, x, False)
    y2 = fold.apply(v, xf, False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=3e-2,
                               rtol=1e-2)
