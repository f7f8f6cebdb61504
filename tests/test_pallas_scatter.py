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
