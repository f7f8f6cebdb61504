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
