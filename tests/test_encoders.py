"""Encoder parity tests: jitted TPU encoders vs the numpy sequential oracle,
and the oracle vs an independent brute-force simulation of the reference's
queue-shift loop."""

import numpy as np
import pytest

import jax.numpy as jnp

from frlw_evd_tpu.encode import oracle
from frlw_evd_tpu.encode.common import pad_events
from frlw_evd_tpu.encode.event_volume import encode_event_volume, encode_event_volume_batch
from frlw_evd_tpu.encode.count_image import encode_count_image
from frlw_evd_tpu.encode.sae import encode_sae, sae_init_state
from frlw_evd_tpu.encode.taf import (
    bucket_events_for_taf,
    encode_taf_window,
    leaky_transform,
    taf_bin_step,
    taf_init_state,
)

H, W = 48, 64


def make_events(rng, n, t_lo=0.0, t_hi=1.0):
    ev = np.zeros((n, 4), dtype=np.float32)
    ev[:, 0] = rng.integers(0, W, n)
    ev[:, 1] = rng.integers(0, H, n)
    ev[:, 2] = np.sort(rng.uniform(t_lo, t_hi, n)).astype(np.float32)
    ev[:, 3] = rng.integers(0, 2, n)
    return ev


# ---------------------------------------------------------------------------
# Event Volume
# ---------------------------------------------------------------------------

def test_event_volume_matches_oracle(rng):
    ev = make_events(rng, 3000)
    ref = oracle.event_volume(ev, (H, W), 5)  # (10, H, W)
    padded, n = pad_events(ev, 4096)
    got = encode_event_volume(jnp.asarray(padded), n, height=H, width=W,
                              volume_bins=5)
    got_chw = np.asarray(got).transpose(2, 0, 1)
    np.testing.assert_allclose(got_chw, ref, atol=2e-3)


def test_event_volume_padding_invariance(rng):
    ev = make_events(rng, 100)
    outs = []
    for cap in (128, 512):
        padded, n = pad_events(ev, cap)
        outs.append(np.asarray(
            encode_event_volume(jnp.asarray(padded), n, height=H, width=W)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)


def test_event_volume_boundary_times(rng):
    """t=0 and t=1 exactly: t=0 contributes nothing; t=1 lands in the last bin."""
    ev = np.array([[1, 1, 0.0, 1], [2, 2, 1.0, 0]], dtype=np.float32)
    ref = oracle.event_volume(ev, (H, W), 5)
    padded, n = pad_events(ev, 16)
    got = np.asarray(encode_event_volume(jnp.asarray(padded), n,
                                         height=H, width=W)).transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    assert ref[:, 1, 1].sum() == 0.0          # t=0 → zero weight everywhere
    assert ref[9, 2, 2] == pytest.approx(51.0)  # t=1 → bin 5, p=0 chan = 2*4+1


def test_event_volume_batch(rng):
    evs = [make_events(rng, 200), make_events(rng, 350)]
    padded = np.stack([pad_events(e, 512)[0] for e in evs])
    ns = np.array([200, 350], np.int32)
    got = encode_event_volume_batch(jnp.asarray(padded), jnp.asarray(ns),
                                    height=H, width=W)
    for i, e in enumerate(evs):
        ref = oracle.event_volume(e, (H, W), 5)
        np.testing.assert_allclose(np.asarray(got[i]).transpose(2, 0, 1), ref,
                                   atol=2e-3)


# ---------------------------------------------------------------------------
# Count Image
# ---------------------------------------------------------------------------

def test_count_image_matches_oracle(rng):
    # enough events to hit the clamp-at-1 path: concentrate on a small patch
    ev = make_events(rng, 5000)
    ev[:1000, 0] = rng.integers(0, 4, 1000)
    ev[:1000, 1] = rng.integers(0, 4, 1000)
    ref = oracle.count_image(ev, (H, W))
    padded, n = pad_events(ev, 8192)
    got = np.asarray(encode_count_image(jnp.asarray(padded), n,
                                        height=H, width=W)).transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref, atol=1e-3)
    assert ref.max() == 255.0  # clamp hit


# ---------------------------------------------------------------------------
# SAE
# ---------------------------------------------------------------------------

def test_sae_matches_oracle(rng):
    now = 1_000_000.0
    ev = make_events(rng, 2000, t_lo=0, t_hi=now)
    ref, ref_mem = oracle.sae(ev, (H, W), [1e-5, 2.5e-6, 1e-6], None, now)
    padded, n = pad_events(ev, 2048)
    mem0 = sae_init_state(H, W, now=now)
    got, mem = encode_sae(jnp.asarray(padded), n, mem0, jnp.float32(now),
                          height=H, width=W)
    # channel orders differ: ours (H,W,2*nl) c=2*lam+p; oracle (nl*2,H,W)
    got_chw = np.asarray(got).transpose(2, 0, 1)
    np.testing.assert_allclose(got_chw, ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mem).transpose(2, 0, 1),
                               ref_mem, rtol=1e-6)


def test_sae_memory_merge(rng):
    """Second window: memory keeps pixels that fired earlier."""
    now1, now2 = 500_000.0, 1_000_000.0
    ev1 = make_events(rng, 500, 0, now1)
    ev2 = make_events(rng, 500, now1, now2)
    _, mem_np = oracle.sae(ev1, (H, W), [1e-5], None, now1)
    ref2, _ = oracle.sae(ev2, (H, W), [1e-5], mem_np, now2)

    p1, n1 = pad_events(ev1, 512)
    p2, n2 = pad_events(ev2, 512)
    mem0 = sae_init_state(H, W, now=now1)
    _, mem_j = encode_sae(jnp.asarray(p1), n1, mem0, jnp.float32(now1),
                          height=H, width=W, lamdas=(1e-5,))
    got2, _ = encode_sae(jnp.asarray(p2), n2, mem_j, jnp.float32(now2),
                         height=H, width=W, lamdas=(1e-5,))
    np.testing.assert_allclose(np.asarray(got2).transpose(2, 0, 1), ref2,
                               rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# TAF
# ---------------------------------------------------------------------------

def torch_style_taf_bin(events, shape, state):
    """Independent brute-force replica of the reference's K-indexed shift loop
    (generate_taf.py:39-51), used to validate the oracle's vectorised form."""
    Hh, Ww = shape
    K = state.shape[-1]
    cnt = np.zeros((Hh, Ww, 2), np.float32)
    tsum = np.zeros((Hh, Ww, 2), np.float32)
    for ex, ey, et, ep in events:
        cnt[int(ey), int(ex), int(ep)] += 1
        tsum[int(ey), int(ex), int(ep)] += et - 1.0
    tmean = tsum / (cnt + 1e-8)
    forward = cnt == 0
    if forward.all():
        return state
    ecd = np.concatenate([state, tmean[..., None]], axis=-1)  # K+1 slots
    for i in range(ecd.shape[-1] - 1, 0, -1):
        ecd[..., i - 1] = ecd[..., i - 1] - 1
        ecd[..., i] = np.where(forward, ecd[..., i - 1], ecd[..., i])
    return ecd[..., 1:]


def test_taf_oracle_matches_reference_loop(rng):
    state = oracle.taf_init_state((H, W), 8)
    state_ref = state.copy()
    for _ in range(5):
        ev = make_events(rng, 300)
        state = oracle.taf_bin(ev, (H, W), state)
        state_ref = torch_style_taf_bin(ev, (H, W), state_ref)
        np.testing.assert_allclose(state, state_ref, atol=1e-4)


def test_taf_empty_bin_freezes_state(rng):
    state = oracle.taf_init_state((H, W), 4)
    ev = make_events(rng, 100)
    state = oracle.taf_bin(ev, (H, W), state)
    frozen = oracle.taf_bin(np.zeros((0, 4), np.float32), (H, W), state)
    np.testing.assert_array_equal(frozen, state)
    # jit version
    sj = taf_bin_step(jnp.asarray(state), jnp.zeros((64, 4), jnp.float32), 0)
    np.testing.assert_allclose(np.asarray(sj), state)


def test_taf_jit_step_matches_oracle(rng):
    state_np = oracle.taf_init_state((H, W), 8)
    state_j = jnp.asarray(state_np)
    for _ in range(4):
        ev = make_events(rng, 400)
        state_np = oracle.taf_bin(ev, (H, W), state_np)
        padded, n = pad_events(ev, 512)
        state_j = taf_bin_step(state_j, jnp.asarray(padded), n)
        np.testing.assert_allclose(np.asarray(state_j), state_np, atol=1e-4)


def test_taf_window_scan_matches_oracle(rng):
    """Full 80 ms window in 10 ms bins, raw µs timestamps, incl. bucketing."""
    start, end, bin_us = 0, 80_000, 10_000
    n = 5000
    ev = np.zeros((n, 4), dtype=np.float32)
    ev[:, 0] = rng.integers(0, W, n)
    ev[:, 1] = rng.integers(0, H, n)
    ev[:, 2] = np.sort(rng.integers(start, end, n)).astype(np.float32)
    ev[:, 3] = rng.integers(0, 2, n)

    state_np = oracle.taf_init_state((H, W), 8)
    vol_ref, state_np = oracle.taf_window(ev, (H, W), start, end, bin_us, state_np)

    binned, bin_valid = bucket_events_for_taf(ev, start, end, bin_us, 1024)
    state_j = encode_taf_window(taf_init_state(H, W, 8), jnp.asarray(binned),
                                jnp.asarray(bin_valid))
    got = np.asarray(state_j)
    # oracle volume is (2K,H,W) slot-major; compare raw states instead
    np.testing.assert_allclose(got, state_np, atol=1e-3)
    # and the leaky transform agrees
    np.testing.assert_allclose(
        np.asarray(leaky_transform(jnp.asarray(state_np))),
        oracle.leaky_transform(state_np), rtol=1e-5, atol=1e-3)


def test_taf_resume_across_windows(rng):
    """State carried across two windows equals one long window."""
    bin_us = 10_000
    n = 4000
    ev = np.zeros((n, 4), dtype=np.float32)
    ev[:, 0] = rng.integers(0, W, n)
    ev[:, 1] = rng.integers(0, H, n)
    ev[:, 2] = np.sort(rng.integers(0, 160_000, n)).astype(np.float32)
    ev[:, 3] = rng.integers(0, 2, n)

    s_full = oracle.taf_init_state((H, W), 8)
    _, s_full = oracle.taf_window(ev, (H, W), 0, 160_000, bin_us, s_full)

    s_split = oracle.taf_init_state((H, W), 8)
    first = ev[ev[:, 2] < 80_000]
    second = ev[ev[:, 2] >= 80_000]
    _, s_split = oracle.taf_window(first, (H, W), 0, 80_000, bin_us, s_split)
    _, s_split = oracle.taf_window(second, (H, W), 80_000, 160_000, bin_us, s_split)
    # boundary events (t == 80_000 exactly) may bucket differently; exclude ties
    if not (ev[:, 2] == 80_000).any():
        np.testing.assert_allclose(s_split, s_full, atol=1e-3)


def test_taf_blob_finisher(rng):
    state = oracle.taf_init_state((H, W), 8)
    ev = make_events(rng, 2000)
    state = oracle.taf_bin(ev, (H, W), state)
    vol = state.transpose(3, 2, 0, 1).reshape(16, H, W)
    b4, b8 = oracle.taf_blob(vol, 8)
    assert b4.shape == (8, H, W) and b8.shape == (8, H, W)
    # newest bin (just updated, values near 0 → leaky ≈ 255·(1-log1p(age)/8.7))
    # must appear in the bins4 (newest-first) blob
    assert b4[0].max() >= b8[0].max()


def test_nearest_resize_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    vol = rng.uniform(0, 255, (6, 240, 304)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(vol)[None], size=(256, 320), mode="nearest")[0].numpy()
    got = oracle.nearest_resize(vol, (256, 320))
    np.testing.assert_array_equal(got, ref)
