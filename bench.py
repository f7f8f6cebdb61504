"""Headline benchmark: streaming encode→detect throughput on one TPU chip.

Pipeline measured (the flagship GEN1 AED + TAF-K8 recipe, fused on device —
the path the reference leaves dormant in data/fetcher.py + data/sparse_ops.py
and instead runs offline + batch-1 GPU eval):

  per 10 ms window and per stream: one TAF queue update (scatter of E events
  into the (H, W, 2, 8) state), leaky transform → 16-channel volume, nearest
  resize to 256×320, AED forward (BFM stem + Darknet-21 + PAFPN + YOLOX head),
  decode + confidence gate + NMS — all inside ONE jitted step, batched over
  B parallel streams.

Baseline denominator (see BASELINE.md): the reference publishes no numbers;
its eval loop processes 10 ms windows at batch 1 with CUDA-synced per-window
timing, i.e. real-time operation = 100 windows/s. We report
vs_baseline = windows_per_second / 100.0 — the "×10 real-time per chip" gate
of BASELINE.json corresponds to vs_baseline >= 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import os as _os

import jax_cache_env  # noqa: F401  (env setup BEFORE jax import)

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from frlw_evd_tpu.encode.streaming import (taf_pack_state, taf_stream_step,
                                           taf_stream_step_folded,
                                           taf_stream_step_packed)
from frlw_evd_tpu.encode.taf import leaky_transform
from frlw_evd_tpu.models import build_detector
from frlw_evd_tpu.models.detector import eval_decode
from frlw_evd_tpu.models.postprocess import postprocess_batch

CONFIGS = {
    # flagship: GEN1 AED + TAF-K8 streaming (the mAP-parity recipe).
    # Round-5 A/B winner (log/round5/r5_gen1g_session.log): folded state +
    # fused Pallas update+leaky kernel + banded Pallas scatter, split
    # pipeline — 3023.2 w/s vs 2758.8 for the fused dense-one-hot path
    # (kept below as gen1_taf_dense). Volume parity is gated by
    # tests/test_bench_pipelines.py::test_gen1_pipeline_variants_agree.
    # batch sweep on v5e (kernel): 128 -> 3023, 192 -> 2246, 256 -> 2694;
    # (dense): 64 -> 2270, 128 -> 2660, 256 -> 2340 w/s — 128 is the peak
    # for both formulations
    "gen1_taf": dict(sensor_hw=(240, 304), input_hw=(256, 320), batch=128,
                     events_per_bin=16384, scatter="pallas", kernel=True,
                     metric="gen1_aed_taf8_encode_detect_throughput"),
    # previous flagship formulation (fused dense one-hot MXU scatter, one
    # program) kept for A/B
    "gen1_taf_dense": dict(sensor_hw=(240, 304), input_hw=(256, 320),
                           batch=128, events_per_bin=16384,
                           metric="gen1_aed_taf8_encode_detect_throughput"),
    # 1MEGAPIXEL: the reference scales event coordinates and encodes gen4 at
    # the 512x640 target resolution (generate_taf.py:216-219) — the state
    # grid never exists at 720x1280. The 655k-cell grid makes the dense
    # one-hot scatter O(E·P)-bound, so it uses the sort-bucketed histogram
    # (94 ms vs 151 ms mxu vs ~300 ms XLA serial scatter at batch 128).
    # batch sweep: 16 -> 264 w/s, 32 -> 338, 64 -> 433, 128 -> 494
    "gen4_taf": dict(sensor_hw=(512, 640), input_hw=(512, 640), batch=128,
                     events_per_bin=65536, scatter="pallas",
                     p64=True, folded_stem=True,
                     metric="gen4_aed_taf8_encode_detect_throughput"),
    # gen1 with the patchified detector input assembled straight from the
    # sensor-res state (4 quarter-res block gathers replace the full-input
    # resize; bfm_p64 stem) — A/B against gen1_taf
    "gen1_taf_p64": dict(sensor_hw=(240, 304), input_hw=(256, 320),
                         batch=128, events_per_bin=16384, p64_input=True,
                         metric="gen1_aed_taf8_encode_detect_throughput"),
    # previous packed-state (full-res 16-channel) pipeline for A/B
    "gen4_taf_packed": dict(sensor_hw=(512, 640), input_hw=(512, 640),
                            batch=128, events_per_bin=65536,
                            scatter="pallas", packed=True,
                            metric="gen4_aed_taf8_encode_detect_throughput"),
    # gen1 encode-stage attack A/Bs (the encode stage is ~63% of the gen1
    # step — log/round5 gen1_split_int8_profile): the gen4 formulations at
    # GEN1 geometry. packed = network-channel-order state + pallas banded
    # scatter, XLA update; kernel = folded state + fused Pallas
    # update+leaky kernel (one HBM pass) + pallas banded scatter.
    "gen1_taf_packed": dict(sensor_hw=(240, 304), input_hw=(256, 320),
                            batch=128, events_per_bin=16384,
                            scatter="pallas", packed=True,
                            metric="gen1_aed_taf8_encode_detect_throughput"),
    # previous-round gen4 pipeline kept for A/B comparison
    "gen4_taf_xla": dict(sensor_hw=(512, 640), input_hw=(512, 640), batch=128,
                         events_per_bin=65536, fused=False, scatter="sorted",
                         metric="gen4_aed_taf8_encode_detect_throughput"),
    # training throughput: the production SimOTA train step (VERDICT r2 #4).
    # Reference recipe: core/exp.py:283-315 trains AED on offline-encoded
    # TAF volumes at batch 64; baseline denominator stays the 10 ms-window
    # real-time rate (100 windows/s), so vs_baseline is windows/s / 100.
    "gen1_train": dict(train=True, input_hw=(256, 320), batch=64,
                       num_classes=2,
                       metric="gen1_aed_taf8_simota_train_throughput"),
    "gen4_train": dict(train=True, input_hw=(512, 640), batch=32,
                       num_classes=7,
                       metric="gen4_aed_taf8_simota_train_throughput"),
    # batch-1 serving latency: ms per 10 ms window, encode+detect+NMS,
    # host-read fenced — the reference's headline serving metric
    # (test.py:20 batch-1 note; evaluate/evaluator.py:105-108 per-window
    # CUDA-synced timing). vs_baseline = 10 ms / measured ms (>1 ⇒ faster
    # than real time at batch 1).
    "gen1_latency": dict(sensor_hw=(240, 304), input_hw=(256, 320), batch=1,
                         events_per_bin=16384, latency=True,
                         metric="gen1_aed_taf8_batch1_window_latency"),
    # batch-1 latency through the fused-kernel pipeline (the round-5
    # throughput winner) — fewer HBM passes should shave the device leg
    "gen1_latency_kernel": dict(sensor_hw=(240, 304), input_hw=(256, 320),
                                batch=1, events_per_bin=16384, latency=True,
                                scatter="pallas", kernel=True,
                                metric="gen1_aed_taf8_batch1_window_latency"),
    "gen4_latency": dict(sensor_hw=(512, 640), input_hw=(512, 640), batch=1,
                         events_per_bin=65536, scatter="pallas",
                         p64=True, folded_stem=True, latency=True,
                         metric="gen4_aed_taf8_batch1_window_latency"),
    # per-representation streaming ENCODER throughput (reference: the
    # timing counters in generate_eventvolume.py:151-175 sweep all four
    # representations; TAF's encode stage is covered by --profile above)
    "gen1_eci": dict(encoder="eci", sensor_hw=(240, 304), batch=128,
                     events_per_bin=16384,
                     metric="gen1_eci_stream_encode_throughput"),
    "gen1_sae": dict(encoder="sae", sensor_hw=(240, 304), batch=128,
                     events_per_bin=16384,
                     metric="gen1_sae_stream_encode_throughput"),
    # serial `.at[].max` SAE A/B: costs O(E) independent of key clustering,
    # so it may win on skewed streams where the sorted path pays for
    # same-cell runs (uniform: sorted 7134 w/s vs max 3523 profiled)
    "gen1_sae_max": dict(encoder="sae", sae_impl="max", sensor_hw=(240, 304),
                         batch=128, events_per_bin=16384,
                         metric="gen1_sae_stream_encode_throughput_max"),
    "gen1_ev": dict(encoder="ev", sensor_hw=(240, 304), batch=128,
                    events_per_bin=16384,
                    metric="gen1_ev_stream_encode_throughput"),
    "gen1_frame": dict(encoder="frame", sensor_hw=(240, 304), batch=128,
                       events_per_bin=16384,
                       metric="gen1_frame_stream_encode_throughput"),
}
# the gen1g session rows were banked under this name before the winning
# formulation became the gen1_taf default — keep it as a true alias so the
# two names can never fork
CONFIGS["gen1_taf_kernel"] = CONFIGS["gen1_taf"]

K = 8
STEPS_PER_CALL = 10   # distinct synthetic event batches cycled over


def _quant_ctx(quant):
    """Context manager for the optional int8 serving path: `quant` is
    (act_scales, weight_table) from models/quantize.py, or None for bf16."""
    from frlw_evd_tpu.models.quantize import int8_ctx

    return int8_ctx(*(quant or (None, None)))


def _detect_body(model, variables, vol, nms_impl, quant):
    """The detect stage every pipeline shares: model forward (optionally
    int8), f32 decode, fixed-size NMS, scalar keep-count. One definition —
    an A/B between pipeline builders must only vary the encode side."""
    with _quant_ctx(quant):
        outs = model.apply(variables, vol, False)
    outs = [o.astype(jnp.float32) for o in outs]
    decoded = eval_decode(outs, (8, 16, 32))
    _, keep = postprocess_batch(decoded, max_detections=100,
                                nms_impl=nms_impl)
    return keep.sum()


def _make_detect(model, variables, nms_impl, quant):
    @jax.jit
    def detect(vol):
        return _detect_body(model, variables, vol, nms_impl, quant)

    return detect


def _attach_stages(encode_transform, detect):
    def run_step(state, ev, nv):
        # python-chained stages cost ~dispatch only (and a scan over steps
        # made the remote compiler pathologically slow)
        state, vol = encode_transform(state, ev, nv)
        return state, detect(vol)

    run_step.stages = {"encode_transform": encode_transform,
                       "detect": detect}
    return run_step


def _nearest_resize_batched(vol, sensor_hw, input_hw):
    """Nearest resize of a (B, H, W, C) volume as two single-axis takes — a
    combined 2D-index gather costs ~40 ms on the gen4 grid. No-op when the
    shapes already match."""
    if input_hw == sensor_hw:
        return vol
    h, w = sensor_hw
    ys = (jnp.arange(input_hw[0]) * (h / input_hw[0])).astype(jnp.int32)
    xs = (jnp.arange(input_hw[1]) * (w / input_hw[1])).astype(jnp.int32)
    return jnp.take(jnp.take(vol, ys, axis=1), xs, axis=2)


def make_pipeline_p64(model, variables, sensor_hw, scatter="pallas",
                      folded=False, nms_impl="fixpoint", quant=None):
    """Patchified-state pipeline: the TAF queue lives at quarter resolution
    with the 2x2 subpixels packed into channels (s-major, 4*2K = 64-channel
    minor → 4x the TPU lane occupancy of the 16-channel layout), the fused
    Pallas update kernel produces the space-to-depth'd detector input
    directly, and the *_p64 stem skips its patchify. Only valid when
    input_hw == sensor_hw (the 1MEGAPIXEL recipe)."""
    from frlw_evd_tpu.encode.pallas_update import taf_stream_step_kernel_p64

    h, w = sensor_hw

    @partial(jax.jit, donate_argnums=(0,))
    def encode_transform(state_f, xytp, n_valid):
        return taf_stream_step_kernel_p64(state_f, xytp, n_valid,
                                          height=h, width=w,
                                          scatter=scatter, precise=False,
                                          fold_output=folded)

    return _attach_stages(encode_transform,
                          _make_detect(model, variables, nms_impl, quant))


def make_pipeline_packed(model, variables, sensor_hw, input_hw,
                         scatter="pallas", nms_impl="fixpoint", quant=None):
    """Packed-state pipeline: the TAF queue lives in the network channel
    order (B, H, W, 2K), so the whole update is elementwise and
    leaky_transform(state) IS the detector input — no reversal/transpose
    gather. Scatter via the banded VMEM Pallas kernel by default."""
    h, w = sensor_hw

    @partial(jax.jit, donate_argnums=(0,))
    def encode_transform(state, xytp, n_valid):
        # NB: a folded (B, H, W*2K) state variant was measured and NOT kept:
        # the elementwise update is HBM-bound either way (~300-450 GB/s
        # effective) and the fold costs an extra relayout of the volume
        state = taf_stream_step_packed(state, xytp, n_valid,
                                       scatter=scatter, precise=False)
        vol = (leaky_transform(state) / 255.0).astype(jnp.bfloat16)
        return state, _nearest_resize_batched(vol, (h, w), input_hw)

    return _attach_stages(encode_transform,
                          _make_detect(model, variables, nms_impl, quant))


def make_pipeline_kernel(model, variables, sensor_hw, input_hw,
                         scatter="pallas", nms_impl="fixpoint", quant=None):
    """Folded-state pipeline at any geometry: the TAF queue lives as
    (B, H, W*2K) f32 (full-lane tiles), the fused Pallas update kernel
    (encode/pallas_update.py taf_stream_step_kernel) does queue update +
    leaky + bf16 cast in ONE HBM pass, and the banded Pallas scatter replaces
    the dense one-hot histogram. This is the gen4 encode formulation applied
    to GEN1 — built to attack the gen1 encode stage (31.4 ms = ~63% of the
    step, log/round5 gen1_split_int8_profile)."""
    from frlw_evd_tpu.encode.pallas_update import taf_stream_step_kernel

    h, w = sensor_hw

    @partial(jax.jit, donate_argnums=(0,))
    def encode_transform(state_f, xytp, n_valid):
        state_f, vol = taf_stream_step_kernel(state_f, xytp, n_valid,
                                              height=h, width=w,
                                              scatter=scatter, precise=False)
        # vol (B, H, W, 2K) bf16 in [0, 1] — the network-input channel order
        return state_f, _nearest_resize_batched(vol, (h, w), input_hw)

    return _attach_stages(encode_transform,
                          _make_detect(model, variables, nms_impl, quant))


def make_pipeline(model, variables, sensor_hw, input_hw, scatter="mxu",
                  fused=True, nms_impl="fixpoint", p64_input=False,
                  quant=None):
    """fused=True compiles the whole window as one program; fused=False
    chains three jits (encode / transform / detect). Measured on v5e: GEN1
    prefers fused (26.5 vs 28.7 ms), gen4 prefers split (61 vs 66 ms) —
    XLA's layout choices for the large scatter intermediates pessimize the
    conv pipeline when they share a program at the 512x640 grid. The stage
    boundaries (state grid, input volume) live in HBM either way.

    p64_input=True assembles the PATCHIFIED detector input directly from
    the sensor-resolution state — four quarter-res block gathers replace
    the full-input-resolution resize, and the model must use the bfm_p64
    stem (identical params): the 16-channel-minor full-resolution input
    volume never exists, so every stem op runs at quarter res / 64-minor."""
    if scatter not in ("mxu", "sorted", "xla"):
        # the unpacked (B,H,W,2,K)-state step has no banded-Pallas variant;
        # reject rather than silently fall through to the serial XLA
        # scatter under a "pallas" label
        raise ValueError(f"make_pipeline supports scatter 'mxu', 'sorted' "
                         f"or 'xla' (serial), got {scatter!r} — the pallas "
                         f"formulation needs the packed/kernel/p64 pipeline")
    h, w = sensor_hw

    def _state_to_input(state):
        # (H, W, 2, K) → newest-first (H, W, 2K) leaky volume → resize → /255
        vol = state[..., ::-1]
        vol = jnp.swapaxes(vol, 2, 3).reshape(h, w, 2 * K)
        # leaky transform in f32 (log1p precision), then cast BEFORE the
        # resize gather so it moves half the bytes
        vol = (leaky_transform(vol) / 255.0).astype(jnp.bfloat16)
        ys = (np.arange(input_hw[0]) * (h / input_hw[0])).astype(np.int32)
        xs = (np.arange(input_hw[1]) * (w / input_hw[1])).astype(np.int32)
        if p64_input:
            # patchified nearest resize: block s of the 2x2 space-to-depth
            # selects the resized grid's (2i+sy, 2j+sx) pixels, i.e. the
            # (ys[sy::2], xs[sx::2]) sensor rows/cols — s-major block order
            # [tl, bl, tr, br] matches space_to_depth_patches / bfm_p64
            blocks = [
                jnp.take(jnp.take(vol, jnp.asarray(ys[sy::2]), axis=0),
                         jnp.asarray(xs[sx::2]), axis=1)
                for sy, sx in ((0, 0), (1, 0), (0, 1), (1, 1))
            ]
            return jnp.concatenate(blocks, axis=-1)  # (H/2, W/2, 4*2K)
        if input_hw != (h, w):
            # nearest resize as two single-axis takes — a combined 2D-index
            # gather costs ~40 ms on the gen4 grid
            vol = jnp.take(jnp.take(vol, jnp.asarray(ys), axis=0),
                           jnp.asarray(xs), axis=1)
        return vol

    # donate the TAF queue state: the (B, H, W, 2, K) grid is 671 MB-2.7 GB —
    # in-place update instead of alloc+copy every window. encode+transform
    # share one program (saves a full state read: 118 vs 125 ms on gen4).
    @partial(jax.jit, donate_argnums=(0,))
    def encode_transform(state, xytp, n_valid):
        state = taf_stream_step(state, xytp, n_valid, precise=False,
                                use_sorted=(scatter == "sorted"),
                                use_mxu=(scatter == "mxu"))
        return state, jax.vmap(_state_to_input)(state)

    if not fused:
        return _attach_stages(encode_transform,
                              _make_detect(model, variables, nms_impl,
                                           quant))

    @partial(jax.jit, donate_argnums=(0,))
    def run_step_fused(state, ev, nv):
        state = taf_stream_step(state, ev, nv, precise=False,
                                use_sorted=(scatter == "sorted"),
                                use_mxu=(scatter == "mxu"))
        vol = jax.vmap(_state_to_input)(state).astype(jnp.bfloat16)
        return state, _detect_body(model, variables, vol, nms_impl, quant)

    return run_step_fused


def synth_events(rng, steps, batch, e_per_bin, sensor_hw):
    h, w = sensor_hw
    ev = np.zeros((steps, batch, e_per_bin, 4), np.float32)
    ev[..., 0] = rng.integers(0, w, ev.shape[:-1])
    ev[..., 1] = rng.integers(0, h, ev.shape[:-1])
    ev[..., 2] = rng.uniform(0, 1, ev.shape[:-1])
    ev[..., 3] = rng.integers(0, 2, ev.shape[:-1])
    n_valid = np.full((steps, batch), e_per_bin, np.int32)
    return jnp.asarray(ev), jnp.asarray(n_valid)


def synth_events_skewed(rng, steps, batch, e_per_bin, sensor_hw):
    """Automotive-like statistics: spatially clustered + bursty.

    ~70% of events concentrate in a handful of moving hotspots (vehicles,
    edges) with Gaussian spread, the rest is background; the per-window
    event count is lognormal-bursty (variable n_valid exercises the padding
    path). This is the regime where the sorted scatter's Δ-band assumption
    is stressed (dense clusters → many events per hi-row band) and where
    the overflow fallback can trigger.
    """
    h, w = sensor_hw
    n_hot = 6
    S_, B_, E_ = steps, batch, e_per_bin
    burst = np.clip(rng.lognormal(-0.3, 0.6, (S_, B_)), 0.05, 1.0)
    n_valid = np.maximum((E_ * burst).astype(np.int32), 256)

    cx0 = rng.uniform(0, w, (B_, n_hot))
    cy0 = rng.uniform(0, h, (B_, n_hot))
    vx = rng.uniform(-40, 40, (B_, n_hot))
    vy = rng.uniform(-20, 20, (B_, n_hot))
    sig = rng.uniform(4, max(h, w) / 12, (B_, n_hot))
    t_idx = np.arange(S_)[:, None, None]
    cx = np.clip(cx0[None] + vx[None] * 0.01 * t_idx, 0, w - 1)
    cy = np.clip(cy0[None] + vy[None] * 0.01 * t_idx, 0, h - 1)

    k = rng.integers(0, n_hot, (S_, B_, E_))
    hx = np.take_along_axis(cx, k, axis=2)
    hy = np.take_along_axis(cy, k, axis=2)
    hs = np.take_along_axis(np.broadcast_to(sig[None], (S_, B_, n_hot)),
                            k, axis=2)
    x = hx + rng.normal(0, 1, (S_, B_, E_)) * hs
    y = hy + rng.normal(0, 1, (S_, B_, E_)) * hs
    bg = rng.random((S_, B_, E_)) < 0.3
    x = np.where(bg, rng.uniform(0, w, (S_, B_, E_)), x)
    y = np.where(bg, rng.uniform(0, h, (S_, B_, E_)), y)

    ev = np.zeros((S_, B_, E_, 4), np.float32)
    ev[..., 0] = np.clip(x, 0, w - 1)
    ev[..., 1] = np.clip(y, 0, h - 1)
    ev[..., 2] = np.sort(rng.uniform(0, 1, (S_, B_, E_)), axis=2)
    ev[..., 3] = rng.integers(0, 2, (S_, B_, E_))
    return jnp.asarray(ev), jnp.asarray(n_valid)


def overflow_rate(ev, n_valid, sensor_hw, p64, s_chunk=1024, s_delta=256,
                  s_sub=128, s_sub3=32):
    """Host-side replica of the sorted scatter's three-level band check:
    fraction of valid events that the chunk band, the per-sub-chunk second
    band, AND the per-32-event third band all miss (→ serial fallback)."""
    h, w = sensor_hw
    lanes = 128
    total = over = 0
    steps, batch = ev.shape[:2]
    for s in range(min(steps, 3)):
        for b in range(batch):
            n = int(n_valid[s, b])
            x = np.asarray(ev[s, b, :n, 0]).astype(np.int64)
            y = np.asarray(ev[s, b, :n, 1]).astype(np.int64)
            p = np.asarray(ev[s, b, :n, 3]).astype(np.int64)
            if p64:
                sblk = (x & 1) * 2 + (y & 1)
                cell = ((y >> 1) * (w // 2) + (x >> 1)) * 4 + sblk
                idx = cell * 2 + p
            else:
                idx = (y * w + x) * 2 + p
            n_hi = -(-(h * w * 2) // lanes)
            pad = (-len(idx)) % s_chunk
            idx = np.sort(np.concatenate([idx, np.full(pad, n_hi * lanes)]))
            hi = idx // lanes
            V = s_delta // 2
            max_base = (n_hi // V) * V
            n_ch = len(idx) // s_chunk
            hic = hi.reshape(n_ch, s_chunk)
            base = np.clip((hic[:, 0] // V) * V, 0, max_base)
            dh = hic - base[:, None]
            in_grid = hic < n_hi
            unc1 = in_grid & (dh >= s_delta)
            n_sub = s_chunk // s_sub
            hisub = hic.reshape(n_ch, n_sub, s_sub)
            uncs = unc1.reshape(n_ch, n_sub, s_sub)
            m = np.min(np.where(uncs, hisub, n_hi), axis=2)
            base2 = np.clip((m // V) * V, 0, max_base)
            unc2 = uncs & ~(hisub - base2[..., None] < s_delta)
            n_s3 = s_sub // s_sub3
            hi3 = hisub.reshape(n_ch, n_sub, n_s3, s_sub3)
            unc3 = unc2.reshape(n_ch, n_sub, n_s3, s_sub3)
            m3 = np.min(np.where(unc3, hi3, n_hi), axis=3)
            base3 = np.clip((m3 // V) * V, 0, max_base)
            over += int((unc3 & ~(hi3 - base3[..., None] < s_delta)).sum())
            total += int(in_grid.sum())
    return over / max(total, 1)


def run_train_bench(cfg, batch, events_kind, remat=False, p64=False,
                    rng_impl="threefry2x32", remat_policy=None,
                    merged_head=False):
    """Jitted production SimOTA train step at production batch: ms/step,
    windows/s and MFU (XLA cost-analysis FLOPs over the v5e bf16 peak).

    p64=True routes through the patchified bfm_p64 stem (identical param
    tree/math; the step space-to-depths the volume once, so the
    full-resolution 16-channel-minor tensors never exist in fwd or bwd).
    rng_impl='rbg' uses the TPU hardware bit generator for dropout masks.
    merged_head=True runs each head level's cls+reg towers as two
    double-width convs (identical params/math) in fwd AND bwd."""
    import optax

    from frlw_evd_tpu.train.trainer import create_train_state, make_train_step
    from frlw_evd_tpu.utils.profiling import flops_report

    h, w = cfg["input_hw"]
    nc = cfg["num_classes"]
    model = build_detector(nc, family="aed", stem="bfm_p64" if p64 else "bfm",
                           head_merged=merged_head)
    tx = optax.adam(1e-3)
    sample = jnp.zeros((1, h, w, 2 * K), jnp.float32)
    if p64:
        from frlw_evd_tpu.models.blocks import space_to_depth_patches

        sample = space_to_depth_patches(sample)
    state = create_train_state(model, jax.random.key(0), sample, tx)
    step = make_train_step((8, 16, 32), nc, 2.5, half_precision=True,
                           remat=remat, patchify=p64,
                           remat_policy=remat_policy)

    rng = np.random.default_rng(0)
    n_lab = 40
    imgs = []
    # The STEPS_PER_CALL distinct input volumes are bench harness state, not
    # part of the step's working set — at gen4 batch 32 they alone cost
    # 10 x 32x512x640x16 f32 = 6.7 GB HBM, which is what actually raised
    # round-4's RESOURCE_EXHAUSTED (the full Adam step at batch 32 fits:
    # log/round5 train_profile_gen4). Store them bf16 when the f32 set would
    # exceed 4 GB; the step computes in bf16 regardless (half_precision),
    # and the production fused encode path already emits bf16 volumes.
    in_dtype = (jnp.bfloat16
                if STEPS_PER_CALL * batch * h * w * 2 * K * 4 > 4e9
                else jnp.float32)
    # Even bf16-stored, STEPS_PER_CALL distinct volumes can crowd the step
    # out of HBM at the largest geometries (gen1 batch 256: 10 x 671 MB =
    # 6.7 GB of harness state next to batch-256 activations — the
    # train_gen1_rbg_b256 RESOURCE_EXHAUSTED in log/round5). Cap the input
    # set at ~2 GB (>=2 distinct batches so steps never reuse the previous
    # step's exact input); the timed loop cycles over however many fit.
    vol_bytes = batch * h * w * 2 * K * jnp.dtype(in_dtype).itemsize
    n_inputs = max(2, min(STEPS_PER_CALL, int(2e9 // max(vol_bytes, 1))))
    labels = np.zeros((n_inputs, batch, n_lab, 5), np.float32)
    for s in range(n_inputs):
        if events_kind == "skewed":
            # leaky TAF volumes are mostly background with hot blobs:
            # per-sample blob positions and per-pixel noise inside each blob
            # (a constant fill would be far more degenerate than the
            # clustered event streams this mimics)
            vol = np.zeros((batch, h, w, 2 * K), np.float32)
            for b in range(batch):
                for _ in range(6):
                    cy, cx = rng.integers(0, h), rng.integers(0, w)
                    sz = int(rng.integers(8, 64))
                    y0, x0 = max(0, cy - sz), max(0, cx - sz)
                    region = vol[b, y0:cy + sz, x0:cx + sz]
                    region[:] = rng.uniform(0, 1, region.shape)
        else:
            vol = rng.uniform(0, 1, (batch, h, w, 2 * K)).astype(np.float32)
        imgs.append(jnp.asarray(vol, in_dtype))
        n_gt = rng.integers(3, n_lab // 2, batch)
        for b in range(batch):
            g = int(n_gt[b])
            labels[s, b, :g, 0] = rng.integers(0, nc, g)
            labels[s, b, :g, 1] = rng.uniform(20, w - 20, g)
            labels[s, b, :g, 2] = rng.uniform(20, h - 20, g)
            labels[s, b, :g, 3] = rng.uniform(8, 80, g)
            labels[s, b, :g, 4] = rng.uniform(8, 60, g)
    labels = jnp.asarray(labels)
    key = jax.random.key(1, impl=rng_impl)

    cost = flops_report(
        lambda st, im, lb, k: step(st, im, lb, k)[1]["total_loss"],
        state, imgs[0], labels[0], key)
    state, losses = step(state, imgs[0], labels[0], key)
    float(losses["total_loss"])  # fence (compile + warmup)

    n_steps = 30
    t0 = time.time()
    for i in range(n_steps):
        state, losses = step(state, imgs[i % n_inputs],
                             labels[i % n_inputs], key)
    float(losses["total_loss"])
    elapsed = time.time() - t0

    ms = elapsed / n_steps * 1000
    wps = n_steps * batch / elapsed
    peak = 197e12  # v5e bf16 peak
    mfu = cost["flops"] / (elapsed / n_steps) / peak
    tag = " (bf16-stored inputs)" if in_dtype == jnp.bfloat16 else ""
    print(f"# train: {ms:.2f} ms/step (batch {batch}), {wps:.1f} windows/s, "
          f"{cost['flops'] / 1e12:.2f} TFLOP/step, MFU {mfu:.1%}{tag}",
          file=sys.stderr)
    return wps


def run_encoder_bench(cfg, batch, events_kind):
    """Streaming ENCODER throughput for one representation (ECI / SAE /
    incremental Event Volume / binary frame) at gen1 geometry: w/s and
    Mev/s, state carried on device, host-read fenced. Matches the
    reference's per-encoder timing counters (generate_eventvolume.py:151-175)
    for the representations its offline generators sweep."""
    from frlw_evd_tpu.encode.count_image import encode_count_image
    from frlw_evd_tpu.encode.streaming import (event_frame_stream,
                                               event_volume_stream,
                                               sae_stream)

    h, w = cfg["sensor_hw"]
    E = cfg["events_per_bin"]
    kind = cfg["encoder"]
    rng = np.random.default_rng(0)
    synth = (synth_events_skewed if events_kind == "skewed"
             else synth_events)
    events, n_valid = synth(rng, STEPS_PER_CALL, batch, E, (h, w))
    # real µs timestamps: window i spans [i*10ms, (i+1)*10ms)
    ev_host = np.array(events)  # writable host copy
    for i in range(STEPS_PER_CALL):
        ev_host[i, ..., 2] = (i + ev_host[i, ..., 2]) * 10000.0
    events = jnp.asarray(ev_host)

    if kind == "eci":
        fn = jax.jit(jax.vmap(partial(encode_count_image, height=h, width=w)))

        def step(state, ev, nv, now):
            return fn(ev[..., :4], nv), None
    elif kind == "frame":
        def step(state, ev, nv, now):
            return event_frame_stream(ev, nv, None, height=h, width=w)
    elif kind == "ev":
        fn = jax.jit(partial(event_volume_stream, height=h, width=w, bins=5))

        def step(state, ev, nv, now):
            # now as a device scalar: a python float would retrace per step
            return fn(ev, nv, state, jnp.float32(now))
    elif kind == "sae":
        fn = jax.jit(partial(sae_stream, height=h, width=w,
                             impl=cfg.get("sae_impl", "sorted")))

        def step(state, ev, nv, now):
            return fn(ev, nv, state, jnp.float32(now))
    else:
        raise ValueError(kind)

    fence = lambda a: float(a[(0,) * a.ndim])
    state = None
    out, state = step(state, events[0], n_valid[0], 10000.0)
    fence(out)
    if state is not None:
        # warm the steady-state signature too: the first call traced the
        # state=None variant; the carried-state variant would otherwise
        # compile INSIDE the timed loop (tools/enc_profile.py measured the
        # actual SAE compute at 16.8 ms/batch where the loop reported 231)
        out, state = step(state, events[0], n_valid[0], 10000.0)
        fence(out)

    n_steps = 50
    t0 = time.time()
    for i in range(n_steps):
        s = i % STEPS_PER_CALL
        out, state = step(state, events[s], n_valid[s], (s + 1) * 10000.0)
    fence(out)
    elapsed = time.time() - t0

    wps = n_steps * batch / elapsed
    nv_host = np.asarray(n_valid)
    total_events = sum(int(nv_host[i % STEPS_PER_CALL].sum())
                       for i in range(n_steps))
    mev_s = total_events / elapsed / 1e6
    print(f"# {kind}: {wps:.1f} windows/s, {mev_s:.1f} Mev/s, "
          f"{elapsed / n_steps * 1000:.2f} ms per {batch}-stream window",
          file=sys.stderr)
    return wps


def _require_devices(timeout_s: int = 600):
    """Bounded jax.devices() probe: during a TPU-worker outage the axon
    backend can HANG every client indefinitely — fail fast with a clear
    message instead so the driver records an rc=1, not a timeout."""
    import threading

    res = {}

    def probe():
        try:
            res["d"] = jax.devices()
        except Exception as e:  # backend init error
            res["e"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "d" in res:
        return res["d"]
    msg = res.get("e", f"jax.devices() unresponsive after {timeout_s}s "
                       "(TPU worker outage — see tools/chip_poll.sh)")
    print(f"# TPU unavailable: {msg}", file=sys.stderr)
    sys.stderr.flush()
    sys.stdout.flush()
    _os._exit(1)


def make_parser():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="gen1_taf", choices=CONFIGS)
    parser.add_argument("--batch", type=int, default=0,
                        help="override config batch size")
    parser.add_argument("--events", default="uniform",
                        choices=("uniform", "skewed"),
                        help="synthetic event statistics: uniform, or "
                             "clustered+bursty automotive-like (VERDICT #6)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialise the forward in the backward "
                             "(jax.checkpoint): fits larger train batches "
                             "in the 16 GB HBM at ~1 extra forward of cost")
    parser.add_argument("--remat_policy", default=None,
                        choices=(None, "dots"),
                        help="remat policy: 'dots' keeps matmul/conv "
                             "outputs, recomputing only elementwise chains")
    parser.add_argument("--p64", action="store_true",
                        help="train through the patchified bfm_p64 stem "
                             "(identical math/params; quarter-res 64-minor "
                             "layout instead of full-res 16-minor)")
    parser.add_argument("--rng", default="threefry2x32",
                        choices=("threefry2x32", "rbg", "unsafe_rbg"),
                        help="dropout PRNG bit generator for the train step")
    parser.add_argument("--fused", default="auto", choices=("auto", "on", "off"),
                        help="override the config's fused/split pipeline "
                             "choice (single jitted program vs chained "
                             "encode/detect jits)")
    parser.add_argument("--merged_head", action="store_true",
                        help="run each head level's cls+reg towers as two "
                             "double-width convs (identical math/params; "
                             "MXU layout A/B)")
    parser.add_argument("--nms", default=None,
                        choices=("fixpoint", "sequential"),
                        help="NMS formulation in the timed postprocess "
                             "(on-chip A/B; identical keep masks). Default: "
                             "the config's 'nms' entry, else fixpoint.")
    parser.add_argument("--dtype", default="bf16", choices=("bf16", "int8"),
                        help="serving precision for the detector convs: "
                             "bf16, or post-training int8 (per-channel "
                             "weights, calibrated activations — the v5e "
                             "MXU runs int8 at 2x the bf16 rate). "
                             "Inference configs only.")
    parser.add_argument("--profile", action="store_true",
                        help="also print a per-stage breakdown (split "
                             "pipeline only) to stderr")
    parser.add_argument("--scatter", default="auto",
                        choices=("auto", "mxu", "sorted", "pallas", "xla"),
                        help="encode scatter formulation override for the "
                             "inference pipelines (auto = the config's "
                             "entry; unsupported pipeline/formulation "
                             "pairs are rejected, not substituted). "
                             "The sorted "
                             "O(E*delta) path profiled ~2x the dense "
                             "one-hot at GEN1's 146k-cell grid "
                             "(tools/enc_profile.py), so gen1_taf_sorted "
                             "is a queued A/B.")
    return parser


def validate_args(args):
    """Arg×config compatibility gate (pure python, no device work).

    Rejects any pipeline×flag pair that would otherwise silently run a
    formulation the banked row's label does not describe, resolves the
    per-config NMS default, and applies the int8 auto-split. Returns the
    config dict. Unit-tested directly (tests/test_bench_pipelines.py)."""
    cfg = CONFIGS[args.config]
    if args.dtype == "int8" and (cfg.get("train") or cfg.get("encoder")):
        raise SystemExit("--dtype int8 applies to the inference configs only")

    def _reject_inapplicable(kind, flags):
        bad = [name for name, hit in flags if hit]
        if bad:
            raise SystemExit(f"{', '.join(bad)} do(es) not apply to the "
                             f"{kind} config {args.config}")

    if cfg.get("encoder"):
        _reject_inapplicable("encoder", (
            ("--scatter", args.scatter != "auto"),
            ("--nms", args.nms is not None),
            ("--fused", args.fused != "auto"),
            ("--merged_head", args.merged_head),
            ("--profile", args.profile),
            ("--p64", args.p64),
            ("--remat", args.remat),
            ("--remat_policy", args.remat_policy is not None),
            ("--rng", args.rng != "threefry2x32")))
    elif cfg.get("train"):
        _reject_inapplicable("train", (
            ("--scatter", args.scatter != "auto"),
            ("--nms", args.nms is not None),
            ("--fused", args.fused != "auto"),
            ("--profile", args.profile)))
    else:
        _reject_inapplicable("inference", (
            ("--p64", args.p64),
            ("--remat", args.remat),
            ("--remat_policy", args.remat_policy is not None),
            ("--rng", args.rng != "threefry2x32")))
        # the kernel/packed/p64 formulations are inherently split programs;
        # --fused only selects between the canonical pipeline's two forms.
        # Checked BEFORE the int8 auto-split below mutates args.fused — the
        # guard is about what the USER asked for, and int8 on the kernel
        # flagship (--config gen1_taf --dtype int8, the 3299.6 w/s
        # headline) must keep working.
        if args.fused != "auto" and (cfg.get("p64") or cfg.get("packed")
                                     or cfg.get("kernel")):
            raise SystemExit(f"--fused does not apply to the {args.config} "
                             f"pipeline (kernel/packed/p64 formulations "
                             f"are split by construction); use "
                             f"gen1_taf_dense for the fused-vs-split A/B")
        if args.dtype == "int8" and args.fused == "auto":
            # calibration reads the encode stage's output volume, and the
            # quantized detect program differs anyway — split pipeline
            args.fused = "off"

    if args.nms is None:
        args.nms = cfg.get("nms", "fixpoint")
    return cfg


def run_config(args):
    """Run one benchmark config; returns the result dict that main() prints
    as the driver JSON line. `args` is the parsed namespace from
    make_parser() (the warm-process session driver constructs it directly
    to run many configs in one process — tools/r5_session.py)."""
    cfg = validate_args(args)
    if cfg.get("train"):
        batch = args.batch or cfg["batch"]
        wps = run_train_bench(cfg, batch, args.events, remat=args.remat,
                              p64=args.p64, rng_impl=args.rng,
                              remat_policy=args.remat_policy,
                              merged_head=args.merged_head)
        metric = cfg["metric"]
        if args.events == "skewed":
            metric += "_skewed"
        return {
            "metric": metric,
            "value": round(wps, 1),
            "unit": "windows/s/chip",
            "vs_baseline": round(wps / 100.0, 2),
        }
    if cfg.get("encoder"):
        batch = args.batch or cfg["batch"]
        wps = run_encoder_bench(cfg, batch, args.events)
        metric = cfg["metric"]
        if args.events == "skewed":
            metric += "_skewed"
        return {
            "metric": metric,
            "value": round(wps, 1),
            "unit": "windows/s/chip",
            "vs_baseline": round(wps / 100.0, 2),
        }
    sensor_hw, input_hw = cfg["sensor_hw"], cfg["input_hw"]
    BATCH, EVENTS_PER_BIN = cfg["batch"], cfg["events_per_bin"]
    if args.batch:
        BATCH = args.batch
    nc = 2 if args.config.startswith("gen1") else 7

    rng = np.random.default_rng(0)
    stem = "bfm_p64" if cfg.get("p64") or cfg.get("p64_input") else "bfm"
    if cfg.get("folded_stem"):
        stem = "bfm_folded"
    model = build_detector(nc, family="aed", stem=stem,
                           head_merged=args.merged_head)
    if cfg.get("folded_stem"):
        sample = jnp.zeros((BATCH, input_hw[0] // 2,
                            (input_hw[1] // 2) * 8 * K), jnp.bfloat16)
    elif cfg.get("p64") or cfg.get("p64_input"):
        sample = jnp.zeros((BATCH, input_hw[0] // 2, input_hw[1] // 2,
                            8 * K), jnp.bfloat16)
    else:
        sample = jnp.zeros((BATCH, input_hw[0], input_hw[1], 2 * K),
                           jnp.bfloat16)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), sample, False)
    # int8 weight codes are computed from the f32 master params (not the
    # bf16 copies) so they don't inherit a bf16 round-trip
    f32_params = variables["params"] if args.dtype == "int8" else None
    # inference in bf16 end-to-end: avoids per-layer f32<->bf16 conversions
    variables = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables)

    h, w = sensor_hw

    def _scatter(default, supported):
        s = (cfg.get("scatter", default) if args.scatter == "auto"
             else args.scatter)
        if s not in supported:
            # reject rather than silently run a different formulation — a
            # banked row's label must describe what actually ran
            raise SystemExit(f"--scatter {s} is not supported by the "
                             f"{args.config} pipeline (supported: "
                             f"{'/'.join(supported)})")
        return s

    def build_pipeline(quant=None):
        if cfg.get("p64"):
            return make_pipeline_p64(model, variables, sensor_hw,
                                     _scatter("pallas",
                                              ("pallas", "sorted")),
                                     folded=bool(cfg.get("folded_stem")),
                                     nms_impl=args.nms, quant=quant)
        if cfg.get("packed"):
            return make_pipeline_packed(model, variables, sensor_hw,
                                        input_hw,
                                        _scatter("pallas",
                                                 ("pallas", "sorted",
                                                  "mxu", "xla")),
                                        nms_impl=args.nms, quant=quant)
        if cfg.get("kernel"):
            return make_pipeline_kernel(model, variables, sensor_hw,
                                        input_hw,
                                        _scatter("pallas",
                                                 ("pallas", "sorted")),
                                        nms_impl=args.nms, quant=quant)
        return make_pipeline(model, variables, sensor_hw, input_hw,
                             _scatter("mxu", ("mxu", "sorted", "xla")),
                             fused=(cfg.get("fused", True)
                                    if args.fused == "auto"
                                    else args.fused == "on"),
                             nms_impl=args.nms,
                             p64_input=bool(cfg.get("p64_input")),
                             quant=quant)

    run_step = build_pipeline()
    if cfg.get("p64"):
        from frlw_evd_tpu.encode.pallas_update import p64_init_state

        state = p64_init_state(BATCH, h, w, K)
    elif cfg.get("packed"):
        state = jnp.full((BATCH, h, w, 2 * K), -6000.0, jnp.float32)
    elif cfg.get("kernel"):
        state = jnp.full((BATCH, h, w * 2 * K), -6000.0, jnp.float32)
    else:
        state = jnp.full((BATCH, h, w, 2, K), -6000.0, jnp.float32)
    if args.events == "skewed":
        events, n_valid = synth_events_skewed(rng, STEPS_PER_CALL, BATCH,
                                              EVENTS_PER_BIN, sensor_hw)
        rate = overflow_rate(events, n_valid, sensor_hw, cfg.get("p64"))
        print(f"# skewed stats: mean n_valid "
              f"{float(np.mean(np.asarray(n_valid))):.0f}/{EVENTS_PER_BIN}, "
              f"sorted-scatter overflow fallback rate {rate:.4%}",
              file=sys.stderr)
    else:
        events, n_valid = synth_events(rng, STEPS_PER_CALL, BATCH,
                                       EVENTS_PER_BIN, sensor_hw)

    if args.dtype == "int8":
        from frlw_evd_tpu.models.quantize import (build_weight_table,
                                                  calibrate_int8)
        if not hasattr(run_step, "stages"):
            raise SystemExit("--dtype int8 requires the split pipeline "
                             "(drop --fused on)")
        # calibrate activation ranges on the real encode output (jitted
        # recording pass; a small batch slice suffices — ranges depend on
        # content, not batch size)
        enc = run_step.stages["encode_transform"]
        vols = []
        for i in range(2):
            state, vol = enc(state, events[i], n_valid[i])
            vols.append(vol[: min(8, BATCH)])
        scales = calibrate_int8(model, variables, vols)
        table = build_weight_table(f32_params, scales)
        print(f"# int8: {len(scales)} conv sites quantized "
              f"(per-channel weights, calibrated activations)",
              file=sys.stderr)
        run_step = build_pipeline((scales, table))

    # warmup / compile; force a host read — block_until_ready alone is not a
    # reliable fence on this experimental platform
    state, kept = run_step(state, events[0], n_valid[0])
    float(kept)

    if args.profile and hasattr(run_step, "stages"):
        st = run_step.stages
        # NB: fence with a scalar slice, NOT .ravel()[0] — raveling the
        # (B, H, W, 2, K) state compiles a full copy for which XLA picks a
        # 16x lane-padded layout (43 GB for gen4 batch 128)
        fence = lambda a: float(a[(0,) * a.ndim])
        fence(state)   # pre-compile the fence program
        t0 = time.time()
        for _ in range(10):    # donated state: chain it through
            state, vol = st["encode_transform"](state, events[1],
                                                n_valid[1])
        fence(state)
        print("# stage encode+transform: "
              f"{(time.time() - t0) / 10 * 1000:.2f} ms", file=sys.stderr)
        k0 = st["detect"](vol)
        float(k0)
        t0 = time.time()
        for _ in range(10):
            k0 = st["detect"](vol)
        float(k0)
        print(f"# stage detect: {(time.time() - t0) / 10 * 1000:.2f} ms",
              file=sys.stderr)

    if cfg.get("latency"):
        # serving latency: every window is host-read fenced (no dispatch
        # pipelining across windows — the number a real-time consumer sees)
        n_steps = 200
        times = []
        for i in range(n_steps):
            t0 = time.time()
            state, kept = run_step(state, events[i % STEPS_PER_CALL],
                                   n_valid[i % STEPS_PER_CALL])
            float(kept)
            times.append(time.time() - t0)
        lat = np.asarray(times) * 1000.0
        ms = float(np.median(lat))
        print(f"# batch-1 latency: median {ms:.3f} ms, p90 "
              f"{float(np.percentile(lat, 90)):.3f} ms, p99 "
              f"{float(np.percentile(lat, 99)):.3f} ms per 10 ms window",
              file=sys.stderr)
        if args.profile:
            # decomposition (VERDICT r4 next #6): how much of the fenced
            # window is dispatch+read round-trip vs on-device work.
            @jax.jit
            def _inc(x):
                return x + 1.0

            z = jnp.float32(0.0)
            float(_inc(z))
            rtts = []
            for _ in range(100):
                t0 = time.time()
                z = _inc(z)
                float(z)
                rtts.append(time.time() - t0)
            rtt = float(np.median(np.asarray(rtts)) * 1000.0)
            # pipelined: dispatch N windows back-to-back, fence once — the
            # per-window device+dispatch time without a host read each
            t0 = time.time()
            for i in range(100):
                state, kept = run_step(state, events[i % STEPS_PER_CALL],
                                       n_valid[i % STEPS_PER_CALL])
            float(kept)
            piped = (time.time() - t0) / 100 * 1000.0
            # steady-state result age with double buffering: fence window
            # i-1 AFTER dispatching window i (one window in flight)
            ages = []
            prev = None
            for i in range(200):
                t0 = time.time()
                state, kept = run_step(state, events[i % STEPS_PER_CALL],
                                       n_valid[i % STEPS_PER_CALL])
                if prev is not None:
                    float(prev)
                    ages.append(time.time() - t0)
                prev = kept
            float(prev)
            age = float(np.median(np.asarray(ages)) * 1000.0)
            print(f"# latency breakdown: scalar dispatch+read RTT "
                  f"{rtt:.3f} ms; pipelined device+dispatch "
                  f"{piped:.3f} ms/window; fenced window {ms:.3f} ms "
                  f"(host round-trip share ~{max(ms - piped, 0.0):.3f}); "
                  f"double-buffered result cadence {age:.3f} ms/window",
                  file=sys.stderr)
        metric = cfg["metric"]
        if args.events == "skewed":
            metric += "_skewed"
        if args.dtype == "int8":
            metric += "_int8"
        if args.nms == "sequential":
            metric += "_seqnms"
        return {
            "metric": metric,
            "value": round(ms, 3),
            "unit": "ms/window@batch1",
            "vs_baseline": round(10.0 / ms, 2),
        }

    n_steps = 50
    t0 = time.time()
    for i in range(n_steps):
        state, kept = run_step(state, events[i % STEPS_PER_CALL],
                               n_valid[i % STEPS_PER_CALL])
    float(kept)  # fence
    elapsed = time.time() - t0

    windows = n_steps * BATCH
    wps = windows / elapsed
    # count the events actually encoded (skewed streams have bursty
    # n_valid < EVENTS_PER_BIN; padding lanes are not "encoded events")
    nv_host = np.asarray(n_valid)
    total_events = sum(int(nv_host[i % STEPS_PER_CALL].sum())
                       for i in range(n_steps))
    mev_s = total_events / elapsed / 1e6
    print(f"# {wps:.1f} windows/s, {mev_s:.1f} Mev/s encoded, "
          f"{elapsed / n_steps * 1000:.2f} ms per "
          f"{BATCH}-stream window batch", file=sys.stderr)

    metric = cfg["metric"]
    if args.events == "skewed":
        metric += "_skewed"
    if args.dtype == "int8":
        metric += "_int8"
    if args.nms == "sequential":
        metric += "_seqnms"
    return {
        "metric": metric,
        "value": round(wps, 1),
        "unit": "windows/s/chip",
        "vs_baseline": round(wps / 100.0, 2),
    }


def main():
    args = make_parser().parse_args()
    _require_devices()
    print(json.dumps(run_config(args)))


if __name__ == "__main__":
    main()
