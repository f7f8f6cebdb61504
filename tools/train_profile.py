"""On-chip training-step breakdown (VERDICT r3 next #1).

Times, at production shapes with host-read fences:
  * the full jitted SimOTA train step (canonical and p64, threefry and rbg)
  * forward-only (loss value, no grad)
  * the SimOTA assignment alone (stop-gradient inputs at head scale)
  * dropout-mask generation alone (the BFM stem's two bernoulli draws)
so the MFU gap decomposes into stem layout / backward / assignment / RNG
before any kernel work starts. Reference workload: core/exp.py:283-315.

Usage: python tools/train_profile.py [--config gen1|gen4] [--batch N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax_cache_env  # noqa: E402,F401  (before jax)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from frlw_evd_tpu.models import build_detector
from frlw_evd_tpu.models.blocks import space_to_depth_patches
from frlw_evd_tpu.models.detector import detector_loss
from frlw_evd_tpu.train.trainer import (_compute_params, create_train_state,
                                        make_train_step)
from frlw_evd_tpu.utils.profiling import flops_report

GEOM = {"gen1": dict(hw=(256, 320), nc=2, batch=64),
        "gen4": dict(hw=(512, 640), nc=7, batch=32)}
K = 8


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, *args, n=20, warmup=1, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    fence(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    fence(jax.tree.leaves(out)[0])
    return (time.time() - t0) / n * 1000.0, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="gen1", choices=GEOM)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--quick", action="store_true",
                    help="skip the canonical-stem variants (p64 only)")
    ap.add_argument("--stages", action="store_true",
                    help="also time the BFM stem alone (fwd and fwd+bwd) "
                         "to split the step cost stem vs backbone/neck/head")
    ap.add_argument("--skip_variants", action="store_true",
                    help="skip the full-step variant matrix (stages / "
                         "assignment / dropout decomposition only)")
    args = ap.parse_args()
    g = GEOM[args.config]
    (h, w), nc = g["hw"], g["nc"]
    B = args.batch or g["batch"]
    rng = np.random.default_rng(0)

    imgs = jnp.asarray(rng.uniform(0, 1, (B, h, w, 2 * K)), jnp.float32)
    labels = np.zeros((B, 40, 5), np.float32)
    for b in range(B):
        gt = int(rng.integers(3, 20))
        labels[b, :gt, 0] = rng.integers(0, nc, gt)
        labels[b, :gt, 1] = rng.uniform(20, w - 20, gt)
        labels[b, :gt, 2] = rng.uniform(20, h - 20, gt)
        labels[b, :gt, 3] = rng.uniform(8, 80, gt)
        labels[b, :gt, 4] = rng.uniform(8, 60, gt)
    labels = jnp.asarray(labels)
    tx = optax.adam(1e-3)

    variants = [("p64", "bfm_p64", True)]
    if not args.quick:
        variants.insert(0, ("canonical", "bfm", False))
    if args.skip_variants:
        variants = []

    for name, stem, patchify in variants:
        model = build_detector(nc, family="aed", stem=stem)
        sample = jnp.zeros((1, h, w, 2 * K), jnp.float32)
        if patchify:
            sample = space_to_depth_patches(sample)
        state = create_train_state(model, jax.random.key(0), sample, tx)

        for impl in ("threefry2x32", "rbg"):
            key = jax.random.key(1, impl=impl)
            step = make_train_step((8, 16, 32), nc, 2.5,
                                   half_precision=True, patchify=patchify)
            cost = flops_report(
                lambda st, im, lb, k: step(st, im, lb, k)[1]["total_loss"],
                state, imgs, labels, key)
            # the step donates its state: chain it through the loop on a
            # fresh copy so the pristine state survives for other variants
            st = jax.tree.map(jnp.copy, state)
            st, losses = step(st, imgs, labels, key)
            fence(losses["total_loss"])
            n = 20
            t0 = time.time()
            for _ in range(n):
                st, losses = step(st, imgs, labels, key)
            fence(losses["total_loss"])
            ms = (time.time() - t0) / n * 1000.0
            mfu = cost["flops"] / (ms / 1000) / 197e12
            print(f"[{name:9s}|{impl:12s}] full step: {ms:7.2f} ms  "
                  f"({B / ms * 1000:6.1f} w/s, MFU {mfu:.1%}, "
                  f"{cost['flops'] / 1e12:.2f} TF)", flush=True)

        # forward-only (loss, no grad) — same dropout cost, no backward
        key = jax.random.key(1)

        @jax.jit
        def fwd_only(params, batch_stats, imgs_, labels_, key_):
            x = imgs_.astype(jnp.bfloat16)
            if patchify:
                x = space_to_depth_patches(x)
            p = _compute_params(params, True)
            outs, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, True,
                mutable=["batch_stats"], rngs={"dropout": key_})
            outs = [o.astype(jnp.float32) for o in outs]
            return detector_loss(outs, labels_, (8, 16, 32), nc,
                                 2.5)["total_loss"]

        ms_f, _ = timeit(fwd_only, state.params, state.batch_stats, imgs,
                         labels, key, n=20)
        print(f"[{name:9s}] fwd+loss only: {ms_f:7.2f} ms", flush=True)

        # inference-mode forward (no dropout, no BN stats update)
        @jax.jit
        def fwd_eval(params, batch_stats, imgs_):
            x = imgs_.astype(jnp.bfloat16)
            if patchify:
                x = space_to_depth_patches(x)
            p = _compute_params(params, True)
            outs = model.apply({"params": p, "batch_stats": batch_stats},
                               x, False)
            return outs[0]

        ms_e, _ = timeit(fwd_eval, state.params, state.batch_stats, imgs,
                         n=20)
        print(f"[{name:9s}] fwd eval-mode: {ms_e:7.2f} ms", flush=True)

    if args.stages:
        # the BFM stem alone: its 1x1 grouped-conv + mixer chains run at
        # FULL input resolution with 4-48 channels — MXU-hostile and
        # bandwidth-bound; this row says how much of the step it owns
        from frlw_evd_tpu.models.stems import BinsFusionModule

        stem = BinsFusionModule(64, ksize=3, act="silu")
        sx = jnp.asarray(rng.uniform(0, 1, (B, h, w, 2 * K)), jnp.bfloat16)
        svars = jax.jit(stem.init, static_argnums=(2,))(
            jax.random.key(0), sx, False)
        sparams = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, svars)

        @jax.jit
        def stem_fwd(v, x_):
            return stem.apply(v, x_, False)

        ms_sf, _ = timeit(stem_fwd, sparams, sx, n=20)
        print(f"[stem     ] fwd eval-mode: {ms_sf:7.2f} ms", flush=True)

        @jax.jit
        def stem_fwdbwd(v, x_, key_):
            def f(vv, xx):
                out, _ = stem.apply(
                    vv, xx, True, mutable=["batch_stats"],
                    rngs={"dropout": key_})
                return (out.astype(jnp.float32) ** 2).sum()

            l, g = jax.value_and_grad(f, argnums=(0, 1))(v, x_)
            return l

        key_s = jax.random.key(3, impl="rbg")
        ms_sb, _ = timeit(stem_fwdbwd, sparams, sx, key_s, n=20)
        print(f"[stem     ] fwd+bwd (train, rbg dropout): {ms_sb:7.2f} ms",
              flush=True)

    # SimOTA assignment alone, at head scale
    A = (h // 8) * (w // 8) + (h // 16) * (w // 16) + (h // 32) * (w // 32)
    from frlw_evd_tpu.models.assign import simota_assign
    from frlw_evd_tpu.models.heads import level_grids

    xs, ys, ss = level_grids([(h // 8, w // 8), (h // 16, w // 16),
                              (h // 32, w // 32)], [8, 16, 32])
    pb = jnp.asarray(rng.uniform(0, w, (B, A, 4)), jnp.float32)
    ob = jnp.asarray(rng.normal(-2, 1, (B, A)), jnp.float32)
    cl = jnp.asarray(rng.normal(0, 1, (B, A, nc)), jnp.float32)
    gb = labels[..., 1:5]
    gc = labels[..., 0].astype(jnp.int32)
    gv = labels.sum(-1) > 0

    @jax.jit
    def assign_all(gb_, gc_, gv_, pb_, ob_, cl_):
        return jax.vmap(lambda a, b, c, d, e, f: simota_assign(
            a, b, c, d, e, f, jnp.asarray((xs + 0.5) * ss),
            jnp.asarray((ys + 0.5) * ss), jnp.asarray(ss), 2.5,
            num_classes=nc))(gb_, gc_, gv_, pb_, ob_, cl_).num_fg.sum()

    ms_a, _ = timeit(assign_all, gb, gc, gv, pb, ob, cl, n=20)
    print(f"[simota   ] assignment alone (batch {B}, A={A}): {ms_a:7.2f} ms",
          flush=True)

    # dropout mask generation alone (the BFM stem's two draws)
    mix = 4 * int(np.log2(K))
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(2, impl=impl)

        @jax.jit
        def masks(key_):
            k1, k2 = jax.random.split(key_)
            m1 = jax.random.bernoulli(k1, 0.9, (B, h, w, mix * 4))
            m2 = jax.random.bernoulli(k2, 0.9, (B, h, w, mix))
            return m1.sum() + m2.sum()

        ms_m, _ = timeit(masks, key, n=20)
        print(f"[dropout  |{impl:12s}] mask gen alone: {ms_m:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
