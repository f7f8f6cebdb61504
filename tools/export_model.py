"""Serialize a trained detector to a portable StableHLO artifact.

Deployment export for the serving path the reference covers with torch
checkpoints + a live Python stack (test.py → core/model.py): here the whole
jitted window step — volume in, (dets, keep) out, parameters baked in — is
exported via `jax.export` to a self-contained .stablehlo blob that any
PJRT runtime (TPU/CPU) can load without the framework or flax installed,
plus a meta.json with shapes/dtypes. `--check` round-trips the artifact
through jax.export.deserialize and compares outputs against the live model.

Usage:
  python tools/export_model.py --out model.stablehlo \
      [--exp_type taf_bfm --dataset gen1 --batch 1] \
      [--ckpt log/<exp>/checkpoints/best_epoch] [--check]

With no --ckpt the export uses fresh-init weights (pipeline smoke / shape
contract); with --ckpt it bakes the trained parameters.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax_cache_env  # noqa: E402,F401  (before jax)

import jax
import jax.numpy as jnp
import numpy as np


def build_serving_fn(cfg, params, batch_stats, batch: int, quant=None):
    """The batched serving step: bf16 volume → (dets, keep). `quant` is an
    optional (act_scales, weight_table) pair from models/quantize.py — the
    calibrated conv sites then lower to int8 MXU ops in the artifact."""
    from frlw_evd_tpu.models import build_detector
    from frlw_evd_tpu.models.detector import eval_decode
    from frlw_evd_tpu.models.postprocess import postprocess_batch
    from frlw_evd_tpu.models.quantize import int8_ctx

    model = build_detector(cfg.num_classes, family=cfg.family, stem=cfg.stem,
                           act=cfg.act, strides=cfg.strides,
                           in_channels=cfg.in_channels, depth=cfg.depth)
    h, w = cfg.img_size
    shape = (batch, h, w, cfg.input_channels)

    def serve(vol):
        with int8_ctx(*(quant or (None, None))):
            outs = model.apply({"params": params, "batch_stats": batch_stats},
                               vol.astype(jnp.bfloat16), False)
        outs = [o.astype(jnp.float32) for o in outs]
        decoded = eval_decode(outs, cfg.strides)
        return postprocess_batch(decoded, max_detections=100)

    return serve, shape, model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--exp_type", default="taf_bfm")
    ap.add_argument("--dataset", default="gen1")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--event_volume_bins", type=int, default=8)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (train.checkpoints layout); "
                         "fresh-init weights if omitted")
    ap.add_argument("--platform", default=None,
                    help="lowering platform (default: current backend)")
    ap.add_argument("--check", action="store_true",
                    help="deserialize the artifact and compare against the "
                         "live model on random input")
    ap.add_argument("--fuse", action="store_true",
                    help="fold BatchNorm into conv kernels before export "
                         "(models/fuse.py — reference fuse_model semantics)")
    ap.add_argument("--int8", action="store_true",
                    help="post-training int8 quantization of the MXU-worthy "
                         "convs (models/quantize.py). Calibration volumes: "
                         "--calib .npy (N,H,W,C) if given, else synthetic "
                         "uniform [0,1) — re-export with real volumes for "
                         "production scales.")
    ap.add_argument("--calib", default=None,
                    help="path to a .npy of calibration volumes for --int8")
    # test/size overrides (mini fixtures)
    ap.add_argument("--img_hw", type=int, nargs=2, default=None)
    ap.add_argument("--small", action="store_true",
                    help="shrink the model (CI smoke)")
    ap.add_argument("--width", type=int, default=0,
                    help="override trunk/neck channel width (CI smoke; "
                         "unlike --small keeps channels >= the int8 "
                         "eligibility floor)")
    args = ap.parse_args()

    from frlw_evd_tpu.train.config import make_config

    cfg = make_config(args.exp_type, dataset=args.dataset,
                      event_volume_bins=args.event_volume_bins,
                      augmentation=False)
    if args.img_hw:
        cfg.img_size_override = tuple(args.img_hw)
    if args.small:
        cfg.in_channels = (32, 32, 32)
    if args.width:
        cfg.in_channels = (args.width,) * 3

    from frlw_evd_tpu.models import build_detector

    model = build_detector(cfg.num_classes, family=cfg.family, stem=cfg.stem,
                           act=cfg.act, strides=cfg.strides,
                           in_channels=cfg.in_channels, depth=cfg.depth)
    h, w = cfg.img_size
    sample = jnp.zeros((1, h, w, cfg.input_channels), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), sample, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if args.ckpt:
        import optax

        from frlw_evd_tpu.train.checkpoints import load_checkpoint
        from frlw_evd_tpu.train.trainer import TrainState

        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=optax.identity().init(params),
                           tx=optax.identity(), apply_fn=model.apply)
        state, _, _ = load_checkpoint(args.ckpt, state)
        params, batch_stats = state.params, state.batch_stats

    if args.fuse:
        from frlw_evd_tpu.models.fuse import fuse_conv_bn_params

        params, batch_stats = fuse_conv_bn_params(params, batch_stats)

    f32_params = params  # int8 weight codes come from the f32 masters
    # bake bf16 compute copies (inference dtype)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)

    quant = None
    if args.int8:
        from frlw_evd_tpu.models.quantize import (build_weight_table,
                                                  calibrate_int8)

        h, w = cfg.img_size
        if args.calib:
            vols = np.load(args.calib)
            assert vols.ndim == 4 and vols.shape[1:] == (
                h, w, cfg.input_channels), vols.shape
            batches = [jnp.asarray(vols[i:i + 4], jnp.float32)
                       for i in range(0, min(len(vols), 16), 4)]
        else:
            crng = np.random.default_rng(7)
            batches = [jnp.asarray(
                crng.uniform(0, 1, (4, h, w, cfg.input_channels)),
                jnp.float32) for _ in range(2)]
        scales = calibrate_int8(
            build_detector(cfg.num_classes, family=cfg.family, stem=cfg.stem,
                           act=cfg.act, strides=cfg.strides,
                           in_channels=cfg.in_channels, depth=cfg.depth),
            {"params": params, "batch_stats": batch_stats},
            [b.astype(jnp.bfloat16) for b in batches])
        quant = (scales, build_weight_table(f32_params, scales))
        print(f"int8: {len(scales)} conv sites quantized "
              f"({'real' if args.calib else 'synthetic'} calibration)")

    serve, shape, _ = build_serving_fn(cfg, params, batch_stats, args.batch,
                                       quant=quant)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    platforms = [args.platform] if args.platform else None
    exported = jax.export.export(jax.jit(serve),
                                 platforms=platforms)(spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    meta = {
        "input": {"shape": list(shape), "dtype": "float32",
                  "layout": "NHWC volume (leaky TAF / encoder output)"},
        "outputs": {"dets": "(B, 100, 6) [cx, cy, w, h, cls, score]",
                    "keep": "(B, 100) bool"},
        "exp_type": args.exp_type, "dataset": args.dataset,
        "precision": ("int8-ptq ({} calibration)".format(
            "real" if args.calib else "synthetic") if args.int8 else "bf16"),
        "platforms": list(exported.platforms),
        "stablehlo_version": exported.mlir_module_serialization_version
        if hasattr(exported, "mlir_module_serialization_version") else None,
    }
    with open(args.out + ".meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported {len(blob) / 1e6:.2f} MB -> {args.out} "
          f"(platforms {meta['platforms']})")

    if args.check:
        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
        live_dets, live_keep = jax.jit(serve)(vol)
        re = jax.export.deserialize(bytearray(blob))
        got_dets, got_keep = re.call(vol)
        np.testing.assert_array_equal(np.asarray(live_keep),
                                      np.asarray(got_keep))
        np.testing.assert_allclose(np.asarray(live_dets),
                                   np.asarray(got_dets), atol=1e-5)
        print("roundtrip check ok: deserialized artifact matches live model")


if __name__ == "__main__":
    main()
