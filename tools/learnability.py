"""Learnability validation: train AED + EventVolume on a ~100-stream
synthetic GEN1-like dataset to high AP50 on a held-out val split
(VERDICT r1 #7 — evidence the trainer reaches real optima, not just that
the loss plumbing coheres).

Builds the dataset with the test-fixture generator (moving boxes + noise,
deterministic), trains with the standard Trainer (yoloxwarmcos, SimOTA,
per-epoch COCO eval, best-checkpoint selection) and prints one JSON line
{"ap50": ..., "map": ...} for the best epoch.

Usage:  python tools/learnability.py [-streams 50] [-epochs 12] [-out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-streams", type=int, default=50)
    parser.add_argument("-epochs", type=int, default=12)
    parser.add_argument("-batch", type=int, default=16)
    parser.add_argument("-lr", type=float, default=2e-3)
    parser.add_argument("-out", default="/tmp/learnability")
    parser.add_argument("-ann_per_stream", type=int, default=6)
    parser.add_argument("-eval_every", type=int, default=5)
    parser.add_argument("-no_augment", action="store_true")
    parser.add_argument("-rng", default="threefry2x32",
                        choices=("threefry2x32", "rbg", "unsafe_rbg"),
                        help="dropout PRNG bit generator (convergence "
                             "equivalence evidence for the rbg train lever)")
    parser.add_argument("-int8_eval", action="store_true",
                        help="after training, re-evaluate the trained model "
                             "through the post-training int8 serving path "
                             "(models/quantize.py) and report map_int8 — "
                             "the PTQ accuracy gate on a TRAINED model")
    args = parser.parse_args()

    from fixtures import INPUT_HW, SENSOR_HW, build_mini_gen1

    root = os.path.join(args.out, "data")
    marker = os.path.join(root, ".done")
    rng = np.random.default_rng(7)
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        ann = tuple(600_000 + 40_000 * i for i in range(args.ann_per_stream))
        print(f"building {args.streams}-stream synthetic dataset ...",
              file=sys.stderr)
        build_mini_gen1(root, rng=rng,
                        streams=tuple(f"s{i:03d}" for i in range(args.streams)),
                        splits=("train",), ann_times=ann)
        build_mini_gen1(root, rng=rng,
                        streams=tuple(f"v{i:02d}" for i in
                                      range(max(args.streams // 5, 2))),
                        splits=("val",), ann_times=ann)
        open(marker, "w").write("ok")

    from frlw_evd_tpu.train import Trainer, make_config

    cfg = make_config(
        "basic",
        data_path=os.path.join(root, "data", "EventVolume250000"),
        bbox_path=os.path.join(root, "labels"),
        batch_size=args.batch,
        num_workers=4,
        max_epoch=args.epochs,
        max_epoch_to_stop=args.epochs,
        warmup_epochs=1,
        augmentation=not args.no_augment,
        half_precision=False,
        event_volume_bins=5,
        img_size_override=INPUT_HW,
        sensor_hw_override=SENSOR_HW,
        log_path=os.path.join(args.out, "log") + "/",
        exp_name="learnability",
        rng_impl=args.rng,
    )
    # init_lr = base_lr_per_64/64*batch (linear law); retarget via base
    cfg.base_lr_per_64 = args.lr * 64.0 / args.batch
    t = Trainer(cfg)
    t.create_datasets()
    t.build(len(t.train_loader))
    from frlw_evd_tpu.evaluate.box_filtering import filter_boxes

    best = {"map": -1.0, "ap50": -1.0, "epoch": -1}
    for epoch in range(args.epochs):
        losses = t.train_epoch()
        # streams*windows < batch -> zero train steps -> empty losses dict
        loss = losses.get("total_loss", float("nan"))
        if (epoch + 1) % args.eval_every and epoch != args.epochs - 1:
            print(f"# epoch {epoch}: loss {loss:.3f}", file=sys.stderr)
            continue
        ev = t.make_evaluator()
        ev.filter_boxes = lambda b: filter_boxes(b, 0, 0, 0, 0)
        stats = t.eval_epoch(ev)
        print(f"# epoch {epoch}: loss {loss:.3f} "
              f"mAP {stats[0]:.3f} AP50 {stats[1]:.3f}", file=sys.stderr)
        final_stats = stats
        if stats[0] > best["map"]:
            best = {"map": float(stats[0]), "ap50": float(stats[1]),
                    "epoch": epoch}
    result = {"metric": "synthetic_learnability_ap50",
              "value": round(best["ap50"], 4),
              "map": round(best["map"], 4),
              "best_epoch": best["epoch"],
              "streams": args.streams, "epochs": args.epochs}

    if args.int8_eval:
        # PTQ accuracy gate on the TRAINED weights (final epoch's state; the
        # strongest accuracy evidence available without the real dataset):
        # calibrate on val batches exactly as eval_step preprocesses them,
        # quantize from the f32 masters, re-run the full COCO evaluation.
        import jax.numpy as jnp

        from frlw_evd_tpu.models.quantize import (build_weight_table,
                                                  calibrate_int8)
        from frlw_evd_tpu.train.trainer import (_compute_params,
                                                make_eval_step)

        eval_state = (t.state.replace(params=t.ema_params)
                      if t.ema_params is not None else t.state)
        xs = []
        for i, (imgs, _, _, _) in enumerate(t.val_loader):
            x = jnp.asarray(imgs)
            if cfg.half_precision:
                x = x.astype(jnp.bfloat16)
            if cfg.patchified:
                from frlw_evd_tpu.models.blocks import space_to_depth_patches

                x = space_to_depth_patches(x)
            xs.append(x)
            if i >= 1:
                break
        p = _compute_params(eval_state.params, cfg.half_precision)
        scales = calibrate_int8(
            t.model, {"params": p, "batch_stats": eval_state.batch_stats}, xs)
        table = build_weight_table(eval_state.params, scales)
        print(f"# int8 eval: {len(scales)} conv sites quantized",
              file=sys.stderr)
        t.eval_step = make_eval_step(cfg.strides,
                                     half_precision=cfg.half_precision,
                                     patchify=cfg.patchified,
                                     quant=(scales, table))
        ev = t.make_evaluator()
        ev.filter_boxes = lambda b: filter_boxes(b, 0, 0, 0, 0)
        stats8 = t.eval_epoch(ev)
        print(f"# int8 eval: mAP {stats8[0]:.3f} AP50 {stats8[1]:.3f}",
              file=sys.stderr)
        # the f32 number from the SAME (final-epoch) weights, so the int8
        # delta is apples-to-apples even when an earlier epoch was "best"
        result["map_f32_final"] = round(float(final_stats[0]), 4)
        result["ap50_f32_final"] = round(float(final_stats[1]), 4)
        result["map_int8"] = round(float(stats8[0]), 4)
        result["ap50_int8"] = round(float(stats8[1]), 4)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
