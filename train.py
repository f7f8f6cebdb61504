"""Training CLI (reference: train.py).

Same flag surface as the reference so recipes carry over:
  python train.py --exp_type taf_bfm --dataset gen1 --batch_size 64 \
      --data_path <blob dir> --bbox_path <label dir> [--resume_exp NAME]

TPU-native: runs one process over all local devices with the batch sharded
over the `data` mesh axis (no torch.distributed.launch / NCCL).
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/jax_comp_cache"))

import argparse

from frlw_evd_tpu.train import Trainer, make_config


def parse_args():
    parser = argparse.ArgumentParser(description="Train an event detector")
    parser.add_argument("--exp_type", type=str, default="basic")
    parser.add_argument("--dataset", type=str, default="gen1")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_cpu_workers", type=int, default=4)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--bbox_path", type=str, required=True)
    parser.add_argument("--log_path", type=str, default="log/")
    parser.add_argument("--event_volume_bins", type=int, default=5)
    parser.add_argument("--resume_exp", type=str, default=None)
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--augmentation", type=lambda s: s != "False",
                        default=True)
    parser.add_argument("--nodes", type=int, default=1,
                        help="accepted for recipe compatibility; sharding is "
                             "derived from jax.devices()")
    parser.add_argument("--max_epoch_to_stop", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    # TPU-native extras (not in the reference's surface)
    parser.add_argument("--patchified", action="store_true",
                        help="train/eval through the quarter-res p64 stem "
                             "(identical math/params; faster TPU layout)")
    parser.add_argument("--rng_impl", default="threefry2x32",
                        choices=("threefry2x32", "rbg", "unsafe_rbg"),
                        help="dropout PRNG bit generator")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialise the forward in the backward "
                             "(fits bigger batches)")
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = make_config(
        args.exp_type,
        dataset=args.dataset,
        batch_size=args.batch_size,
        num_workers=args.num_cpu_workers,
        data_path=args.data_path,
        bbox_path=args.bbox_path,
        log_path=args.log_path,
        event_volume_bins=args.event_volume_bins,
        resume_exp=args.resume_exp,
        exp_name=args.exp_name,
        augmentation=args.augmentation,
        seed=args.seed,
        patchified=args.patchified,
        rng_impl=args.rng_impl,
        remat=args.remat,
    )
    if args.max_epoch_to_stop is not None:
        cfg.max_epoch_to_stop = args.max_epoch_to_stop
    trainer = Trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()
