"""Evaluation CLI (reference: test.py).

  python test.py --exp_type taf_bfm --dataset gen1 --batch_size 1 \
      --data_path <blob dir> --bbox_path <label dir> --resume_exp NAME \
      [--record True]
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/jax_comp_cache"))

import argparse

from frlw_evd_tpu.train import Trainer, make_config


def parse_args():
    parser = argparse.ArgumentParser(description="Evaluate an event detector")
    parser.add_argument("--exp_type", type=str, default="basic")
    parser.add_argument("--dataset", type=str, default="gen1")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--num_cpu_workers", type=int, default=4)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--bbox_path", type=str, required=True)
    parser.add_argument("--log_path", type=str, default="log/")
    parser.add_argument("--event_volume_bins", type=int, default=5)
    parser.add_argument("--resume_exp", type=str, default=None)
    parser.add_argument("--record", type=lambda s: s == "True", default=False)
    parser.add_argument("--nodes", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
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
        record=args.record,
        augmentation=False,
    )
    trainer = Trainer(cfg)
    stats = trainer.test()
    print("COCO stats:", stats)


if __name__ == "__main__":
    main()
