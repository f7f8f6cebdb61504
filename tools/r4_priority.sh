#!/bin/bash
# Minimal chip session if time is short: warm the driver's exact command,
# A/B the NMS, get one train number. ~30-60 min cold.
set -u
cd /root/repo
mkdir -p log/round4
run() { name=$1; shift; echo "=== $name ==="; timeout 5400 "$@" 2>&1 | tee "log/round4/${name}.log"; }
run gen1_taf           python bench.py
run gen1_nms_seq       python bench.py --config gen1_taf --nms sequential
run train_gen1_p64_rbg python bench.py --config gen1_train --p64 --rng rbg
