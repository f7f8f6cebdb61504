#!/bin/bash
# Round-4 final trimmed matrix for the remaining wall clock.
# Skips the plain train_gen1 re-run (round-3 617 w/s stands as the A/B base)
# and leads with the two VERDICT "missing" numbers: the gen1 training-lever
# combo and the outage-eaten gen4 bf16+remat train row.
set -u
cd /root/repo
mkdir -p log/round4
run() {
  name=$1; to=$2; shift 2
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ==="
  timeout "$to" "$@" 2>&1 | tee "log/round4/${name}.log"
  echo "=== $name rc=$? ($(date -u +%H:%M:%S)) ==="
}

run train_gen1_p64_rbg   900 python bench.py --config gen1_train --p64 --rng rbg
run train_gen4_p64_remat 1200 python bench.py --config gen4_train --p64 --remat --rng rbg
run latency_gen1         600 python bench.py --config gen1_latency
run gen4_taf             900 python bench.py --config gen4_taf
run enc_eci              600 python bench.py --config gen1_eci
run enc_sae              600 python bench.py --config gen1_sae
run enc_ev               600 python bench.py --config gen1_ev
run enc_frame            600 python bench.py --config gen1_frame
run latency_gen4         600 python bench.py --config gen4_latency
run gen4_skewed          600 python bench.py --config gen4_taf --events skewed
run train_gen1_mh        900 python bench.py --config gen1_train --p64 --rng rbg --merged_head
run gen1_int8            900 python bench.py --config gen1_taf --dtype int8

echo "=== r4d chip session complete ($(date -u +%H:%M:%S)) ==="
