#!/bin/bash
# Round-4 cutover remainder: reprioritized for the remaining wall clock.
# gen4 bf16+remat train (the outage-eaten VERDICT #3 number) goes first,
# then gen4 inference re-validation under the fixpoint NMS, then encoders.
set -u
cd /root/repo
mkdir -p log/round4
run() {
  name=$1; to=$2; shift 2
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ==="
  timeout "$to" "$@" 2>&1 | tee "log/round4/${name}.log"
  echo "=== $name rc=$? ($(date -u +%H:%M:%S)) ==="
}

run latency_gen1         900 python bench.py --config gen1_latency
run train_gen4_p64_remat 1500 python bench.py --config gen4_train --p64 --remat --rng rbg
run gen4_taf             900 python bench.py --config gen4_taf
run gen4_skewed          600 python bench.py --config gen4_taf --events skewed
run enc_eci              600 python bench.py --config gen1_eci
run enc_sae              600 python bench.py --config gen1_sae
run enc_ev               600 python bench.py --config gen1_ev
run enc_frame            600 python bench.py --config gen1_frame
run latency_gen4         900 python bench.py --config gen4_latency
run gen4_merged_head     900 python bench.py --config gen4_taf --merged_head
run gen1_int8            900 python bench.py --config gen1_taf --dtype int8
run gen4_int8            900 python bench.py --config gen4_taf --dtype int8
run train_gen1_b128      900 python bench.py --config gen1_train --p64 --rng rbg --batch 128 --remat --remat_policy dots

echo "=== r4c chip session complete ($(date -u +%H:%M:%S)) ==="
