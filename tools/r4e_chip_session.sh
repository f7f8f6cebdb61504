#!/bin/bash
# Round-4 resumed-session measurement matrix. Priority order:
# the two VERDICT "missing" training numbers first (gen1 lever combo,
# gen4 bf16+remat), then batch-1 latency, then gen4 re-validation and
# the per-representation encoder sweep. rc captured via PIPESTATUS so a
# timeout is reported as 124 rather than tee's 0.
set -u
cd /root/repo
mkdir -p log/round4
run() {
  name=$1; to=$2; shift 2
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ==="
  timeout "$to" "$@" 2>&1 | tee "log/round4/${name}.log"
  echo "=== $name rc=${PIPESTATUS[0]} ($(date -u +%H:%M:%S)) ==="
}

run train_gen1_p64_rbg   900  python bench.py --config gen1_train --p64 --rng rbg
run latency_gen1         700  python bench.py --config gen1_latency
run train_gen4_p64_remat 1200 python bench.py --config gen4_train --p64 --remat --rng rbg
run gen4_taf             900  python bench.py --config gen4_taf
run enc_eci              500  python bench.py --config gen1_eci
run enc_sae              500  python bench.py --config gen1_sae
run enc_ev               500  python bench.py --config gen1_ev
run enc_frame            500  python bench.py --config gen1_frame
run latency_gen4         700  python bench.py --config gen4_latency
run gen1_int8            700  python bench.py --config gen1_taf --dtype int8
run gen4_skewed          700  python bench.py --config gen4_taf --events skewed
run train_gen1_mh        900  python bench.py --config gen1_train --p64 --rng rbg --merged_head
run gen1_nms_seq         900  python bench.py --config gen1_taf --nms sequential

echo "=== r4e chip session complete ($(date -u +%H:%M:%S)) ==="
