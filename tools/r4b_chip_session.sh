#!/bin/bash
# Round-4 second-session on-chip matrix, VERDICT priority order with the
# worker-crash-risk gen4 training compiles isolated at the end.
set -u
cd /root/repo
mkdir -p log/round4
run() {
  name=$1; to=$2; shift 2
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ==="
  timeout "$to" "$@" 2>&1 | tee "log/round4/${name}.log"
  echo "=== $name rc=$? ($(date -u +%H:%M:%S)) ==="
}

# 1. re-validate gen1 + fixpoint/sequential NMS A/B (VERDICT #2)
run gen1_taf            900 python bench.py --config gen1_taf
run gen1_nms_seq        900 python bench.py --config gen1_taf --nms sequential

# 2. training levers on gen1 (VERDICT #1)
run train_gen1          900 python bench.py --config gen1_train
run train_gen1_p64_rbg  900 python bench.py --config gen1_train --p64 --rng rbg
run train_gen1_mh       900 python bench.py --config gen1_train --p64 --rng rbg --merged_head

# 3. batch-1 serving latency (VERDICT #4)
run latency_gen1        900 python bench.py --config gen1_latency
run latency_gen4        900 python bench.py --config gen4_latency

# 4. gen4 inference re-validate + skewed gate + merged head (VERDICT weak #6)
run gen4_taf            900 python bench.py --config gen4_taf
run gen4_skewed         900 python bench.py --config gen4_taf --events skewed
run gen4_merged_head    900 python bench.py --config gen4_taf --merged_head

# 5. per-representation encoder throughput (VERDICT #5)
run enc_eci             600 python bench.py --config gen1_eci
run enc_sae             600 python bench.py --config gen1_sae
run enc_ev              600 python bench.py --config gen1_ev
run enc_frame           600 python bench.py --config gen1_frame

# 6. int8 PTQ serving A/B
run gen1_int8           900 python bench.py --config gen1_taf --dtype int8
run gen4_int8           900 python bench.py --config gen4_taf --dtype int8
run latency_gen1_int8   600 python bench.py --config gen1_latency --dtype int8

# 7. on-chip kernel parity
run kcheck              900 python tools/tpu_kernel_check.py

# 8. LAST: gen4 training (riskiest cold compile — crashed the worker in r3)
run train_gen4_p64_remat 1500 python bench.py --config gen4_train --p64 --remat --rng rbg
run train_gen4_threefry  900 python bench.py --config gen4_train --p64 --remat --rng threefry2x32
run train_gen1_b128      900 python bench.py --config gen1_train --p64 --rng rbg --batch 128 --remat --remat_policy dots

echo "=== r4b chip session complete ($(date -u +%H:%M:%S)) ==="
