#!/bin/bash
# Round-4 on-chip measurement matrix, in VERDICT priority order.
# Run AFTER the compile cache is warm (tools/chip_poll.sh warms gen1_taf).
# Each step tees to log/round4/ — every BASELINE row gets a raw log.
set -u
cd /root/repo
mkdir -p log/round4
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ==="
  timeout 5400 "$@" 2>&1 | tee "log/round4/${name}.log"
  echo "=== $name rc=$? ==="
}

# 1. re-validate gen1 (VERDICT #2) + fixpoint/sequential NMS A/B
run gen1_taf            python bench.py --config gen1_taf
run gen1_nms_seq        python bench.py --config gen1_taf --nms sequential
# gen1 p64-input pipeline A/B (stem at quarter res)
run gen1_taf_p64        python bench.py --config gen1_taf_p64

# 2. training profile first (decides what to attack), then train benches
run profile_gen1        python tools/train_profile.py --config gen1
run train_gen1          python bench.py --config gen1_train
run train_gen1_p64      python bench.py --config gen1_train --p64
run train_gen1_p64_rbg  python bench.py --config gen1_train --p64 --rng rbg
run train_gen1_rbg      python bench.py --config gen1_train --rng rbg
run train_gen1_mh       python bench.py --config gen1_train --p64 --rng rbg --merged_head
run train_gen1_b128     python bench.py --config gen1_train --p64 --rng rbg --batch 128 --remat --remat_policy dots

# 4. batch-1 serving latency (+ sustained batch-1 throughput: same pipeline,
# dispatch-pipelined instead of per-window fenced — the async-consumer mode)
run latency_gen1        python bench.py --config gen1_latency
run latency_gen4        python bench.py --config gen4_latency
run gen1_b1_sustained   python bench.py --config gen1_taf --batch 1

# 5. per-representation encoder throughput
run enc_eci             python bench.py --config gen1_eci
run enc_sae             python bench.py --config gen1_sae
run enc_ev              python bench.py --config gen1_ev
run enc_frame           python bench.py --config gen1_frame

# 6. gen4 inference re-validate + skewed gate + merged-head A/B
run gen4_taf            python bench.py --config gen4_taf
run gen4_skewed         python bench.py --config gen4_taf --events skewed
run gen4_merged_head    python bench.py --config gen4_taf --merged_head
run gen1_merged_head    python bench.py --config gen1_taf --merged_head

# 6b. int8 PTQ serving A/B (v5e MXU int8 = 2x bf16 rate)
run gen1_int8           python bench.py --config gen1_taf --dtype int8
run gen4_int8           python bench.py --config gen4_taf --dtype int8
run latency_gen1_int8   python bench.py --config gen1_latency --dtype int8

# 7. kernel check (26 cases on chip)
run kcheck              python tools/tpu_kernel_check.py

# 7b. PTQ accuracy gate on TRAINED weights: train the synthetic-learnability
# model to high AP50, then re-evaluate it through the int8 serving path
run learnability_int8   python tools/learnability.py -streams 20 -epochs 60 -int8_eval

# 8. LAST: gen4 training (the riskiest cold compile — it crashed the TPU
# worker in round 3; everything above is already banked if it dies).
# rbg first: dropout mask generation is the projected top cost.
run train_gen4_p64_remat python bench.py --config gen4_train --p64 --remat --rng rbg
run train_gen4_p64_dots  python bench.py --config gen4_train --p64 --remat --remat_policy dots --rng rbg
run train_gen4_threefry  python bench.py --config gen4_train --p64 --remat --rng threefry2x32
run train_gen4_p64       python bench.py --config gen4_train --p64 --batch 16 --rng rbg
run profile_gen4         python tools/train_profile.py --config gen4 --quick

echo "=== r4 chip session complete ($(date -u +%H:%M:%S)) ==="
