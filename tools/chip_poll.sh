#!/bin/bash
# Poll the axon TPU tunnel until it comes back, then bank the round-4
# measurements unattended: first tools/r4_priority.sh (driver's exact bench
# command + NMS A/B + one train number — the must-have rows), then the full
# tools/r4_chip_session.sh matrix (gen4 training last: worker-crash risk
# isolation). Each step is timeout-bounded; logs land in log/round4/.
# Poll log: /tmp/chip_poll.log. Round-4 recovery helper for the 2026-08-17
# TPU-worker outage.
LOG=/tmp/chip_poll.log
echo "[chip_poll] start $(date -u +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 120 python -c "import jax; d = jax.devices(); \
assert d and d[0].platform.lower() not in ('cpu', 'host'), d; print(d)" \
      >> "$LOG" 2>&1; then
    echo "[chip_poll] TPU UP at $(date -u +%H:%M:%S); running r4_priority" >> "$LOG"
    touch /tmp/chip_up
    # the fallback CPU learnability trainer (1-core box) must not contend
    # with timed benches — kill it before any measurement starts
    if [ -f /tmp/learn_cpu.pid ]; then
      kill "$(cat /tmp/learn_cpu.pid)" 2>/dev/null
      echo "[chip_poll] killed CPU learnability run" >> "$LOG"
    fi
    cd /root/repo && bash tools/r4_priority.sh >> /tmp/r4_priority.log 2>&1
    echo "[chip_poll] priority rc=$? at $(date -u +%H:%M:%S); running full session" >> "$LOG"
    cd /root/repo && bash tools/r4_chip_session.sh >> /tmp/r4_session.log 2>&1
    echo "[chip_poll] full session rc=$? at $(date -u +%H:%M:%S)" >> "$LOG"
    break
  fi
  echo "[chip_poll] down at $(date -u +%H:%M:%S), retry in 120s" >> "$LOG"
  sleep 120
done
