#!/bin/bash
# Poll the axon TPU tunnel until it comes back, then re-warm the compile
# cache by running the driver's bench command. Logs to /tmp/chip_poll.log.
# Round-4 recovery helper for the 2026-08-17 TPU-worker outage.
LOG=/tmp/chip_poll.log
echo "[chip_poll] start $(date -u +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 120 python -c "import jax; d = jax.devices(); \
assert d and d[0].platform.lower() not in ('cpu', 'host'), d; print(d)" \
      >> "$LOG" 2>&1; then
    echo "[chip_poll] TPU UP at $(date -u +%H:%M:%S); warming cache via bench.py" >> "$LOG"
    cd /root/repo && timeout 5400 python bench.py >> /tmp/bench_warm_r4.log 2>&1
    echo "[chip_poll] warm bench rc=$? at $(date -u +%H:%M:%S)" >> "$LOG"
    break
  fi
  echo "[chip_poll] down at $(date -u +%H:%M:%S), retry in 120s" >> "$LOG"
  sleep 120
done
