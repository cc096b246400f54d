#!/usr/bin/env bash
# Back-to-back --bn-stat-samples comparison in ONE tunnel-health window.
#
# The round-3 backlog drain produced bn16/bn4 numbers (23.9k/24.2k img/s)
# in a window where the DEFAULT bench could not even pass its liveness
# probe — so those runs are confounded by tunnel degradation and are NOT
# comparable to the round-2 default baseline (35.3k). This script runs
# default, bn16, bn4, and default AGAIN back-to-back; the two default
# legs bracket the window so tunnel drift is visible in the data itself.
#
# Usage: bash tools/tpu_bn_compare.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_bn_compare.log}"
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout -k 30 "$tmo" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "--- $name exit=$rc ---" | tee -a "$LOG"
  return $rc
}

if ! run probe 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe value', float(jax.device_get(jnp.sum(x @ x))))
print('device', jax.devices())"; then
  echo "TUNNEL DOWN — aborting (see $LOG)" | tee -a "$LOG"
  exit 1
fi

run bench_default_a 1200 python bench.py --verbose || {
  echo "default leg failed — window unhealthy, aborting" | tee -a "$LOG"
  exit 1
}
run bench_bn16 1200 python bench.py --bn-stat-samples 16 --verbose
run bench_bn4 1200 python bench.py --bn-stat-samples 4 --verbose
run bench_default_b 1200 python bench.py --verbose

echo "COMPARE DONE — results in $LOG" | tee -a "$LOG"
