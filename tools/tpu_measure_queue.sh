#!/usr/bin/env bash
# Serial TPU measurement backlog — run when the axon tunnel is healthy.
#
# The tunnel degrades intermittently and went hard-down late round 3 with
# the --bn-stat-samples throughput measurement still outstanding
# (ROADMAP.md "Highest-value next work" #3). This script probes first,
# then drains the backlog one process at a time (the tunnel is
# single-tenant: never run two TPU processes concurrently), bounding
# every step with `timeout` so a dead tunnel cannot hang a session.
#
# Usage: bash tools/tpu_measure_queue.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_queue.log}"
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  # -k: SIGKILL 30 s after SIGTERM — a wedged tunnel call can ignore TERM
  timeout -k 30 "$tmo" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "--- $name exit=$rc ---" | tee -a "$LOG"
  return $rc
}

# 1. Bounded liveness probe: value readback of a trivial matmul.
#    (block_until_ready does not gate execution through the tunnel.)
if ! run probe 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('probe value', float(jax.device_get(jnp.sum(x @ x))))
print('device', jax.devices())"; then
  echo "TUNNEL DOWN — aborting queue (see $LOG)" | tee -a "$LOG"
  exit 1
fi

# 2. Hardware kernel checks (cold compiles ~10 min budget).
run tpu_hw_tests 1200 python tools/tpu_hw_tests.py

# 3. Flagship bench: current default (exact BN) — the reference point.
run bench_default 1200 python bench.py --verbose

# 4. The outstanding measurement: subsampled-BN statistics at 16 and 4.
#    Ablation bound says at most +17% (the remove-BN-entirely number).
run bench_bn16 1200 python bench.py --bn-stat-samples 16 --verbose
run bench_bn4 1200 python bench.py --bn-stat-samples 4 --verbose

echo "QUEUE DRAINED — results in $LOG" | tee -a "$LOG"
