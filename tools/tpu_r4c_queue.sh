#!/usr/bin/env bash
# Round-4 third TPU queue — completes the non-flagship batch sweeps and
# measures the demoted bn16 lever in its one claimed niche.
#
# Legs:
#  - celeba_b256 / celeba_b256_remat: the celeba64 sweep stops at b128
#    (6.6k img/s, 24.1% MFU) after b64->b128 DOUBLED MFU; one more
#    doubling is unmeasured. If plain b256 OOMs, the remat leg answers
#    whether trading FLOPs for memory buys net throughput here.
#  - celeba_b128_bn16: RESULTS.md round 4 demoted --bn-stat-samples 16
#    to "a lever for bandwidth-bound bf16 runs only" — celeba64 b128
#    bf16 IS that niche (150 MB/img, 24% MFU) and was never measured.
#  - cifar10_b128 / cifar10_b512: the deep preset has a single sweep
#    point (b256, 15.3k); bracket it.
#
# Usage: bash tools/tpu_r4c_queue.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_r4c_queue.log}"
DONE_DIR=/tmp/tpu_r4c_done
TRIES=5
PAUSE=240
mkdir -p "$DONE_DIR"
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2"; shift 2
  if [ -e "$DONE_DIR/$name" ]; then
    echo "=== $name: already done, skipping ===" | tee -a "$LOG"
    return 0
  fi
  local rc=1
  for attempt in $(seq 1 "$TRIES"); do
    echo "=== $name attempt $attempt ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
    timeout -k 30 "$tmo" "$@" >>"$LOG" 2>&1
    rc=$?
    echo "--- $name attempt $attempt exit=$rc ---" | tee -a "$LOG"
    [ $rc -eq 0 ] && { touch "$DONE_DIR/$name"; return 0; }
    [ "$attempt" -lt "$TRIES" ] && sleep "$PAUSE"
  done
  return $rc
}

run celeba_b256 1800 python bench.py --preset celeba64 --batch-size 256 --verbose
run celeba_b256_remat 1800 python bench.py --preset celeba64 --batch-size 256 --remat --verbose
run celeba_b128_bn16 1800 python bench.py --preset celeba64 --batch-size 128 --bn-stat-samples 16 --verbose
run cifar10_b128 1800 python bench.py --preset cifar10-deep --batch-size 128 --verbose
run cifar10_b512 1800 python bench.py --preset cifar10-deep --batch-size 512 --verbose

missing=0
for m in celeba_b256 celeba_b256_remat celeba_b128_bn16 cifar10_b128 cifar10_b512; do
  [ -e "$DONE_DIR/$m" ] || { echo "MISSING: $m" | tee -a "$LOG"; missing=1; }
done
if [ $missing -eq 0 ]; then
  echo "R4C QUEUE FULLY DRAINED — results in $LOG" | tee -a "$LOG"
else
  echo "R4C QUEUE INCOMPLETE — re-run to retry missing legs" | tee -a "$LOG"
  exit 1
fi
