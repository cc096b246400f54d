#!/usr/bin/env bash
# Round-4 fifth TPU queue — re-validation after the late-round fixes:
#  - serving_roundtrip2: the serving surfaces changed signature
#    (reconstruct/encode now take an explicit per-image index); re-run
#    the on-device export + smoke-call with the new artifacts.
#  - hw_tests: the partition-spec merge fix touched the mixture kernel's
#    host-side partitioning path that the public entry routes through —
#    re-run the 24-check hardware battery as insurance.
#
# Usage: bash tools/tpu_r4e_queue.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_r4e_queue.log}"
DONE_DIR=/tmp/tpu_r4e_done
TRIES=6
PAUSE=300
mkdir -p "$DONE_DIR"
LIBDIR="$(cd "$(dirname "$0")" && pwd)"
cd "$LIBDIR/.."
. "$LIBDIR/tpu_queue_lib.sh"

run hw_tests 1800 python tools/tpu_hw_tests.py

RUNDIR=$(ls -dt /tmp/r4_bn_ab/bn0_s0/*/ 2>/dev/null | head -1)
if [ -n "$RUNDIR" ]; then
  run serving_roundtrip2 1800 python tools/export_serving.py \
    --load "$RUNDIR" --what generate reconstruct encode --check \
    --artifact-dir /tmp/r4e_serving
else
  echo "NO bn0_s0 run dir — skipping serving leg" | tee -a "$LOG"
fi

check_drained R4E hw_tests serving_roundtrip2
