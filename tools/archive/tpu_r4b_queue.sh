#!/usr/bin/env bash
# Round-4 follow-up TPU measurements (run AFTER tools/tpu_r4_queue.sh
# drains — the tunnel is single-tenant). Same retry/marker discipline.
#
# Legs:
#  - bench_b512: the flagship batch sweep has points at 256 (35.3k) and
#    2048 (-20%); 512 is the untested midpoint — does the VMEM-residency
#    win at 256 survive one doubling?
#  - iwll_streaming / iwll_pallas: first HARDWARE timing A/B of the IW
#    logsumexp kernel (correctness is in tools/tpu_hw_tests.py; eval
#    wall-clock has only ever been measured with the streaming scan).
#    Uses the bn0_s0 run trained by the main queue.
#  - serving_roundtrip: export generate/reconstruct/encode StableHLO
#    artifacts from a real trained run and smoke-call them on the TPU
#    backend (--check) — the serving surface has only been exercised on
#    CPU until now.
#
# Usage: bash tools/tpu_r4b_queue.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_r4b_queue.log}"
DONE_DIR=/tmp/tpu_r4b_done
TRIES=6
PAUSE=300
mkdir -p "$DONE_DIR"
LIBDIR="$(cd "$(dirname "$0")" && pwd)"
cd "$LIBDIR/.."
. "$LIBDIR/tpu_queue_lib.sh"

run bench_b512 1500 python bench.py --batch-size 512 --verbose

# Newest bn0_s0 run dir from the main queue's quality A/B.
RUNDIR=$(ls -dt /tmp/r4_bn_ab/bn0_s0/*/ 2>/dev/null | head -1)
if [ -n "$RUNDIR" ]; then
  run iwll_streaming 1800 python evaluate.py --load "$RUNDIR" --ll \
    --iw-samples 100 --logsumexp streaming
  run iwll_pallas 1800 python evaluate.py --load "$RUNDIR" --ll \
    --iw-samples 100 --logsumexp pallas
  run serving_roundtrip 1800 python tools/export_serving.py \
    --load "$RUNDIR" --what generate reconstruct encode --check \
    --artifact-dir /tmp/r4b_serving
else
  echo "NO bn0_s0 run dir — main queue incomplete?" | tee -a "$LOG"
fi

check_drained R4B bench_b512 iwll_streaming iwll_pallas serving_roundtrip
