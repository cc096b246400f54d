#!/usr/bin/env bash
# Round-5 follow-up queue: the IW-LL probe (tools/iwll_probe.py) showed
# the k=100x1024 sweep is ~1.3 s of EXECUTION behind ~18 s of cold
# compile, chunk=4 is 2x slower per forward, and bf16 is 1.6x faster —
# overturning the r4 "feed the MXU via chunking" diagnosis. These legs
# measure the shipped fixes on the real chip:
#
#  - iwll_fp32_c1:    new default path (chunk=1, streaming) with the
#                     compile/exec split now reported by evaluate_iwll.
#  - iwll_bf16_c1:    --precision bf16 eval override; the log also gives
#                     the bpd delta vs fp32 (must be << 0.01 bpd).
#  - iwll_bf16_warm:  identical rerun — persistent compile cache should
#                     make compile_s near zero, proving repeat evals
#                     (the mount-day parity workflow) are execution-cost.
#  - iwll_pallas_c1:  pallas logsumexp at the new default chunk, so the
#                     impl choice is re-decided at the real operating
#                     point (exec seconds, not compile noise).
#  - iwll_stream_c4:  the original r5 queue's remaining leg, for the
#                     completeness contract (c16 is NOT here: its result
#                     is a recorded OOM — RESULTS.md round 5).
#
# Requires the r5 queue's training run to exist under /tmp/r5_iwll.
# Usage: bash tools/tpu_r5b_queue.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_r5b_queue.log}"
DONE_DIR=/tmp/tpu_r5b_done
TRIES=6
PAUSE=300
mkdir -p "$DONE_DIR"
LIBDIR="$(cd "$(dirname "$0")" && pwd)"
cd "$LIBDIR/.."
. "$LIBDIR/tpu_queue_lib.sh"

RUNDIR=$(ls -dt /tmp/r5_iwll/*/ 2>/dev/null | head -1)
if [ -z "$RUNDIR" ]; then
  echo "NO run dir under /tmp/r5_iwll — run tools/tpu_r5_queue.sh first" \
    | tee -a "$LOG"
  exit 1
fi

run iwll_fp32_c1 1800 python evaluate.py --load "$RUNDIR" --ll \
  --iw-samples 100 --logsumexp streaming --iw-chunk 1
run iwll_bf16_c1 1800 python evaluate.py --load "$RUNDIR" --ll \
  --iw-samples 100 --logsumexp streaming --iw-chunk 1 --precision bf16
run iwll_bf16_warm 1800 python evaluate.py --load "$RUNDIR" --ll \
  --iw-samples 100 --logsumexp streaming --iw-chunk 1 --precision bf16
run iwll_pallas_c1 1800 python evaluate.py --load "$RUNDIR" --ll \
  --iw-samples 100 --logsumexp pallas --iw-chunk 1
run iwll_stream_c4 1800 python evaluate.py --load "$RUNDIR" --ll \
  --iw-samples 100 --logsumexp streaming --iw-chunk 4

check_drained R5B iwll_fp32_c1 iwll_bf16_c1 iwll_bf16_warm \
  iwll_pallas_c1 iwll_stream_c4
