#!/usr/bin/env bash
# Round-5 serial TPU measurement queue (VERDICT r4 items #4 and #8).
# Same retry/marker discipline as the archived r4 queues
# (tools/tpu_queue_lib.sh); tunnel is single-tenant — one TPU process at
# a time, chain queues.
#
# Legs:
#  - hw_tests: re-validate the 24-check on-chip battery — this round
#    touched the mixture kernel (_batch_spec remainder merge) and the IW
#    eval path (k-scan chunking), so the battery must be re-run
#    (VERDICT #8).
#  - bench_default: refresh the flagship record and
#    .bench_last_verified.json for the outage-proof failure path.
#  - make_fixtures + train_iwll: a fresh 3k-step flagship run on the
#    static_mnist fixture (same architecture/config as the r4 bn0_s0 run
#    whose IW eval recorded 14.9 s pallas / 16.9 s streaming at
#    k=100 x 1024 images) — /tmp was wiped between rounds.
#  - iwll_c{1,4,8,16}: the chunked k-scan hardware A/B (VERDICT #4):
#    chunk=1 reproduces the r4 serial baseline; 4/8/16 measure the
#    MXU-feeding win. Estimate is chunk-invariant (tests/test_eval.py);
#    this decides evaluate.py's TPU default (currently 4, pending this
#    measurement).
#  - iwll_stream_c4: best chunk under the streaming logsumexp, so the
#    default impl choice is also re-decided at the new operating point.
#
# Usage: bash tools/tpu_r5_queue.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_r5_queue.log}"
DONE_DIR=/tmp/tpu_r5_done
TRIES=6
PAUSE=300
mkdir -p "$DONE_DIR"
LIBDIR="$(cd "$(dirname "$0")" && pwd)"
cd "$LIBDIR/.."
. "$LIBDIR/tpu_queue_lib.sh"

run hw_tests 1800 python tools/tpu_hw_tests.py

run bench_default 1200 python bench.py --verbose

FIXDIR=/tmp/r5_fixtures
OUT=/tmp/r5_iwll
run make_fixtures 600 python tools/make_fixtures.py --data-dir "$FIXDIR" --n 4096

run train_iwll 1800 bash -c "rm -rf '$OUT' && python main.py \
  --dataset static_mnist --data-dir '$FIXDIR' \
  --zdims 32 32 32 --downsample 1 1 1 --nonlin elu --skip \
  --blocks-per-layer 2 --gated --freebits 0.5 --learn-top-prior \
  --batch-size 256 --steps-per-call 8 --max-steps 3000 \
  --beta-anneal 500 --test-interval 100000 --log-interval 500 \
  --seed 0 --output-dir '$OUT'"

if [ -e "$DONE_DIR/train_iwll" ]; then
  RUNDIR=$(ls -dt "$OUT"/*/ 2>/dev/null | head -1)
  if [ -n "$RUNDIR" ]; then
    for c in 1 4 8 16; do
      run "iwll_c$c" 1800 python evaluate.py --load "$RUNDIR" --ll \
        --iw-samples 100 --logsumexp pallas --iw-chunk "$c"
    done
    run iwll_stream_c4 1800 python evaluate.py --load "$RUNDIR" --ll \
      --iw-samples 100 --logsumexp streaming --iw-chunk 4
  else
    echo "NO run dir under $OUT" | tee -a "$LOG"
  fi
fi

check_drained R5 hw_tests bench_default make_fixtures train_iwll \
  iwll_c1 iwll_c4 iwll_c8 iwll_c16 iwll_stream_c4
