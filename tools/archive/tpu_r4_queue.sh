#!/usr/bin/env bash
# Round-4 serial TPU measurement backlog — tolerant of the axon tunnel's
# minutes-scale oscillation: every leg retries up to $TRIES times with a
# pause between attempts, and completed legs drop a marker in $DONE_DIR so
# a re-run of the whole script skips them (safe to loop until drained).
# Tunnel is single-tenant: strictly one TPU process at a time.
#
# Queue (VERDICT r3 "next round" items):
#  2. literal README architecture (--blocks-per-layer 4) bench  [item 2]
#  3. trace profile at the b256 flagship config to answer the bench's own
#     1.37x byte-ceiling warning                                [item 3]
#  A. celeba64 fused auto-vs-none A/B: the +3.6% mixture-kernel win must
#     survive the round-4 custom_partitioning wrapper           [item 1 check]
#  7. bn-stat-samples 16 quality A/B, 3 seeds x 3k steps        [item 7]
#
# Usage: bash tools/tpu_r4_queue.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_r4_queue.log}"
DONE_DIR=/tmp/tpu_r4_done
# Observed wedge windows run ~19 min (probe hangs after back-to-back heavy
# legs, then the tunnel recovers); 6 tries x (150s probe + 300s pause)
# outlasts one full window.
TRIES=6
PAUSE=300
mkdir -p "$DONE_DIR"
LIBDIR="$(cd "$(dirname "$0")" && pwd)"
cd "$LIBDIR/.."
. "$LIBDIR/tpu_queue_lib.sh"

# Hardware kernel battery first — the partitioning rework touched the
# mixture/logsumexp kernels, so re-validate all 24 on-chip checks.
run hw_tests 1800 python tools/tpu_hw_tests.py

# Baseline of record (also proves the partitioning rework did not
# perturb the single-chip flagship number).
run bench_default 1200 python bench.py --verbose

# VERDICT #2: the verbatim README command's model (4 blocks/layer).
run bench_blocks4 1500 python bench.py --blocks-per-layer 4 --verbose

# Wrapper A/B: custom_partitioning must not cost the measured mixture win.
run bench_celeba_auto 1500 python bench.py --preset celeba64 --verbose
run bench_celeba_none 1500 python bench.py --preset celeba64 --fused none --verbose

# VERDICT #3: trace-based device-busy accounting at the exact headline
# configuration (mnist preset, b256, fused auto).
run profile_b256 1500 python tools/profile_step.py --top 40

# VERDICT #7: bn16 quality A/B — flagship architecture on the
# static_mnist fixture files, 3 seeds x {exact BN, n=16}, 3k steps each,
# test ELBO via evaluate.py. (Fixture pixels: demonstrates no quality
# collapse at flagship scale; real-data A/B still blocked by the mount.)
FIXDIR=/tmp/r4_fixtures
AB_OUT=/tmp/r4_bn_ab
mkdir -p "$AB_OUT"
# Gate on the done-marker, not directory existence: an aborted
# make_fixtures leaves a partial dir that would otherwise never be retried.
run make_fixtures 600 python tools/make_fixtures.py --data-dir "$FIXDIR" --n 4096
for seed in 0 1 2; do
  for bn in 0 16; do
    name="bn${bn}_s${seed}"
    # The rm -rf lives INSIDE the retried command so every attempt (not
    # just the first script invocation) starts its run dir clean — run()'s
    # internal retries would otherwise accumulate partial timestamped dirs.
    run "train_$name" 1800 bash -c "rm -rf '$AB_OUT/$name' && python main.py \
      --dataset static_mnist --data-dir '$FIXDIR' \
      --zdims 32 32 32 --downsample 1 1 1 --nonlin elu --skip \
      --blocks-per-layer 2 --gated --freebits 0.5 --learn-top-prior \
      --batch-size 256 --steps-per-call 8 --max-steps 3000 \
      --beta-anneal 500 --test-interval 100000 --log-interval 500 \
      --bn-stat-samples $bn --seed $seed \
      --output-dir '$AB_OUT/$name'"
    # Evaluate only a SUCCESSFUL training leg (the marker), and pick the
    # NEWEST run dir (-t): a partial dir from a failed earlier attempt
    # must never be the one measured.
    if [ -e "$DONE_DIR/train_$name" ]; then
      rundir=$(ls -dt "$AB_OUT/$name"/*/ 2>/dev/null | head -1)
      if [ -n "$rundir" ]; then
        run "eval_$name" 900 python evaluate.py --load "$rundir"
      fi
    fi
  done
done

check_drained R4 hw_tests bench_default bench_blocks4 bench_celeba_auto \
         bench_celeba_none profile_b256 make_fixtures \
         train_bn0_s0 eval_bn0_s0 train_bn16_s0 eval_bn16_s0 \
         train_bn0_s1 eval_bn0_s1 train_bn16_s1 eval_bn16_s1 \
         train_bn0_s2 eval_bn0_s2 train_bn16_s2 eval_bn16_s2
