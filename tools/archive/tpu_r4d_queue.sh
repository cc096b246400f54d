#!/usr/bin/env bash
# Round-4 fourth TPU queue — end-to-end hardware validation of the
# ArrayLoader streaming backend (--stream-impl array, the new default).
#
# The round-3 --streaming demo was host-bound at ~10k img/s through
# grain's per-item path while the device-resident loop did 24k on the
# same data (RESULTS.md round 3). The ArrayLoader rework claims the
# host no longer binds, but its evidence so far is host-side
# microbenchmarks only. Three 2k-step flagship-config runs on the
# static_mnist fixture files, back-to-back in one window so tunnel
# drift is visible:
#  - stream_array: --streaming --stream-impl array (new default)
#  - stream_grain: --streaming --stream-impl grain (round-3 baseline)
#  - resident:     no --streaming (the 24k control)
#
# Usage: bash tools/tpu_r4d_queue.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_r4d_queue.log}"
DONE_DIR=/tmp/tpu_r4d_done
TRIES=5
PAUSE=240
mkdir -p "$DONE_DIR"
LIBDIR="$(cd "$(dirname "$0")" && pwd)"
cd "$LIBDIR/.."
. "$LIBDIR/tpu_queue_lib.sh"

FLAGSHIP=(--dataset static_mnist --data-dir /tmp/r4_fixtures
  --zdims 32 32 32 --downsample 1 1 1 --skip --gated --learn-top-prior
  --freebits 0.5 --beta-anneal 500 --batch-size 256 --max-steps 2000
  --test-interval 1000 --checkpoint-interval 1000 --seed 0)

run stream_array 2400 python main.py "${FLAGSHIP[@]}" \
  --streaming --stream-impl array --output-dir /tmp/r4d_stream/array
run stream_grain 2400 python main.py "${FLAGSHIP[@]}" \
  --streaming --stream-impl grain --output-dir /tmp/r4d_stream/grain
run resident 2400 python main.py "${FLAGSHIP[@]}" \
  --output-dir /tmp/r4d_stream/resident

check_drained R4D stream_array stream_grain resident
