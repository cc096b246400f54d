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
LIBDIR="$(cd "$(dirname "$0")" && pwd)"
cd "$LIBDIR/.."
. "$LIBDIR/tpu_queue_lib.sh"

run celeba_b256 1800 python bench.py --preset celeba64 --batch-size 256 --verbose
run celeba_b256_remat 1800 python bench.py --preset celeba64 --batch-size 256 --remat --verbose
run celeba_b128_bn16 1800 python bench.py --preset celeba64 --batch-size 128 --bn-stat-samples 16 --verbose
run cifar10_b128 1800 python bench.py --preset cifar10-deep --batch-size 128 --verbose
run cifar10_b512 1800 python bench.py --preset cifar10-deep --batch-size 512 --verbose

check_drained R4C celeba_b256 celeba_b256_remat celeba_b128_bn16 \
         cifar10_b128 cifar10_b512
