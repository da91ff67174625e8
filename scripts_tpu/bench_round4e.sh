#!/bin/bash
# Round-4 queue, part E — the one-shot default repeat A/B.
# Samples so far (round-4c): headline OFF 137.674 (x2 across 4b/4c),
# all-shapes 141.12 (x1), long-L-only 140.243 (x1); e2e long-L 2,644 (x1).
# The isolated L1024 microbench says all-shapes should LOSE — need a second
# in-context sample per config before flipping the code default.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/bench_round4e.log}

run() {
  echo "=== $* [ONESHOT=${DIFFMINING_FLASH_ONESHOT:-unset}] ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "${BENCH_TIMEOUT:-7200}" "$@" 2>&1 | grep -v "WARNING" | tail -10 | tee -a "$OUT"
  echo "--- rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT"
}

export DIFFMINING_FLASH_ONESHOT=all
run python bench.py
export DIFFMINING_FLASH_ONESHOT=1
run python bench.py
export DIFFMINING_FLASH_ONESHOT=all
run python bench.py --e2e
echo "done: results in $OUT"
