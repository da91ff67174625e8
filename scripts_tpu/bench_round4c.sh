#!/bin/bash
# Round-4 queue, part C — the flash one-shot no-max kernel A/B
# (DIFFMINING_FLASH_ONESHOT, flash_attention.py:_flash_kernel_t_1shot):
#   1. transposed-kernel microbench OFF vs ON at the three SD self-attn levels
#   2. headline bench.py ON (OFF is the 137.674 from BENCH_r04 runs)
#   3. e2e ON (OFF is the 2,595 imgs/hr round-4b row)
# The default follows the headline/e2e verdict.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/bench_round4c.log}

run() {
  echo "=== $* [ONESHOT=${DIFFMINING_FLASH_ONESHOT:-0}] ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "${BENCH_TIMEOUT:-7200}" "$@" 2>&1 | grep -v "WARNING" | tail -25 | tee -a "$OUT"
  echo "--- rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT"
}

export DIFFMINING_FLASH_ONESHOT=0
run python scripts_tpu/bench_attention.py --tlayout
export DIFFMINING_FLASH_ONESHOT=1
run python scripts_tpu/bench_attention.py --tlayout
run python bench.py
run python bench.py --e2e
echo "done: results in $OUT"
