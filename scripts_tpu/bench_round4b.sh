#!/bin/bash
# Round-4 queue, part B — the remaining product-scale rows (VERDICT r3 #5)
# plus the e2e refresh after the flash-kernel denominator fold:
#   1. bench.py --e2e           512px refresh at the 137.67 passes/s kernel
#   2. bench.py --e2e 512x768   places-portrait native-res row
#   3. bench.py --e2e 1024      native-res mining row (per-image sweep per
#                               the bench_xray finding)
#   4. bench_xray 2x5 / 4x3     disambiguate batch_images vs UNet-batch at 1024px
#   5. bench_doersch            full iterative round wall-clock
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/bench_round4b.log}

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "${BENCH_TIMEOUT:-7200}" "$@" 2>&1 | grep -v "WARNING" | tail -25 | tee -a "$OUT"
  echo "--- rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT"
}

run python bench.py --e2e
run python bench.py --e2e --e2e-px 512x768
run python bench.py --e2e --e2e-px 1024 --e2e-batch 1 --e2e-chunk 10 --e2e-images 8
run python scripts_tpu/bench_xray.py --configs 2x5 4x3
run python scripts_tpu/bench_doersch.py
echo "done: results in $OUT"
