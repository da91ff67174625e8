#!/bin/bash
# Round-4 queue, part D — native-res sweep-batch tuning + profile refresh:
#   1. 1024px e2e at batch 4 x chunk 3 (UNet batch 24 — the bench_xray
#      1024px winner) vs the 329.5 imgs/hr batch1 x chunk10 row from 4b
#   2. 512x768 e2e at batch 4 x chunk 2 (16) vs batch 4 x chunk 3 (24):
#      where between L4096 and L16384 does the bigger-batch optimum start?
#   3. profile_unet --hlo: layout-copy attribution for the MFU harvest
#   4. profile_unet trace: the post-kernel-win op-level table for the
#      ledger restate
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/bench_round4d.log}

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "${BENCH_TIMEOUT:-7200}" "$@" 2>&1 | grep -v "WARNING" | tail -80 | tee -a "$OUT"
  echo "--- rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT"
}

run python bench.py --e2e --e2e-px 1024 --e2e-batch 4 --e2e-chunk 3 --e2e-images 8
run python bench.py --e2e --e2e-px 512x768 --e2e-batch 4 --e2e-chunk 3
run python scripts_tpu/profile_unet.py --hlo --batch 16
run python scripts_tpu/profile_unet.py --batch 16
echo "done: results in $OUT"
