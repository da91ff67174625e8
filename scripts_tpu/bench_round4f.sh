#!/bin/bash
# Round-4 queue, part F — channel-major transformer block (copy elimination).
# 1) headline A/B with DIFFMINING_TF_CMAJOR=1 (baseline: 141.26 this round,
#    141.12/141.09 pre-upsample-fix)
# 2) HLO copy attribution under cmajor (expect the tf-reshape/norm rows gone)
# 3) HLO copy attribution in the normal world (verifies the upsample
#    broadcast-reshape killed the _resize transpose rows)
# 4) e2e with cmajor=1 (the decision number for the default flip)
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/bench_round4f.log}

run() {
  echo "=== $* [CMAJOR=${DIFFMINING_TF_CMAJOR:-unset}] ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "${BENCH_TIMEOUT:-7200}" "$@" 2>&1 | grep -v "WARNING" | tail -40 | tee -a "$OUT"
  echo "--- rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT"
}

export DIFFMINING_TF_CMAJOR=1
run python bench.py
run python scripts_tpu/profile_unet.py --hlo --batch 16
export DIFFMINING_TF_CMAJOR=0
run python scripts_tpu/profile_unet.py --hlo --batch 16
export DIFFMINING_TF_CMAJOR=1
run python bench.py --e2e
echo "done: results in $OUT"
