#!/bin/bash
# Round-4 TPU measurement queue — the benches that crashed in the round-3
# queue (VAE mid-attn VMEM OOM, fixed by the head-dim dispatch gate) plus
# the product-scale rows VERDICT r3 #5 asks for.
#
# Unlike bench_round3.sh this keeps enough of each run's tail to see a
# traceback (the round-3 runner's `tail -3` ate them).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/bench_round4.log}

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "${BENCH_TIMEOUT:-5400}" "$@" 2>&1 | grep -v "WARNING" | tail -25 | tee -a "$OUT"
  echo "--- rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT"
}

run python scripts_tpu/bench_dift.py
run python scripts_tpu/bench_pnp.py --batch_sources 4
run env DIFFMINING_PNP_DEDUP=0 python scripts_tpu/bench_pnp.py --batch_sources 0
run python scripts_tpu/bench_clipmining.py
echo "done: results in $OUT"
