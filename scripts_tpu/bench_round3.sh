#!/bin/bash
# Round-3 TPU measurement plan — run once when the axon tunnel is up.
#
# Measures, in order (each prints one JSON line; results appended to
# $OUT, default /tmp/bench_round3.log):
#   1. headline UNet passes/s (bench.py default)           — BENCH_r03 metric
#   2. e2e typicality images/hr, prefix dedup ON (default) — the round-3 lever
#   3. e2e typicality images/hr, prefix dedup OFF          — the null
#
# The dedup-ON sweep is a new XLA program (ctx_tile>1 tiles mid-graph), so
# its first run pays a fresh tunnel compile (budget 30+ min); dedup-OFF and
# the headline hit the round-2 persistent cache (.jax_cache).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/bench_round3.log}

run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "${BENCH_TIMEOUT:-5400}" "$@" 2>&1 | grep -v WARNING | tail -3 | tee -a "$OUT"
}

run python bench.py
run python bench.py --e2e
run env DIFFMINING_SWEEP_DEDUP=0 python bench.py --e2e
run python scripts_tpu/bench_dift.py
run python scripts_tpu/bench_pnp.py --batch_sources 4
run env DIFFMINING_PNP_DEDUP=0 python scripts_tpu/bench_pnp.py --batch_sources 0
run python scripts_tpu/bench_clipmining.py
# optional: op-level re-profile for the MFU ledger (fresh compile, ~30 min)
[ "${PROFILE:-0}" = "1" ] && run python scripts_tpu/profile_unet.py
echo "done: results in $OUT"
