#!/bin/bash
# Round-4 queue, part G — L=16384 (1024px native-res) flash block tune.
# Current policy at lq>=4096: block_q=512, block_k=4096 (L16384 -> 4 online
# k blocks). VMEM bound: block_q*block_k*4B (fp32 logits) <= ~8.4 MB, so the
# candidates hold the logits block constant and trade q-vs-k blocking.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/bench_round4g.log}

run() {
  echo "=== $* [BQ=${DIFFMINING_FLASH_BLOCK_Q:-auto} BK=${DIFFMINING_FLASH_BLOCK_K:-auto}] ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  timeout "${BENCH_TIMEOUT:-7200}" "$@" 2>&1 | grep -v "WARNING" | tail -12 | tee -a "$OUT"
  echo "--- rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT"
}

SH="--shapes 8,16384,40 --batch 8 --iters 5 --tlayout"
run python scripts_tpu/bench_attention.py $SH
export DIFFMINING_FLASH_BLOCK_Q=256 DIFFMINING_FLASH_BLOCK_K=8192
run python scripts_tpu/bench_attention.py $SH
export DIFFMINING_FLASH_BLOCK_Q=1024 DIFFMINING_FLASH_BLOCK_K=2048
run python scripts_tpu/bench_attention.py $SH
export DIFFMINING_FLASH_BLOCK_Q=256 DIFFMINING_FLASH_BLOCK_K=4096
run python scripts_tpu/bench_attention.py $SH
export DIFFMINING_FLASH_BLOCK_Q=512 DIFFMINING_FLASH_BLOCK_K=2048
run python scripts_tpu/bench_attention.py $SH
echo "done: results in $OUT"
