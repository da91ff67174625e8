#!/bin/bash
# Round-5 measurement queue (VERDICT r4 #2/#3/#4): train-path MFU ledger,
# 512px kernel-roof levers, L=16384 ledger. Serial — one TPU, one CPU core.
# Usage: bash scripts_tpu/bench_round5.sh [a|b|all] >> /tmp/round5_bench.log 2>&1
set -x
cd "$(dirname "$0")/.."
STAGE="${1:-all}"

if [ "$STAGE" = a ] || [ "$STAGE" = all ]; then
  # ---- A. train-path MFU ledger -------------------------------------------
  # A0 baseline re-measure (the 12.15 img/s row, BENCH_NOTES r2)
  timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --remat --use-8bit --defer-fetch
  # A1 selective remat: transformer blocks only (convs saved)
  timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --remat --remat-policy attn --use-8bit --defer-fetch
  # A2 no remat at all at B=4 (does it fit? what does saved-recompute buy?)
  timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --use-8bit --defer-fetch
  # A3 bigger batch under the cheaper remat
  timeout 3600 python scripts_tpu/bench_trainstep.py --batch 8 --remat --remat-policy attn --use-8bit --defer-fetch
  # A4 bigger batch, full remat (memory-max config)
  timeout 3600 python scripts_tpu/bench_trainstep.py --batch 8 --remat --use-8bit --defer-fetch
  # A5 B=16 with the winning policy comes after reading A1-A4 (manual)
  # A6 op-level attribution of the baseline config (remat recompute / bwd
  #    attention / optimizer / VAE+CLIP shares)
  timeout 3600 python scripts_tpu/profile_trainstep.py --batch 4 --px 512
fi

if [ "$STAGE" = b ] || [ "$STAGE" = all ]; then
  # ---- B. kernel roof: softmax-chain scheduling (no-max multi-block) ------
  # B1 L=4096 sub-block pipelining vs the one-shot full-row kernel
  timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 16 --shapes "8,4096,40" --variant oneshot --blocks 512,4096
  timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 16 --shapes "8,4096,40" --variant nomax --blocks 512,1024
  timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 16 --shapes "8,4096,40" --variant nomax --blocks 512,2048
  timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 16 --shapes "8,4096,40" --variant nomax --blocks 1024,1024
  # B2 L=16384 (1024px native-res): online auto policy vs no-max blocks
  timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 8 --shapes "8,16384,40" --variant online --blocks 512,4096
  timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 8 --shapes "8,16384,40" --variant nomax --blocks 512,4096
  timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 8 --shapes "8,16384,40" --variant nomax --blocks 1024,2048
  timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 8 --shapes "8,16384,40" --variant nomax --blocks 512,8192
fi
echo ROUND5_BENCH_DONE
