#!/bin/bash
# Round-5 stage C (follow-ups after bench_round5.sh A/B): A0 retry (tunnel
# flake), clipmining e2e device-vs-host A/B (VERDICT r4 #5), 1024px sweep
# dedup A/B (VERDICT r4 #4 specific (a): does the prefix-dedup saving grow
# at L=16k where the deduped prefix contains the 16k attention?).
# Ordered decision-critical-first so a round-end cutoff costs the least.
# Usage: bash scripts_tpu/bench_round5c.sh >> /tmp/round5c_bench.log 2>&1
set -x
cd "$(dirname "$0")/.."

# C0 retry of A0 (baseline train-step re-measure; died on a remote-compile flake)
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --remat --use-8bit --defer-fetch

# C1 clipmining e2e: device scoring (new default) then host A/B, 1k images
timeout 5400 python scripts_tpu/bench_clipmining_e2e.py --images 1000 --batch 8
timeout 5400 python scripts_tpu/bench_clipmining_e2e.py --images 1000 --batch 8 --host-scoring

# C2 1024px native-res sweep at the tuned chunk config (--batch_images 4
# --chunk 3, BENCH_NOTES round-4d): dedup ON (default, = the baseline row),
# then the nomax-kernel e2e confirmation (microbench won at L=16k: 50.73 vs
# 53.12 ms — defaults only flip on an e2e-confirmed win), then dedup OFF.
timeout 5400 python bench.py --e2e --e2e-px 1024 --e2e-batch 4 --e2e-chunk 3
timeout 5400 env DIFFMINING_FLASH_NOMAX=1 python bench.py --e2e --e2e-px 1024 --e2e-batch 4 --e2e-chunk 3
timeout 5400 env DIFFMINING_SWEEP_DEDUP=0 python bench.py --e2e --e2e-px 1024 --e2e-batch 4 --e2e-chunk 3

# C3 dispatch-overlap bound (VERDICT r4 #3's last named lever): 1×B vs 2×B/2
# dispatches — the delta is the ceiling on what overlap could recover
timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 16 --shapes "8,4096,40" --dispatch-probe
timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 8 --shapes "8,16384,40" --dispatch-probe

# C8 reference effective-batch-64 workload: the A6 profile attributes ~105
# ms/step (~1/3) to the batch-independent optimizer chain — accumulation
# amortizes it 16x. no-remat first, full-remat fallback if MultiSteps'
# fp32 accumulator tree OOMs.
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --remat --use-8bit --defer-fetch

# C4-C6 train A5 follow-ups. A2: no-remat fits at B=4 (+15.6%); A3: attn-remat
# OOMs at B=8 — memory binds fast once attention activations are saved. Probe
# the middle of the memory/recompute tradeoff and the full-remat batch roof.
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 6 --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 8 --remat --remat-policy dots --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 16 --remat --use-8bit --defer-fetch

# C7 optimizer-cost isolation: fp32 adam vs the 8-bit default at the winning
# B=4 no-remat config (the step has ~196 ms not explained by UNet fwd+bwd)
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --defer-fetch

echo ROUND5C_BENCH_DONE
