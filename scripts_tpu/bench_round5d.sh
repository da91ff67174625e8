#!/bin/bash
# Round-5 stage D: resume of bench_round5c.sh after the session cutoff
# (C0 + C1-device completed and are recorded; this queue re-orders the
# remainder decision-critical-first for the final-round clock).
# Usage: bash scripts_tpu/bench_round5d.sh >> /tmp/round5d_bench.log 2>&1
set -x
cd "$(dirname "$0")/.."

# D1 = C3 dispatch-overlap bound (VERDICT r4 #3's last named lever): 1xB vs
# 2xB/2 dispatches — the delta bounds what dispatch overlap could recover.
timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 16 --shapes "8,4096,40" --dispatch-probe
timeout 1800 python scripts_tpu/bench_attention.py --tlayout --batch 8 --shapes "8,16384,40" --dispatch-probe

# D2 = C2 1024px native-res e2e at the tuned config: dedup-ON baseline row,
# nomax e2e confirmation (microbench won -5.5% at L=16k; defaults only flip
# on e2e confirmation), then dedup-OFF (does the prefix-dedup saving grow
# at 16k where the deduped prefix contains the 16k attention?).
timeout 5400 python bench.py --e2e --e2e-px 1024 --e2e-batch 4 --e2e-chunk 3
timeout 5400 env DIFFMINING_FLASH_NOMAX=1 python bench.py --e2e --e2e-px 1024 --e2e-batch 4 --e2e-chunk 3
timeout 5400 env DIFFMINING_SWEEP_DEDUP=0 python bench.py --e2e --e2e-px 1024 --e2e-batch 4 --e2e-chunk 3

# D3 = C8 reference effective-batch-64: accumulation amortizes the
# batch-independent ~100 ms optimizer chain 16x. no-remat first (the stage-A
# winner), full-remat fallback row second.
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --remat --use-8bit --defer-fetch

# D4 = C4/C7 train probes: B=6 middle of the memory roof; fp32-adam isolation
# at the winning B=4 no-remat config.
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 6 --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --defer-fetch

# D5 = C1 host-scoring A/B (device row already measured: 245.9 s / 1k images)
timeout 5400 python scripts_tpu/bench_clipmining_e2e.py --images 1000 --batch 8 --host-scoring

# D6 = C5/C6 remat batch-roof rows (informational)
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 8 --remat --remat-policy dots --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 16 --remat --use-8bit --defer-fetch

echo ROUND5D_BENCH_DONE
