#!/bin/bash
# Round-5 stage E: resume of bench_round5d.sh (D1/D2 completed and recorded;
# the queue was cut at D3's first row by the session boundary).
# Usage: bash scripts_tpu/bench_round5e.sh >> /tmp/round5e_bench.log 2>&1
set -x
cd "$(dirname "$0")/.."

# E1 = D3 reference effective-batch-64: accumulation amortizes the
# batch-independent ~100 ms optimizer chain 16x. no-remat first (the stage-A
# winner), full-remat fallback row second.
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --remat --use-8bit --defer-fetch

# E2 = D4 train probes: B=6 middle of the memory roof; fp32-adam isolation
# at the winning B=4 no-remat config.
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 6 --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --defer-fetch

# E3 = D5 host-scoring A/B (device row already measured: 245.9 s / 1k images)
timeout 5400 python scripts_tpu/bench_clipmining_e2e.py --images 1000 --batch 8 --host-scoring

# E4 = D6 remat batch-roof rows (informational)
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 8 --remat --remat-policy dots --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 16 --remat --use-8bit --defer-fetch

echo ROUND5E_BENCH_DONE
