#!/bin/bash
# Round-5 stage F: the accumulate_every rows (the stage-E queue's accum rows
# ran the old optax.MultiSteps path — BOTH E1 rows OOMed, no-remat and
# full-remat; see BENCH_NOTES stage E/F for the corrected reading).
# accumulate_every puts the inner chain under a real lax.cond and
# supports a bf16 accumulator, so these rows measure the actual VERDICT-#2
# amortization lever.
# Usage: bash scripts_tpu/bench_round5f.sh >> /tmp/round5f_bench.log 2>&1
set -x
cd "$(dirname "$0")/.."

# F1: the headline row — no-remat (stage-A winner) + bf16 accumulator
# (fits where fp32 OOMed) + accum 16 (reference effective batch 64).
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --accum-dtype bf16 --use-8bit --defer-fetch

# F2: isolation — same but full remat + f32 accumulator (direct comparison
# against E1 row 2's MultiSteps number: the delta IS the chain skip).
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --remat --use-8bit --defer-fetch

# F3: attn-remat middle ground + f32 accumulator (does f32 accum fit when
# only conv activations are saved?).
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --remat --remat-policy attn --use-8bit --defer-fetch

echo ROUND5F_BENCH_DONE

# --- resurrected stage-E rows (the 5:11-6:10 queue died at session cutoff:
# rows 1-3 OOMed on the fp32 MultiSteps accumulator / B=6, row 4+ never ran) ---

# F4: B=6 probe — is the batch roof between 4 and 6 or between 6 and 8?
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 6 --use-8bit --defer-fetch

# F5: fp32-vs-8bit isolation at the stage-A winner config (C7).
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --defer-fetch

# F6: clipmining host-scoring A/B (D5) — the device-scoring default's e2e win.
timeout 5400 python scripts_tpu/bench_clipmining_e2e.py --images 1000 --batch 8 --host-scoring

# F7/F8: large-batch remat rows (throughput/VMEM frontier beyond the B=4 roof).
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 8 --remat --remat-policy dots --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 16 --remat --use-8bit --defer-fetch

echo ROUND5F_BENCH_DONE
