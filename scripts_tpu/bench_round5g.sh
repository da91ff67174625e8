#!/bin/bash
# Round-5 stage G: gradient accumulation via STATIC skip/emit programs
# (DIFFMINING_ACCUM_STATIC, finetuning/train.py build()). Stage F measured
# that EVERY runtime-cond accum row OOMs — the lax.cond is a barrier at which
# the full grad tree + accumulator + full-tree updates output are live at
# once, defeating XLA's per-tensor backward/optimizer interleaving. The
# static split restores that interleaving; these rows measure whether the
# ~100 ms batch-independent optimizer chain (31% of the B=4 step, stage A)
# actually amortizes 16x.
# Usage: bash scripts_tpu/bench_round5g.sh >> /tmp/round5g_bench.log 2>&1
set -x
cd "$(dirname "$0")/.."

# wait for any still-running trainstep bench (the orphaned F4 row) to finish
while [ -n "$(ps -o pid= -p "$(cat /tmp/round5f_f4.pid 2>/dev/null || echo 1)" 2>/dev/null)" ] && [ "$(cat /tmp/round5f_f4.pid 2>/dev/null)" != "" ]; do
  sleep 60
done

# G1: the headline row — no-remat (stage-A winner 14.05 img/s) + bf16
# accumulator + accum 16 (reference effective batch 64), static programs.
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --accum-dtype bf16 --use-8bit --defer-fetch

# G2: attn-remat + f32 accumulator fallback (if G1 OOMs this is the row).
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --accum 16 --remat --remat-policy attn --use-8bit --defer-fetch

echo ROUND5G_DECISION_ROWS_DONE

# G3 (ex-F5): fp32-vs-8bit isolation at the stage-A winner config (C7).
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 4 --defer-fetch

# G4 (ex-F6): clipmining host-scoring A/B (D5).
timeout 5400 python scripts_tpu/bench_clipmining_e2e.py --images 1000 --batch 8 --host-scoring

# G5/G6 (ex-F7/F8): large-batch remat rows (frontier beyond the B=4 roof).
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 8 --remat --remat-policy dots --use-8bit --defer-fetch
timeout 3600 python scripts_tpu/bench_trainstep.py --batch 16 --remat --use-8bit --defer-fetch

echo ROUND5G_BENCH_DONE
