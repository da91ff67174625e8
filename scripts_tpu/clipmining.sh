#!/usr/bin/env bash
# CLIP patch-ranking baseline (mirrors reference clipmining/ranking.py CLI).
#   ./scripts_tpu/clipmining.sh DATASET [CACHE] [MODE] [CLIP_DIR]
# CLIP_DIR: a CLIPModel checkpoint dir (e.g. converted StreetCLIP); omitted ->
# random tiny towers (tests/dev only).
set -e
ARGS=(--dataset "$1" --cache "${2:-clip}" --mode "${3:-diff}")
if [ -n "$4" ]; then ARGS+=(--clip_dir "$4"); fi
python -m diffmining_tpu.baselines.clipmining "${ARGS[@]}"
