#!/usr/bin/env bash
# CLIP patch-ranking baseline (mirrors reference clipmining/ranking.py CLI).
set -e
python -m diffmining_tpu.baselines.clipmining --dataset "$1" --cache "${2:-clip}" --mode "${3:-diff}"
