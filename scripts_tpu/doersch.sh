#!/usr/bin/env bash
# Doersch-2012 HOG+SVM baseline (mirrors reference doersch/doersch.py CLI).
set -e
python -m diffmining_tpu.baselines.doersch --which "${1:-geo}" --dataset_path "$2" --category "${3:-United States}" --main_dir doersch-hog
