#!/usr/bin/env bash
# X-ray finetune + localization eval (mirrors reference scripts/xray.sh).
set -e
BASE="${BASE:-models/sd-v1-5}"
python -m diffmining_tpu.finetuning.xray --base_name_or_path "$BASE" --data_path dataset/CXR8/ --train_batch_size 8 --output_dir models/xray --num_train_epochs 100
python -m diffmining_tpu.applications.xray -t results/xray -m models/xray -i dataset/CXR8
