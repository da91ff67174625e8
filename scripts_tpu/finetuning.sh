#!/usr/bin/env bash
# Finetune SD on each dataset (mirrors reference scripts/finetuning.sh).
# BASE is a converted SD-v1.5 pipeline dir (utils/weights.py).
set -e
BASE="${BASE:-models/sd-v1-5}"
python -m diffmining_tpu.finetuning.geo   --base_name_or_path "$BASE" --train_batch_size 8  --num_train_epochs 100 --data_path dataset/g3/   --output_dir models/g3
python -m diffmining_tpu.finetuning.cars  --base_name_or_path "$BASE" --train_batch_size 64 --num_train_epochs 100 --data_path dataset/cars/ --output_dir models/cars
python -m diffmining_tpu.finetuning.ftt   --base_name_or_path "$BASE" --train_batch_size 64 --num_train_epochs 100 --data_path dataset/ftt/  --output_dir models/ftt
