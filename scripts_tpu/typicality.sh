#!/usr/bin/env bash
# Full typicality pipeline for one domain (mirrors reference scripts/typicality.sh):
#   ./scripts_tpu/typicality.sh {ftt|cars|geo|places} MODEL_PATH DATA_PATH [K]
# Runs: submission -> TPU sweep -> mining/clustering -> figures -> HTML.
set -e
WHICH="$1"; MODEL_PATH="$2"; DATA_PATH="$3"; k="${4:-64}"
MAIN_PATH="results/${WHICH}"
WHICH_FEATURE="dift-161"
t_min="0.1"; t_max="0.7"
for mode in pt ft; do
  TYPICALITY="${MAIN_PATH}/typicality/${mode}/${t_min}-${t_max}"
  CACHE_PATH="${MAIN_PATH}/cache/${mode}/${t_min}-${t_max}"
  SUBMISSION_PATH="${MAIN_PATH}/submission/${mode}/${t_min}-${t_max}"
  FIGURE_PATH="${MAIN_PATH}/figures/${mode}/${t_min}-${t_max}"
  # pt mode would use the vanilla SD-v1.5 pipeline dir; pass it as MODEL_PATH
  python -m diffmining_tpu.typicality.compute --typicality_path "${TYPICALITY}" \
      -i "${DATA_PATH}" -m "${MODEL_PATH}" --submission_path "${SUBMISSION_PATH}" \
      --make_submission --sub_split 1 --which "${WHICH}" --t_min ${t_min} --t_max ${t_max}
  MAIN="python -m diffmining_tpu.typicality.cluster --which ${WHICH} --typicality_path ${TYPICALITY} --cache_path ${CACHE_PATH} --model_path ${MODEL_PATH} --k ${k} -d ${DATA_PATH}"
  ${MAIN} --cluster --feature_which ${WHICH_FEATURE}
  ${MAIN} --figure_path "${FIGURE_PATH}" --feature_which ${WHICH_FEATURE}
done
python -m diffmining_tpu.typicality.make_html "${MAIN_PATH}/figures" "${MAIN_PATH}/html"
