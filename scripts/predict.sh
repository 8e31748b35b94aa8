#!/bin/bash
# Retrieval prediction launch (parity surface: reference src/scripts/predict.sh
# -- including fixing its predict3.py typo).
set -e

: "${INPUT_META_DATA:?set INPUT_META_DATA to the input_meta_data JSON path}"
: "${INIT_CHECKPOINT:?set INIT_CHECKPOINT to the checkpoint dir}"
OUTPUT_DIR=${OUTPUT_DIR:-/tmp/mmt_predict}

python -m mmt_tpu.cli.predict \
  --input_meta_data_path="${INPUT_META_DATA}" \
  --predict_split="${PREDICT_SPLIT:-test}" \
  --init_checkpoint="${INIT_CHECKPOINT}" \
  --test_output_dir="${OUTPUT_DIR}" \
  --predict_global_batch_size="${PREDICT_BATCH:-2048}" \
  --params_override="${PARAMS_OVERRIDE:-}"
