#!/bin/bash
# Finetuning launch (parity surface: reference src/scripts/finetune.sh).
set -e

MODEL_DIR=${MODEL_DIR:-/tmp/mmt_finetune}
CONFIG=${CONFIG:-configs/exp_yamls/finetune/wit/itm.yaml}

python -m mmt_tpu.cli.train \
  --experiment=mmt/classification \
  --mode=train_and_eval \
  --model_dir="${MODEL_DIR}" \
  --config_file="${CONFIG}" \
  --params_override="${PARAMS_OVERRIDE:-}"
