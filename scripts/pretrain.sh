#!/bin/bash
# Pretraining launch (parity surface: reference src/scripts/pretrain.sh).
# On TPU VMs run one process per host; jax discovers the slice topology.
set -e

MODEL_DIR=${MODEL_DIR:-/tmp/mmt_pretrain}
CONFIG=${CONFIG:-configs/exp_yamls/pretrain/wit/mlm_itm.yaml}

python -m mmt_tpu.cli.train \
  --experiment=mmt/pretraining \
  --mode=train_and_eval \
  --model_dir="${MODEL_DIR}" \
  --config_file="${CONFIG}" \
  --params_override="${PARAMS_OVERRIDE:-}"
