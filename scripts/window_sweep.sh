#!/bin/sh
# List vs rect windowed-grid measurement (VERDICT r3 #1): fwd and
# fwd+bwd ms/layer at B=8, window 512, S in {4096, 8192, 16384}.
# Each run is a fresh process so env flags and jit caches are clean.
set -x
cd "$(dirname "$0")/.."
PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export PYTHONPATH
for S in 4096 8192 16384; do
  for GRID in list rect; do
    MMT_ATTN_WINDOW_GRID=$GRID timeout 900 python scripts/kernel_bench.py \
      --seq $S --window 512 --iters 6 2>&1 | tail -2
    MMT_ATTN_WINDOW_GRID=$GRID timeout 900 python scripts/kernel_bench.py \
      --seq $S --window 512 --iters 6 --bwd 2>&1 | tail -2
  done
done
