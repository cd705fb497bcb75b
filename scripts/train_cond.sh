#!/bin/bash
# Canonical Cond_SRVAE training job (reference script.sh:20 hyperparameters:
# ps=64, bs=8, cr=1.2, 500 epochs) on the TPU engine, grid mode.
# On Cloud TPU, launch one process per host; the mesh spans all chips.
set -euo pipefail
cd "$(dirname "$0")/.."
python train.py \
    --epochs 500 \
    --dataset s2v \
    --batch_size 8 \
    --patch_size 64 \
    --val_metrics_every 25 \
    -cr 1.2 \
    --model_type Cond_SRVAE \
    --crop grid \
    --bf16 \
    "$@"
