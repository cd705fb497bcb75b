#!/bin/bash
# Canonical plain-VAE training job (reference script_vae.sh:20: ps=64 (model
# ps 32), bs=32, cr=1.28, 500 epochs).
set -euo pipefail
cd "$(dirname "$0")/.."
python train.py \
    --epochs 500 \
    --dataset s2v \
    --batch_size 32 \
    --patch_size 64 \
    --val_metrics_every 25 \
    -cr 1.28 \
    --model_type VAE \
    --bf16 \
    "$@"
