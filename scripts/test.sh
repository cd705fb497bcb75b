#!/bin/bash
# Eval-only run from a checkpoint (reference test.sh:20).
# Usage: scripts/test.sh ckpt/<job_id>
set -euo pipefail
cd "$(dirname "$0")/.."
CKPT=${1:?usage: scripts/test.sh <checkpoint path>}
shift
python train.py \
    --test \
    --model_ckpt "$CKPT" \
    --batch_size 8 \
    --patch_size 64 \
    -cr 1.2 \
    --model_type Cond_SRVAE \
    "$@"
