#!/usr/bin/env bash
# L6 entry (reference scripts/run_train.sh equivalent): flagship training.
# One process drives every chip via the data mesh — no torchrun spawn.
set -euo pipefail
cd "$(dirname "$0")/.."

python train.py \
  --config configs/base.json \
  --hf_data_dirs "${HF_DATA_DIRS:-/data/raw}" \
  --pl_data_dir "${PL_DATA_DIR:-/data/logmel}" \
  --num_shards 20 \
  --checkpoint_dir "${CKPT_DIR:-checkpoints}" \
  --learning_rate 1e-4 \
  --warmup_ratio 0.2 \
  --weight_decay 1e-4 \
  --max_steps 100000 \
  --per_device_train_batch_size 64 \
  --accumulate_grad_batches 1 \
  --precision bf16 \
  --val_every_steps 1000 \
  "$@"
