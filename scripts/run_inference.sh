#!/usr/bin/env bash
# L6 entry (reference scripts/run_inference.sh equivalent): beam + LM decode.
set -euo pipefail
cd "$(dirname "$0")/.."

python inference.py \
  --checkpoint_dir "${CKPT_DIR:-checkpoints}" \
  --decoder beam \
  --beam_width 5 \
  ${LM_PATH:+--lm_path "$LM_PATH"} \
  --wav "$@"
