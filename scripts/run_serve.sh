#!/usr/bin/env bash
# Serving entry (a surface the reference lacks — SURVEY.md §1: "no serving
# layer"): long-lived TCP streaming recognition with continuous batching.
# SIGTERM drains gracefully: in-flight sessions finish, then exit 0.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m rnntransducer_tpu.serve_socket \
  --checkpoint_dir "${CKPT_DIR:-checkpoints}" \
  --port "${PORT:-7070}" \
  --decoder "${DECODER:-greedy}" \
  --batch_sessions "${BATCH_SESSIONS:-8}" \
  ${LM_PATH:+--lm_path "$LM_PATH"} \
  "$@"
