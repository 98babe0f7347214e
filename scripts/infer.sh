#!/usr/bin/env bash
# Inference + eval (ref counterpart: sgtapose/scripts/inference_scripts.sh —
# panda-orb / 3cam_azure / 3cam_realsense with --rf LM refinement).
set -e
CKPT="${CKPT:-exp/dlapawdl3new/ckpt/epoch_20}"
for SET in "$@"; do
  python -m sgtapose_tpu.cli.infer \
    --dataset "${DATA_ROOT:-../data}/${SET}" \
    --ckpt "$CKPT" \
    --output_dir "results/${SET}" \
    --rf
done
