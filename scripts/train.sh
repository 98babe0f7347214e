#!/usr/bin/env bash
# Training config of record (ref counterpart: sgtapose/scripts/train_scripts.sh —
# 3-GPU DDP, arch dlapawdl3new_34, disturb 0.75/0.2/0.1, 20 epochs, bs 4/dev).
# One process drives the whole TPU mesh; no per-device launcher needed.
set -e
python -m sgtapose_tpu.cli.train \
  --dataset "${DATA_DIR:-../data/franka_data_1020}" \
  --add_dataset "${ADD_DATA_DIR:-../data/near_franka_data_1024}" \
  --val_dataset "${VAL_DATA_DIR:-../data/syn_test}" \
  --output_dir "${OUT_DIR:-exp/dlapawdl3new}" \
  --arch dlapawdl3new_34 \
  --num_epochs 20 --batch_size 4 --lr 1.25e-4 --seed 317 \
  --hm_disturb 0.75 --lost_disturb 0.2 --fp_disturb 0.1 \
  "$@"
