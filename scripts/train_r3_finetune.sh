#!/bin/bash
# Round-3 reg-head fine-tune recipe (the accuracy lever from docs/PERF.md's
# error decomposition: residual keypoint error is ~90% reg-head sub-pixel
# regression noise).
#
# Phase A: 15k base steps at the reference loss weights (reg 0.01).
# Phase B (control):   +3k fine-tune steps, reg 0.01, lr 2.5e-4.
# Phase C (treatment): +3k fine-tune steps, reg 0.10, lr 2.5e-4, same base.
# B vs C isolates the reg-weight effect from the extra steps.
#
# ~6.5h total on the tunneled v5e chip (1.03 s/step at B=8 480p bf16).
set -e
cd "$(dirname "$0")/.."
OUT=${1:-.cache/r3b}
mkdir -p "$OUT"

python -m sgtapose_tpu.cli.train_demo --steps 15000 --batch 8 --bf16 \
  --ckpt_out "$OUT/base" --ckpt_every 3000 \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/base.log"

python -m sgtapose_tpu.cli.train_demo --steps 3000 --batch 8 --bf16 \
  --init_ckpt "$OUT/base" --reg_weight 0.01 --lr 2.5e-4 \
  --ckpt_out "$OUT/ft_control" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_control.log"

python -m sgtapose_tpu.cli.train_demo --steps 3000 --batch 8 --bf16 \
  --init_ckpt "$OUT/base" --reg_weight 0.1 --lr 2.5e-4 \
  --ckpt_out "$OUT/ft_reg01" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_reg01.log"

# Phase D (QAT): +3k fine-tune steps under fake-quant (straight-through int8
# noise, models/layers.py) from the same base; eval runs real int8 serving.
# D vs B isolates how much accuracy QAT recovers for the int8 serving mode.
python -m sgtapose_tpu.cli.train_demo --steps 3000 --batch 8 --bf16 \
  --init_ckpt "$OUT/base" --reg_weight 0.01 --lr 2.5e-4 --quant_train \
  --ckpt_out "$OUT/ft_qat" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_qat.log"

echo "ALL PHASES DONE"
