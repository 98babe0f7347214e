#!/bin/bash
# Round-4 compressed reg-head fine-tune A/B (the full 6.5h recipe is
# scripts/train_r3_finetune.sh; this is the same design at ~1/5 the steps so
# base + both arms + QAT fit one session on the tunneled v5e chip).
#
# Phase A: 3000 base steps at the reference loss weights (reg 0.01).
# Phase B (control):   +1000 fine-tune steps, reg 0.01, lr 2.5e-4.
# Phase C (treatment): +1000 fine-tune steps, reg 0.10, lr 2.5e-4, same base.
# Phase D (QAT):       +1000 fine-tune steps under fake-quant, same base;
#                      eval runs real int8 serving (int8 accuracy arm).
# B vs C isolates the reg-weight effect; B vs D isolates QAT recovery.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-.cache/r4ab}
mkdir -p "$OUT"

python -m sgtapose_tpu.cli.train_demo --steps 3000 --batch 8 --bf16 \
  --ckpt_out "$OUT/base" --ckpt_every 3000 \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/base.log"

python -m sgtapose_tpu.cli.train_demo --steps 1000 --batch 8 --bf16 \
  --init_ckpt "$OUT/base" --reg_weight 0.01 --lr 2.5e-4 \
  --ckpt_out "$OUT/ft_control" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_control.log"

python -m sgtapose_tpu.cli.train_demo --steps 1000 --batch 8 --bf16 \
  --init_ckpt "$OUT/base" --reg_weight 0.1 --lr 2.5e-4 \
  --ckpt_out "$OUT/ft_reg01" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_reg01.log"

python -m sgtapose_tpu.cli.train_demo --steps 1000 --batch 8 --bf16 \
  --init_ckpt "$OUT/base" --reg_weight 0.01 --lr 2.5e-4 --quant_train \
  --ckpt_out "$OUT/ft_qat" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_qat.log"

echo "ALL PHASES DONE"
