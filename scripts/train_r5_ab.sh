#!/bin/bash
# Round-5 fine-tune A/B (VERDICT r4 "Next round" #1): the four fine-tune arms
# of the r4 design, plus the feature-cache arm, warm-started from the step-3000
# checkpoint of the long r5 run (scripts/train_r5_long.sh) — that checkpoint IS
# the r4ab "base" phase (same config: reference loss weights, reg 0.01, B=8
# bf16 DCN), so the base arm is not re-trained.
#
# Arm A (control):   +1000 steps, reg 0.01, lr 2.5e-4.
# Arm B (treatment): +1000 steps, reg 0.10, lr 2.5e-4, same base.
# Arm C (QAT):       +1000 steps under fake-quant; eval runs real int8 serving.
# Arm D (cache):     +1000 steps ON the feature-cache path's conditioning
#                    (--cache_prior); eval runs BOTH exact and cache paths
#                    (VERDICT r4 Weak #5 closure).
# A vs B isolates the reg-weight effect; A vs C isolates QAT recovery;
# A vs D (cache-path eval both) isolates the cache-conditioning deviation.
set -e
cd "$(dirname "$0")/.."
BASE=${1:-.cache/ckpt_r5_18k_step3000}
OUT=${2:-.cache/r5ab}
mkdir -p "$OUT"

python -m sgtapose_tpu.cli.train_demo --steps 1000 --batch 8 --bf16 \
  --init_ckpt "$BASE" --reg_weight 0.01 --lr 2.5e-4 \
  --ckpt_out "$OUT/ft_control" --eval_cache \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_control.log"

python -m sgtapose_tpu.cli.train_demo --steps 1000 --batch 8 --bf16 \
  --init_ckpt "$BASE" --reg_weight 0.1 --lr 2.5e-4 \
  --ckpt_out "$OUT/ft_reg01" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_reg01.log"

python -m sgtapose_tpu.cli.train_demo --steps 1000 --batch 8 --bf16 \
  --init_ckpt "$BASE" --reg_weight 0.01 --lr 2.5e-4 --quant_train \
  --ckpt_out "$OUT/ft_qat" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_qat.log"

python -m sgtapose_tpu.cli.train_demo --steps 1000 --batch 8 --bf16 \
  --init_ckpt "$BASE" --reg_weight 0.01 --lr 2.5e-4 --cache_prior \
  --ckpt_out "$OUT/ft_cache" --eval_cache \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_cache.log"

# ImageNet-transfer proxy A/B (VERDICT r4 "Next round" #6; ref
# dla.py:339-351 load_pretrained_model): export the base checkpoint's trunk
# as a bare DLA-34 state_dict, warm-start a FRESH run from it, and compare
# early training + eval vs from-scratch at the same seed/steps.
python scripts/export_trunk_dla34.py --ckpt "$BASE" \
  --out "$OUT/trunk_dla34.pth" 2>&1 | tee "$OUT/export_trunk.log"

python -m sgtapose_tpu.cli.train_demo --steps 1000 --batch 8 --bf16 \
  --init_backbone "$OUT/trunk_dla34.pth" \
  --ckpt_out "$OUT/ft_trunk" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_trunk.log"

python -m sgtapose_tpu.cli.train_demo --steps 1000 --batch 8 --bf16 \
  --ckpt_out "$OUT/ft_scratch" \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ft_scratch.log"

echo "ALL ARMS DONE"
