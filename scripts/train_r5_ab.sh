#!/bin/bash
# Round-5 fine-tune A/B (VERDICT r4 "Next round" #1 and #6): six arms warm-
# started from the step-3000 checkpoint of the long r5 run
# (scripts/train_r5_long.sh) — that checkpoint IS the r4ab "base" phase (same
# config: reference loss weights, reg 0.01, B=8 bf16 DCN), so the base arm is
# not re-trained.
#
# Arm control:  +N steps, reg 0.01, long-run lr schedule; eval exact + cache.
# Arm trunk:    fresh run from the base ckpt's exported bare DLA-34 trunk
#               (--init_backbone; ImageNet-transfer proxy, ref dla.py:339-363).
# Arm scratch:  fresh run, same seed/steps — trunk's control.
# Arm cache:    +N steps ON the feature-cache path conditioning
#               (--cache_prior); eval both paths (VERDICT r4 Weak #5 closure).
# Arm reg01:    +N steps, reg 0.10 — control vs reg01 isolates the reg weight.
# Arm qat:      +N steps fake-quant; eval runs real int8 serving.
#
# All arms run in ONE python process (TPU attach paid once) and pass
# --schedule_iters <long-run horizon> so compile-cache-compatible arms reuse
# the long run's train-step executable. See scripts/train_r5_ab.py.
set -e
cd "$(dirname "$0")/.."
BASE=${1:-.cache/ckpt_r5_18k_step3000}
OUT=${2:-.cache/r5ab}
STEPS=${3:-600}
mkdir -p "$OUT"

python -u scripts/train_r5_ab.py --base "$BASE" --out "$OUT" \
  --steps "$STEPS" --schedule_iters 18000 \
  --eval_videos 6 --eval_frames 16 2>&1 | tee "$OUT/ab.log"

echo "ALL ARMS DONE"
