#!/bin/bash
# Round-5 long training run (VERDICT r4 "Next round" #3): 18k steps B=8 bf16
# DCN on the EPnP-prior pipeline — the round-4 solver upgrade's first
# full-length run. Checkpoints every 3000 steps; the step-3000 checkpoint is
# the base arm for scripts/train_r5_ab.sh. Final eval reports exact AND
# feature-cache-path metrics.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-.cache/r5long}
mkdir -p "$OUT"

python -m sgtapose_tpu.cli.train_demo --steps 18000 --batch 8 --bf16 \
  --ckpt_out .cache/ckpt_r5_18k --ckpt_every 3000 \
  --eval_videos 6 --eval_frames 16 --eval_cache 2>&1 | tee "$OUT/long.log"

echo "LONG RUN DONE"
