#!/bin/bash
# Wedge-tolerant segment trainer (r5): the axon tunnel intermittently drops
# long-running device streams — the client process freezes mid-call with no
# error (observed twice in this session, ~1.5-3 h in; docs/PERF.md). Train in
# supervised segments: frequent checkpoints (--ckpt_every 500), a log-silence
# watchdog, and automatic relaunch from the newest checkpoint with
# --resume_step (exact lr-tail replay, zero recompile).
#
# Usage: train_supervised_r5.sh <base_ckpt> <base_global_step> <target_step> <out_dir>
set -u
BASE_CKPT=${1:?}
GLOBAL=${2:?}
TARGET=${3:?}
OUT=${4:-.cache/r5long}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
CKPT=$BASE_CKPT

while true; do
  SEG=$((TARGET - GLOBAL))
  LOG=$OUT/seg_$GLOBAL.log
  echo "[supervisor] segment from global $GLOBAL ($SEG steps) base=$CKPT" \
    | tee -a "$OUT/supervisor.log"
  python -u -m sgtapose_tpu.cli.train_demo --steps "$SEG" \
    --schedule_iters 18000 --batch 8 --bf16 \
    --init_ckpt "$CKPT" --resume_step "$GLOBAL" \
    --ckpt_out ".cache/r5seg_$GLOBAL" --ckpt_every 500 \
    --eval_videos 6 --eval_frames 16 --eval_cache > "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt 480 ]; then
      echo "[supervisor] log silent ${AGE}s — killing wedged $PID" \
        | tee -a "$OUT/supervisor.log"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if grep -q "ADD AUC" "$LOG"; then
    echo "[supervisor] run complete (eval emitted)" | tee -a "$OUT/supervisor.log"
    break
  fi
  LATEST=$(ls -d ".cache/r5seg_${GLOBAL}_step"* 2>/dev/null \
           | sed "s/.*_step//" | sort -n | tail -1)
  if [ -n "${LATEST:-}" ]; then
    CKPT=".cache/r5seg_${GLOBAL}_step$LATEST"
    GLOBAL=$((GLOBAL + LATEST))
  elif [ -d ".cache/r5seg_$GLOBAL" ]; then
    # steps finished (final save) but eval wedged: eval-only relaunch
    CKPT=".cache/r5seg_$GLOBAL"
    GLOBAL=$TARGET
  fi
  echo "[supervisor] relaunching from global $GLOBAL" | tee -a "$OUT/supervisor.log"
done
touch "$OUT/SUPERVISED_DONE"
