#!/usr/bin/env bash
# Real-data parity runbook (VERDICT r3 item 7): the moment the released
# reference checkpoint (pretrained_model/ckpt/model_20.pth) and the DREAM-real
# sets are available, this one command runs
#   convert (torch -> orbax) -> infer on all 3 real sets (--rf, --ref_sort y)
#   -> analysis CSVs -> numeric diff vs the reference's result CSVs.
# Mirrors ref sgtapose/scripts/inference_scripts.sh:1-48 (panda-orb,
# panda-3cam_azure, panda-3cam_realsense, each with --rf LM refinement).
#
# Usage:
#   scripts/parity_real.sh MODEL.pth DATA_ROOT REAL_INFO_DIR [REF_RESULTS] [OUT]
#       MODEL.pth    released reference checkpoint
#       DATA_ROOT    dir containing panda-orb/ panda-3cam_azure/ ...
#       REAL_INFO_DIR  dream_real_info dir ({set}_split_info.json)
#       REF_RESULTS  (optional) reference-produced result CSV dir to diff
#       OUT          (optional) output root, default results/parity_real
#
#   scripts/parity_real.sh --dry-run
#       No assets needed: synthesizes a reference-format .pth (random
#       weights exported through the tested jax->torch path) + a synthetic
#       DREAM-real-format set, then runs the identical convert -> infer ->
#       analysis pipeline end-to-end. Verifies the runbook itself works in
#       this container today.
set -e
cd "$(dirname "$0")/.."

if [ "$1" = "--dry-run" ]; then
  OUT=${2:-results/parity_real_dryrun}
  mkdir -p "$OUT"
  # the dry run exercises the PIPELINE, not the chip: force CPU so it never
  # contends with (or waits on) the TPU tunnel
  export JAX_PLATFORMS=cpu
  echo "== dry run: synthesizing fixtures under $OUT =="
  python - "$OUT" <<'EOF'
import sys

out = sys.argv[1]
from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()  # also pins JAX_PLATFORMS=cpu
from sgtapose_tpu.data.synthetic import write_real_dataset
# tiny DREAM-real-format set + split info
write_real_dataset(f"{out}/data", set_name="panda-orb", n_videos=1, n_frames=3)
# reference-format .pth: random flagship weights exported jax->torch
import jax
from sgtapose_tpu.config import Config, ModelConfig
from sgtapose_tpu.train import trainer
from sgtapose_tpu.utils import torch_convert as tc

cfg = Config(model=ModelConfig(input_res=(64, 64)))
state = trainer.create_train_state(cfg, jax.random.PRNGKey(0), max_iters=1)
sd = tc.export_state_dict(state.params, state.batch_stats)
tc.save_torch_checkpoint(f"{out}/model_20.pth", sd, epoch=20)
print("fixtures ready")
EOF
  MODEL="$OUT/model_20.pth"
  DATA_ROOT="$OUT/data"
  REAL_INFO="$OUT/data/dream_real_info"
  REF_RESULTS=""
  SETS="panda-orb"
  # keep the dry run light: tiny input res (params are res-independent)
  EXTRA_FLAGS="--input_res 128"
else
  MODEL=${1:?usage: parity_real.sh MODEL.pth DATA_ROOT REAL_INFO [REF_RESULTS] [OUT]}
  DATA_ROOT=${2:?DATA_ROOT missing}
  REAL_INFO=${3:?REAL_INFO_DIR missing}
  REF_RESULTS=${4:-}
  OUT=${5:-results/parity_real}
  SETS="panda-orb panda-3cam_azure panda-3cam_realsense"
  EXTRA_FLAGS=""
  mkdir -p "$OUT"
fi

echo "== convert $MODEL -> $OUT/ckpt_converted =="
python -m sgtapose_tpu.cli.convert \
  --torch_ckpt "$MODEL" --out "$OUT/ckpt_converted" \
  --report_out "$OUT/convert_report.json"

for SET in $SETS; do
  echo "== infer $SET =="
  python -m sgtapose_tpu.cli.infer \
    --dataset "$DATA_ROOT" \
    --is_real "$SET" \
    --split_info "$REAL_INFO/${SET}_split_info.json" \
    --ckpt "$OUT/ckpt_converted" \
    --output_dir "$OUT/$SET" \
    --robot panda \
    --ref_sort y \
    --rf $EXTRA_FLAGS
done

if [ -n "$REF_RESULTS" ]; then
  echo "== diff vs reference CSVs ($REF_RESULTS) =="
  python - "$OUT" "$REF_RESULTS" <<'EOF'
import csv, glob, os, sys

out, ref = sys.argv[1], sys.argv[2]
worst = {}
for ours in glob.glob(os.path.join(out, "*", "*.csv")):
    name = os.path.basename(ours)
    theirs = None
    for cand in glob.glob(os.path.join(ref, "**", name), recursive=True):
        theirs = cand
        break
    if theirs is None:
        print(f"  [no reference counterpart] {name}")
        continue
    with open(ours) as f1, open(theirs) as f2:
        r1, r2 = list(csv.reader(f1)), list(csv.reader(f2))
    if len(r1) != len(r2):
        print(f"  [row-count mismatch] {name}: {len(r1)} vs {len(r2)}")
        continue
    mx = 0.0
    for a, b in zip(r1, r2):
        for x, y in zip(a, b):
            try:
                mx = max(mx, abs(float(x) - float(y)))
            except ValueError:
                pass  # header / non-numeric cell
    worst[name] = mx
    print(f"  {name}: max |delta| = {mx:.6g}")
if worst:
    print("PARITY DIFF SUMMARY:", worst)
EOF
fi
echo "parity_real.sh done -> $OUT"
