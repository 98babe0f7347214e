"""Round-5 fine-tune A/B — single-process runner.

Runs every arm of the r4/r5 A/B design (scripts/train_r5_ab.sh documents the
design; VERDICT r4 "Next round" #1/#6) inside ONE python process so the
TPU-tunnel attach + device init is paid once, and with --schedule_iters set
to the parent long run's horizon so the warm arms reuse its compiled
train-step executable verbatim (see cli/train_demo.py --schedule_iters).

Arms, ordered cheap-and-high-value first (compile-cache hits run before arms
that must pay a fresh XLA compile, so a wall-clock cutoff costs least):
  control  +N steps from the base ckpt, reg 0.01; eval exact + cache paths
           (zero compile: reuses the long run's executable)
  trunk    fresh run warm-started from the base ckpt's exported bare DLA-34
           trunk (--init_backbone; ref dla.py:339-363 load_pretrained_model)
  scratch  fresh run, same seed/steps — the trunk arm's control
  cache    +N steps ON the feature-cache conditioning (--cache_prior);
           eval both paths (VERDICT r4 Weak #5 closure; pipeline recompile)
  reg01    +N steps, reg 0.10 (reg_weight is baked into the XLA program —
           pays one train-step recompile)
  qat      +N steps fake-quant int8; eval runs real int8 serving (recompile)

Each arm's metrics append to <out>/results.jsonl as soon as the arm
finishes, so a cutoff loses at most the in-flight arm.

Usage:
  python scripts/train_r5_ab.py --base .cache/ckpt_r5_18k_step3000 \
      --out .cache/r5ab --steps 600 --schedule_iters 18000
"""

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def arm_argv(name, args):
    common = [
        "--steps", str(args.steps), "--batch", str(args.batch), "--bf16",
        "--schedule_iters", str(args.schedule_iters),
        "--eval_videos", str(args.eval_videos),
        "--eval_frames", str(args.eval_frames),
        "--ckpt_out", os.path.join(args.out, f"ft_{name}"),
    ]
    base = ["--init_ckpt", args.base]
    if args.resume_step:
        # fine-tune at the base's own point on the lr schedule (annealed
        # tail), not from a warmup replay — a warm-started arm that restarts
        # the schedule trains a trained model at peak lr and destroys it
        # (measured: base-at-global-3000 + 400 steps @ ~1e-3 -> PCK 0.13)
        base += ["--resume_step", str(args.resume_step)]
    trunk_pth = os.path.join(args.out, "trunk_dla34.pth")
    return {
        "control": common + base + ["--reg_weight", "0.01", "--eval_cache"],
        "reg01": common + base + ["--reg_weight", "0.1"],
        "cache": common + base + ["--cache_prior", "--eval_cache"],
        "trunk": common + ["--init_backbone", trunk_pth],
        "scratch": common,
        # QAT needs --dcn_remat: the fake-quant reduce_max scale temps push
        # the B=8 480p bf16 train graph 33M over the 15.75G HBM budget
        # (measured OOM at compile planning, r5); remat frees the DCN
        # gather temps and the graph fits.
        "qat": common + base + ["--quant_train", "--dcn_remat"],
    }[name]


def flatten_metrics(results):
    if not results:
        return {}
    out = {}
    for src, pre in ((results.get("keypoint_metrics"), ""),
                     (results.get("pnp_metrics"), "")):
        if src:
            for k in ("l2_error_auc", "l2_error_mean_px", "add_auc",
                      "add_mean", "num_found_gt_inframe", "num_gt_inframe"):
                if k in src:
                    out[pre + k] = src[k]
    cache = results.get("cache_path")
    if cache:
        for src in (cache.get("keypoint_metrics"), cache.get("pnp_metrics")):
            if src:
                for k in ("l2_error_auc", "add_auc"):
                    if k in src:
                        out["cache_" + k] = src[k]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=".cache/ckpt_r5_18k_step3000")
    ap.add_argument("--out", default=".cache/r5ab")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--schedule_iters", type=int, default=18000,
                    help="parent long run's horizon — arms that match it "
                         "reuse its compiled executable")
    ap.add_argument("--resume_step", type=int, default=0,
                    help="global step of --base on the parent schedule; "
                         "warm-started arms fine-tune at that lr point")
    ap.add_argument("--eval_videos", type=int, default=6)
    ap.add_argument("--eval_frames", type=int, default=16)
    ap.add_argument("--arms", default="control,trunk,scratch,cache,reg01,qat")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from sgtapose_tpu.cli import train_demo

    results_path = os.path.join(args.out, "results.jsonl")
    for name in args.arms.split(","):
        name = name.strip()
        if name == "trunk":
            # export the base trunk on CPU first (idempotent; may already
            # have been produced concurrently during the long run)
            trunk_pth = os.path.join(args.out, "trunk_dla34.pth")
            if not os.path.exists(trunk_pth):
                env = dict(os.environ, JAX_PLATFORMS="cpu")
                subprocess.run(
                    [sys.executable, "scripts/export_trunk_dla34.py",
                     "--ckpt", args.base, "--out", trunk_pth],
                    check=True, env=env,
                )
        argv = arm_argv(name, args)
        print(f"=== arm {name}: train_demo {' '.join(argv)}", flush=True)
        t0 = time.time()
        try:
            res = train_demo.main(argv)
            row = {"arm": name, "ok": True, "wall_s": round(time.time() - t0, 1),
                   "steps": args.steps, **flatten_metrics(res)}
        except Exception:
            traceback.print_exc()
            row = {"arm": name, "ok": False,
                   "wall_s": round(time.time() - t0, 1),
                   "error": traceback.format_exc(limit=1)}
        with open(results_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"=== arm {name} done: {json.dumps(row)}", flush=True)
    print("ALL ARMS DONE")


if __name__ == "__main__":
    main()
