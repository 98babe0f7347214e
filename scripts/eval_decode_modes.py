"""A/B the sub-pixel decode coordinate estimators on a trained checkpoint.

Runs the streaming detector over held-out synthetic videos once per
`decode_coord` mode (reg = reference cts_wreg parity, avg = DREAM windowed
average, logquad = log-parabola peak fit, mean = reg+logquad average) and
reports PCK AUC / L2 / ADD AUC for each — the measurement behind the
`--decode_coord` default (docs/PERF.md).

Usage:
    python scripts/eval_decode_modes.py --ckpt /root/repo/.cache/ckpt_r3_18k \
        [--videos 6 --frames 16] [--input_res 480 --dla_node dcn]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--videos", type=int, default=6)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--input_res", type=int, default=480)
    ap.add_argument("--dla_node", default="dcn")
    ap.add_argument("--seed", type=int, default=317)
    ap.add_argument("--modes", default="reg,logquad,mean,avg")
    args = ap.parse_args()

    from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from sgtapose_tpu.config import Config, InferConfig, ModelConfig
    from sgtapose_tpu.data import synthetic
    from sgtapose_tpu.eval.synthetic_eval import (
        evaluate_runner, make_bf16_apply, make_eval_videos,
    )
    from sgtapose_tpu.infer import detector as det_lib
    from sgtapose_tpu.models.sgta import create_model
    from sgtapose_tpu.train import trainer
    from sgtapose_tpu.utils.precision import bf16_inference_variables

    base = Config(
        model=ModelConfig(
            input_res=(args.input_res, args.input_res), dla_node=args.dla_node
        )
    )
    model = create_model(base.model)
    state = trainer.create_train_state(base, jax.random.PRNGKey(0), max_iters=1)
    state = trainer.load_checkpoint(os.path.abspath(args.ckpt), state)
    variables = bf16_inference_variables(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    apply = make_bf16_apply(model)
    vids = make_eval_videos(args.videos, args.frames, args.seed)

    results = {}
    for mode in args.modes.split(","):
        cfg = dataclasses.replace(base, infer=InferConfig(decode_coord=mode))
        run = det_lib.make_video_detector(
            apply, variables, cfg, synthetic.camera_K(),
            raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
        )
        r, fps = evaluate_runner(run, cfg, vids, args.frames)
        km, pm = r["keypoint_metrics"], r["pnp_metrics"]
        results[mode] = (km, pm)
        # zero-detection runs return None for the L2/ADD stats
        print(
            f"{mode:8s} PCK={km['l2_error_auc'] or 0.0:.4f} "
            f"L2={km['l2_error_mean_px'] or -1.0:.4f}px "
            f"ADD_AUC={pm['add_auc']:.4f} ADD_mean={pm['add_mean'] or -1.0:.5f}m "
            f"({fps:.1f} fps incl compile)",
            flush=True,
        )
    return results


if __name__ == "__main__":
    main()
