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
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


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

    from sgtapose_tpu.config import Config, InferConfig, ModelConfig
    from sgtapose_tpu.data import synthetic
    from sgtapose_tpu.eval.analysis import analyze_sequence_results
    from sgtapose_tpu.infer import detector as det_lib
    from sgtapose_tpu.models.sgta import create_model
    from sgtapose_tpu.train import trainer
    from sgtapose_tpu.utils.precision import bf16_inference_variables, cast_floating

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

    def apply(variables, *inputs):
        inputs = tuple(cast_floating(x, jnp.bfloat16) for x in inputs)
        out = model.apply(variables, *inputs, train=False)
        return {k: v.astype(jnp.float32) for k, v in out.items()}

    vids = []
    for v in range(args.videos):
        rv = jax.random.fold_in(jax.random.PRNGKey(args.seed + 99), v)
        projs, imgs, pos_cam = synthetic.make_sequence(
            rv, args.frames, return_pos_cam=True
        )
        vids.append((np.asarray(projs), imgs, np.asarray(pos_cam)))

    results = {}
    for mode in args.modes.split(","):
        cfg = dataclasses.replace(base, infer=InferConfig(decode_coord=mode))
        run = det_lib.make_video_detector(
            apply, variables, cfg, synthetic.camera_K(),
            raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
        )
        all_det, all_gt, all_pos = [], [], []
        t0 = time.time()
        for projs, imgs, pos_cam in vids:
            images, _, _ = det_lib.preprocess_frames(imgs, cfg)
            x3d = jnp.tile(synthetic.SKELETON[None], (args.frames, 1, 1))
            res = run(det_lib.VideoFrames(images=images, x3d=x3d))
            all_det.append(np.asarray(res.detected_kps))
            all_gt.append(projs)
            all_pos.append(pos_cam)
        dt = time.time() - t0
        det = np.concatenate(all_det)
        gt = np.concatenate(all_gt).astype(np.float32)
        pos = np.concatenate(all_pos).astype(np.float32)
        r = analyze_sequence_results(
            det, gt, pos, np.asarray(synthetic.camera_K()),
            (synthetic.RAW_W, synthetic.RAW_H),
            output_dir=None, rf=True, syn=False,
        )
        km, pm = r["keypoint_metrics"], r["pnp_metrics"]
        results[mode] = (km, pm)
        print(
            f"{mode:8s} PCK={km['l2_error_auc']:.4f} "
            f"L2={km['l2_error_mean_px']:.4f}px "
            f"ADD_AUC={pm['add_auc']:.4f} ADD_mean={pm['add_mean']:.5f}m "
            f"({args.videos * args.frames / dt:.1f} fps incl compile)",
            flush=True,
        )
    return results


if __name__ == "__main__":
    main()
