"""Accuracy + speed of the streaming fast paths vs the exact detector.

Loads a train_demo checkpoint (--ckpt_out) and evaluates synthetic videos
through four detector configurations:
  exact        — Siamese double trunk, fresh EPnP init per frame (parity)
  cache        — feature-cache trunk reuse (infer/detector.py)
  warm         — warm-start prior PnP from the carried pose
  cache+warm   — both
reporting PCK AUC@12px / ADD AUC@0.06m / fps for each, so the fast paths'
documented deviations come with MEASURED accuracy deltas.

Usage:
    python scripts/eval_fast_paths.py --ckpt /tmp/demo_ckpt_r2 \
        [--videos 4 --frames 16] [--input_res 480 --dla_node dcn]
"""

import argparse
import dataclasses
import json
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
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--input_res", type=int, default=480)
    ap.add_argument("--dla_node", default="dcn")
    ap.add_argument("--seed", type=int, default=317)
    args = ap.parse_args()

    from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from sgtapose_tpu.config import Config, InferConfig, ModelConfig
    from sgtapose_tpu.data import synthetic
    from sgtapose_tpu.eval.analysis import analyze_sequence_results
    from sgtapose_tpu.infer import detector as det_lib
    from sgtapose_tpu.models.sgta import create_model
    from sgtapose_tpu.train import trainer
    from sgtapose_tpu.utils.precision import bf16_inference_variables

    base_cfg = Config(
        model=ModelConfig(
            input_res=(args.input_res, args.input_res), dla_node=args.dla_node
        )
    )
    model = create_model(base_cfg.model)
    state = trainer.create_train_state(base_cfg, jax.random.PRNGKey(0), max_iters=1)
    state = trainer.load_checkpoint(os.path.abspath(args.ckpt), state)
    variables = bf16_inference_variables(
        {"params": state.params, "batch_stats": state.batch_stats}
    )

    from sgtapose_tpu.eval.synthetic_eval import make_bf16_apply, make_eval_videos

    apply = make_bf16_apply(model)

    # held-out synthetic videos — the SAME set definition train_demo and
    # eval_decode_modes use (single source of truth for the PRNG derivation)
    videos = []
    for projs, imgs, pos_cam in make_eval_videos(args.videos, args.frames, args.seed):
        images, _, _ = det_lib.preprocess_frames(imgs, base_cfg)
        x3d = jnp.tile(synthetic.SKELETON[None], (args.frames, 1, 1))
        videos.append((images, x3d, projs, np.asarray(pos_cam)))

    def evaluate(name, make_runner):
        run = make_runner()
        all_det, all_gt, all_pos = [], [], []
        # warm once (compile), then time
        _ = np.asarray(run(det_lib.VideoFrames(images=videos[0][0], x3d=videos[0][1])).detected_kps)
        t0 = time.perf_counter()
        for images, x3d, projs, pos_cam in videos:
            res = run(det_lib.VideoFrames(images=images, x3d=x3d))
            all_det.append(np.asarray(res.detected_kps))
            all_gt.append(projs)
            all_pos.append(pos_cam)
        dt = time.perf_counter() - t0
        n_frames = args.videos * args.frames
        results = analyze_sequence_results(
            np.concatenate(all_det),
            np.concatenate(all_gt).astype(np.float32),
            np.concatenate(all_pos).astype(np.float32),
            np.asarray(synthetic.camera_K()),
            (synthetic.RAW_W, synthetic.RAW_H), output_dir=None, rf=True,
        )
        km, pm = results["keypoint_metrics"], results["pnp_metrics"]
        row = {
            "config": name,
            "pck_auc_12px": round(km["l2_error_auc"] or 0.0, 4),
            "l2_mean_px": round(km["l2_error_mean_px"] or -1.0, 3),
            "found_inframe": f"{km['num_found_gt_inframe']}/{km['num_gt_inframe']}",
            "add_auc": round(pm["add_auc"], 4),
            "fps": round(n_frames / dt, 1),
        }
        print(json.dumps(row))
        return row

    K = synthetic.camera_K()
    raw_hw = (synthetic.RAW_H, synthetic.RAW_W)

    def _calibrate():
        from sgtapose_tpu.eval.synthetic_eval import calibration_inputs
        from sgtapose_tpu.models import layers as qlayers

        return qlayers.calibrate(
            lambda *a: apply(variables, *a),
            calibration_inputs(base_cfg, n_frames=4, seed=args.seed),
        )

    def cfg_with(warm):
        return dataclasses.replace(
            base_cfg, infer=dataclasses.replace(base_cfg.infer, pnp_warm_start=warm)
        )

    rows = [
        evaluate("exact", lambda: det_lib.make_video_detector(
            apply, variables, cfg_with(False), K, raw_hw)),
        evaluate("warm", lambda: det_lib.make_video_detector(
            apply, variables, cfg_with(True), K, raw_hw)),
        evaluate("cache", lambda: det_lib.make_cached_video_detector(
            model, variables, cfg_with(False), K, raw_hw)),
        evaluate("cache+warm", lambda: det_lib.make_cached_video_detector(
            model, variables, cfg_with(True), K, raw_hw)),
        # int8 serving mode (models/layers.py): quantizable convs as
        # s8xs8->s32 on the MXU with calibrated static activation scales;
        # exact recurrence otherwise
        evaluate("int8", lambda: det_lib.make_video_detector(
            make_bf16_apply(model, quant="int8", quant_scales=_calibrate()),
            variables, cfg_with(False), K, raw_hw)),
        # dynamic-scale variant (no calibration needed; slower, accuracy ref)
        evaluate("int8_dyn", lambda: det_lib.make_video_detector(
            make_bf16_apply(model, quant="int8"), variables,
            cfg_with(False), K, raw_hw)),
        evaluate("int8_dyn+cache+warm", lambda: det_lib.make_cached_video_detector(
            model, variables, cfg_with(True), K, raw_hw, quant="int8")),
    ]
    return rows


if __name__ == "__main__":
    main()
