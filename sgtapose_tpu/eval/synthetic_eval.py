"""Shared synthetic-video evaluation harness.

One implementation of the held-out-synthetic eval loop used by the training
demo (cli/train_demo.py), the decode-estimator A/B (scripts/
eval_decode_modes.py), and the fast-path A/B (scripts/eval_fast_paths.py):
bf16 inference apply wrapper, the seed+99 held-out video family, and the
detector-run -> analyze_sequence_results plumbing. The eval video generator
is deliberately a different fold of the seed than training (fold_in(seed+99))
so evals are held out from train_demo's data stream.
"""

from __future__ import annotations

import time
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sgtapose_tpu.config import Config
from sgtapose_tpu.data import synthetic
from sgtapose_tpu.eval.analysis import analyze_sequence_results
from sgtapose_tpu.infer import detector as det_lib
from sgtapose_tpu.utils.precision import cast_floating


def make_bf16_apply(
    model, quant: str | None = None, quant_scales=None, quant_min_ch: int = 0
) -> Callable:
    """Inference apply fn: bf16 inputs/compute, f32 head outputs.

    quant="int8": quantizable convs (models/layers.py) execute as
    s8 x s8 -> s32 on the MXU — a serving mode beyond reference parity
    (accuracy/fps measured in docs/PERF.md). quant_scales: calibrated
    per-site activation maxima (layers.calibrate) — static scales, the fast
    serving form. quant_min_ch: quantize only convs with
    min(in_ch, out_ch) >= this (skip bandwidth-bound small sites)."""

    def apply(variables, *inputs):
        inputs = tuple(cast_floating(x, jnp.bfloat16) for x in inputs)
        out = model.apply(variables, *inputs, train=False)
        return {k: v.astype(jnp.float32) for k, v in out.items()}

    if quant is not None:
        from sgtapose_tpu.models.layers import quantized_apply

        apply = quantized_apply(apply, quant, scales=quant_scales,
                                min_ch=quant_min_ch)
    return apply


def calibration_inputs(cfg, n_frames: int = 4, seed: int = 0):
    """Representative single-frame forward inputs for int8 calibration:
    run the float detector's own preprocessing + GT-prior rendering on a
    synthetic video, yielding (cur, pre, pre_hm, repro_hm, pre_cls, repro_cls)
    tuples shaped like the streaming detector's per-frame model inputs.
    Keypoint count follows cfg.model.num_classes (kuka/ur5e/depth configs)."""
    from sgtapose_tpu.data import pipeline as pipe

    n_kp = cfg.model.num_classes
    skel = synthetic.robot_skeleton(n_kp)
    batch_fn = pipe.make_batch_fn(cfg, synthetic.camera_K())
    out = []
    for i in range(n_frames):
        k = jax.random.fold_in(jax.random.PRNGKey(seed + 4242), i)
        projs, imgs = synthetic.make_sequence(
            jax.random.fold_in(k, 0), 2, n_kp=n_kp
        )
        raw = pipe.RawSample(
            prev_img=imgs[0][None], next_img=imgs[1][None],
            prev_projs=projs[0][None], next_projs=projs[1][None],
            prev_x3d_rob=skel[None], next_x3d_rob=skel[None],
        )
        b = batch_fn(jax.random.fold_in(k, 1), raw)
        out.append((
            b["cur_img"], b["pre_img"], b["pre_hm"], b["repro_hm"],
            b["pre_hm_cls"], b["repro_hm_cls"],
        ))
    return out


def make_eval_videos(
    n_videos: int, n_frames: int, seed: int, n_kp: int | None = None
) -> List[Tuple[np.ndarray, jnp.ndarray, np.ndarray]]:
    """Held-out synthetic videos: [(gt_projs, raw_imgs, gt_pos_cam), ...]."""
    vids = []
    for v in range(n_videos):
        rv = jax.random.fold_in(jax.random.PRNGKey(seed + 99), v)
        projs, imgs, pos_cam = synthetic.make_sequence(
            rv, n_frames, return_pos_cam=True, n_kp=n_kp
        )
        vids.append((np.asarray(projs), imgs, np.asarray(pos_cam)))
    return vids


def evaluate_runner(run, cfg: Config, vids, n_frames: int | None = None, rf: bool = True):
    """Drive a video runner over pre-generated vids; return (results, fps).

    run: fn(VideoFrames) -> FrameResult (e.g. make_video_detector output).
    The skeleton follows cfg.model.num_classes (kuka/ur5e configs included)
    and the frame count comes from each vid itself; the n_frames parameter
    is accepted for backward compatibility but ignored.
    fps includes any first-call compile (callers that want steady-state
    timing should warm `run` first)."""
    skel = synthetic.robot_skeleton(cfg.model.num_classes)
    all_det, all_gt, all_pos = [], [], []
    t0 = time.time()
    n_total = 0
    for projs, imgs, pos_cam in vids:
        if projs.shape[1] != cfg.model.num_classes:
            raise ValueError(
                f"eval vids have {projs.shape[1]} keypoints but the model "
                f"expects {cfg.model.num_classes}; generate them with "
                f"make_eval_videos(..., n_kp={cfg.model.num_classes})"
            )
        T = imgs.shape[0]
        n_total += T
        images, _, _ = det_lib.preprocess_frames(imgs, cfg)
        x3d = jnp.tile(skel[None], (T, 1, 1))
        res = run(det_lib.VideoFrames(images=images, x3d=x3d))
        all_det.append(np.asarray(res.detected_kps))
        all_gt.append(projs)
        all_pos.append(pos_cam)
    dt = time.time() - t0
    det = np.concatenate(all_det)
    gt = np.concatenate(all_gt).astype(np.float32)
    pos = np.concatenate(all_pos).astype(np.float32)
    results = analyze_sequence_results(
        det, gt, pos, np.asarray(synthetic.camera_K()),
        (synthetic.RAW_W, synthetic.RAW_H), output_dir=None, rf=rf, syn=False,
    )
    fps = n_total / max(dt, 1e-9)
    return results, fps
