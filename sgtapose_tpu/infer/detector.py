"""Streaming inference detector as a `lax.scan` over frames.

Re-design of ref lib/sgta_detector.py:117-236 (SGTADetector.run) for TPU.
The reference's per-frame loop is a host-side state machine: python PnP for
the prior, numpy heatmap rendering, torch forward, GPU->CPU bounce for peak
finding, numpy inverse affine — every frame. Here the entire recurrence is a
single jitted scan with static shapes; the carry is exactly the reference's
cross-frame state (sgta_detector.py:203, 232-234):

  carry = (pre_img   — previous frame's preprocessed image,
           detected_kps — (K, 2) RAW-frame keypoints, sentinel -999.999*4)

Per frame (mirroring run()'s stages):
  1. priors: first frame -> zeros (ref _get_additional_inputs :415-454);
     else PnP from previous detections via `is_pnp` semantics with
     fall-back-to-previous-detections on failure (ref
     _get_further_dt_pnp_inputs[_real] :456-547, geometric_vision.py:283-310),
     rendered at input res (pre/repro) + output res (per-class).
  2. model forward (6 inputs) + clamped sigmoid      (ref process :881-927)
  3. on-device peak decode + reg gather              (ref dream_generic_decode)
  4. inverse output-affine to raw pixels             (ref post_process :929-942)
  5. best-per-class detections -> (K, 2) raw kps or sentinel
     (ref merge_outputs :955-961 score>out_thresh; _get_final_kps :608-651)

Because the affine is fixed per video (no augmentation at test time), all
frames are warped in one vmapped pass before the scan; the scan handles only
the sequential dependency. Videos batch via vmap over the scan.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sgtapose_tpu.config import IMAGE_MEAN, IMAGE_STD, Config
from sgtapose_tpu.core import geometry, pnp
from sgtapose_tpu.decode import peaks as decode_lib

KP_SENTINEL = -999.999 * 4  # missing-detection marker (ref sgta_detector.py:613)


class VideoFrames(NamedTuple):
    """Pre-warped per-video inputs (T frames, static shapes)."""

    images: jnp.ndarray  # (T, H_in, W_in, 3) normalized network inputs
    x3d: jnp.ndarray  # (T, K, 3) FK keypoint positions (robot or cam frame)
    # optional GT-initialized prior (ref _get_initial_gt_inputs
    # sgta_detector.py:571-605): raw-frame GT projections used as frame-0
    # "detections"; pass None/zeros to start cold (the default)
    init_kps: Optional[jnp.ndarray] = None  # (K, 2) or None
    # optional TEACHER-FORCED prior detections: frame t's prior PnP consumes
    # teacher_kps[t] instead of the previous frame's own detections
    # (raw coords, KP_SENTINEL for missing). Turns the chaotic closed-loop
    # recurrence into independent per-frame evaluations — used for
    # implementation-parity bounds and drift diagnostics.
    teacher_kps: Optional[jnp.ndarray] = None  # (T, K, 2) or None


class DetectorCarry(NamedTuple):
    pre_img: jnp.ndarray  # (H_in, W_in, 3)
    detected_kps: jnp.ndarray  # (K, 2) raw coords or KP_SENTINEL
    frame_idx: jnp.ndarray  # () int32
    # previous frame's solved pose — warm start for the prior PnP when
    # cfg.infer.pnp_warm_start (skips the per-frame DLT eigh/svd)
    quat: jnp.ndarray  # (4,) wxyz
    trans: jnp.ndarray  # (3,)
    pose_ok: jnp.ndarray  # () bool


class FrameResult(NamedTuple):
    detected_kps: jnp.ndarray  # (K, 2) raw coords or KP_SENTINEL
    scores: jnp.ndarray  # (K,)
    # tracking-head backward displacement at each peak, mapped to raw-pixel
    # units (linear part of the inverse output affine; ref post_process.py
    # transforms the tracking branch alongside ct). Feeds the host-side
    # tracker pass (ref sgta_detector.py:198-202 tracker.step).
    tracking: jnp.ndarray = None  # (K, 2)
    # debug-only extras (debug_outputs=True): the post-sigmoid center
    # heatmaps and the rendered prior heatmap, for the per-frame Debugger
    # blends (ref sgta_detector.py:960-1032 with opt.debug >= 1)
    debug_hm: Optional[jnp.ndarray] = None  # (Ho, Wo, K)
    debug_pre_hm: Optional[jnp.ndarray] = None  # (H_in, W_in, 1)


def preprocess_frames(
    raw_images: jnp.ndarray, cfg: Config
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Warp+normalize all frames of a video (fixed center/scale transform,
    ref sgta_detector.py:354-399 fix_res path). Returns (images, trans_input,
    trans_output)."""
    T, H_raw, W_raw = raw_images.shape[0], raw_images.shape[1], raw_images.shape[2]
    in_h, in_w = cfg.model.input_res
    out_h, out_w = cfg.model.output_res
    c = jnp.array([W_raw / 2.0, H_raw / 2.0], jnp.float32)
    s = jnp.float32(max(H_raw, W_raw))
    trans_input = geometry.get_affine_transform(c, s, 0.0, (in_w, in_h))
    trans_output = geometry.get_affine_transform(c, s, 0.0, (out_w, out_h))
    mean = jnp.asarray(IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(IMAGE_STD, jnp.float32)

    def one(img):
        warped = geometry.warp_affine(img.astype(jnp.float32), trans_input, (in_h, in_w))
        return geometry.normalize_image(warped, mean, std)

    return jax.vmap(one)(raw_images), trans_input, trans_output


def _render_priors(
    detected_kps: jnp.ndarray,
    repro_kps: jnp.ndarray,
    any_valid: jnp.ndarray,
    trans_input: jnp.ndarray,
    trans_output: jnp.ndarray,
    cfg: Config,
    raw_wh: Tuple[int, int],
):
    """pre/repro heatmaps at input res + per-class at output res. Sentinel
    keypoints land outside the raw frame and render as nothing; if NO
    detections were valid the maps are all-zero (ref empty-detection fallback
    sgta_detector.py:476-479)."""
    in_h, in_w = cfg.model.input_res
    out_h, out_w = cfg.model.output_res
    W_raw, H_raw = raw_wh
    okf = any_valid.astype(jnp.float32)
    pre_hm = geometry.render_prior_heatmap(
        detected_kps, trans_input, in_w, in_h, W_raw, H_raw
    ) * okf
    repro_hm = geometry.render_prior_heatmap(
        repro_kps, trans_input, in_w, in_h, W_raw, H_raw
    ) * okf
    pre_cls = geometry.render_prior_heatmap_cls(
        detected_kps, trans_output, out_w, out_h, W_raw, H_raw
    ) * okf
    repro_cls = geometry.render_prior_heatmap_cls(
        repro_kps, trans_output, out_w, out_h, W_raw, H_raw
    ) * okf
    return (
        pre_hm[..., None],
        repro_hm[..., None],
        jnp.moveaxis(pre_cls, 0, -1),
        jnp.moveaxis(repro_cls, 0, -1),
    )


def _phase_model_inputs(phase: str, cur, pre_img, pre_hm, repro_hm, pre_cls, repro_cls):
    """Inference-time phase dispatch (ref sgta_detector.py:881-907 process):
    which prior tensors each arch family consumes."""
    if phase == "PlanA_win":
        return (cur, pre_img, pre_hm, repro_hm, pre_cls, repro_cls)
    if phase in ("PlanA", "PlanACAT", "ablation_shared_repro",
                 "ablation_shared", "ablation_wo_shared"):
        # ablation_shared/wo_shared ignore repro_hm internally
        # (ref passes 3 args there; our modules take it positionally)
        return (cur, pre_img, pre_hm, repro_hm)
    if phase == "CenterTrack":
        return (cur, pre_img, pre_hm)
    if phase == "CenterNet":
        return (cur,)
    raise ValueError(f"unknown detector phase: {phase}")


def _build_video_runner(
    model_apply,
    variables,
    cfg: Config,
    camera_K,
    raw_hw: Tuple[int, int],
    phase: str = "PlanA_win",
    debug_outputs: bool = False,
):
    """fn(video: VideoFrames) -> FrameResult stacked over T (unjitted).

    model_apply: bound flax apply (variables, phase inputs, train=False) ->
    heads. raw_hw: raw video resolution (H_raw, W_raw) — static per camera.
    phase selects the arch family's prior wiring (ref process() dispatch).
    """
    H_raw, W_raw = raw_hw
    in_h, in_w = cfg.model.input_res
    out_h, out_w = cfg.model.output_res
    K_cam = jnp.asarray(camera_K, jnp.float32)
    n_kp = cfg.model.num_classes

    c = jnp.array([W_raw / 2.0, H_raw / 2.0], jnp.float32)
    s = jnp.float32(max(H_raw, W_raw))
    trans_input = geometry.get_affine_transform(c, s, 0.0, (in_w, in_h))
    trans_output = geometry.get_affine_transform(c, s, 0.0, (out_w, out_h))
    trans_output_inv = geometry.invert_affine(trans_output)

    def frame_step(carry: DetectorCarry, inp) -> Tuple[DetectorCarry, FrameResult]:
        cur_img, prev_x3d, next_x3d, teacher = inp
        first = carry.frame_idx == 0
        # first frame: pre image := current image (ref sgta_detector.py:157-159)
        pre_img = jnp.where(first, cur_img, carry.pre_img)

        # ---- structure prior ------------------------------------------------
        prior_kps = carry.detected_kps if teacher is None else teacher
        valid = jnp.all(prior_kps > KP_SENTINEL, axis=1)
        warm = (
            (carry.quat, carry.trans, carry.pose_ok)
            if cfg.infer.pnp_warm_start else None
        )
        ok, repro, pose = pnp.pnp_reprojection_prior(
            prev_x3d, prior_kps, next_x3d, K_cam, valid, init=warm
        )
        # PnP failure -> reuse previous detections (is_pnp fallback)
        repro = jnp.where(ok, repro, prior_kps)
        # cold start: all-sentinel kps -> no valid rows -> zero priors;
        # GT-initialized start (init_kps) has valid rows on frame 0 by design
        any_valid = jnp.any(valid)
        pre_hm, repro_hm, pre_cls, repro_cls = _render_priors(
            prior_kps, repro, any_valid, trans_input, trans_output,
            cfg, (W_raw, H_raw),
        )

        # ---- model + decode -------------------------------------------------
        out = model_apply(
            variables,
            *_phase_model_inputs(
                phase, cur_img[None], pre_img[None], pre_hm[None],
                repro_hm[None], pre_cls[None], repro_cls[None],
            ),
        )
        hm = jnp.clip(jax.nn.sigmoid(out["hm"][0]), 1e-4, 1 - 1e-4)
        dec = decode_lib.decode_heatmaps(
            hm,
            out["reg"][0],
            out["tracking"][0],
            max_peaks=cfg.infer.max_peaks,
            peak_thresh=cfg.infer.peak_thresh,
            ambiguity_gap=cfg.infer.ambiguity_gap,
            peak_offset=cfg.infer.peak_offset,
            sigma=cfg.infer.peak_sigma,
            ref_sort=cfg.infer.ref_sort,
            coord_mode=cfg.infer.decode_coord,
        )

        # ---- back to raw coords + thresholds --------------------------------
        raw_kps = geometry.affine_points(dec.coords, trans_output_inv)
        keep = dec.valid & (dec.scores > cfg.infer.out_thresh)
        detected = jnp.where(keep[:, None], raw_kps, KP_SENTINEL)
        scores = jnp.where(keep, dec.scores, -1.0)

        trk_raw = dec.tracking @ trans_output_inv[:, :2].T

        new_carry = DetectorCarry(
            pre_img=cur_img,
            detected_kps=detected,
            frame_idx=carry.frame_idx + 1,
            quat=pose.quat,
            trans=pose.trans,
            pose_ok=pose.success,
        )
        extras = (
            {"debug_hm": hm, "debug_pre_hm": pre_hm} if debug_outputs else {}
        )
        return new_carry, FrameResult(
            detected_kps=detected, scores=scores, tracking=trk_raw, **extras
        )

    def run_video(video: VideoFrames) -> FrameResult:
        T = video.images.shape[0]
        # prior PnP for frame t uses frame t-1's 3D keypoints
        prev_x3d = jnp.concatenate([video.x3d[:1], video.x3d[:-1]], axis=0)
        init_kps = (
            video.init_kps
            if video.init_kps is not None
            else jnp.full((n_kp, 2), KP_SENTINEL, jnp.float32)
        )
        init = DetectorCarry(
            pre_img=jnp.zeros_like(video.images[0]),
            detected_kps=init_kps,
            frame_idx=jnp.int32(0),
            quat=jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
            trans=jnp.zeros(3, jnp.float32),
            pose_ok=jnp.bool_(False),
        )
        # teacher_kps=None is an empty pytree leaf: the scan threads None
        # through each step and frame_step's python-level check picks the
        # closed-loop (carry) prior
        _, results = jax.lax.scan(
            frame_step, init,
            (video.images, prev_x3d, video.x3d, video.teacher_kps),
        )
        return results

    return run_video


def make_video_detector(model_apply, variables, cfg, camera_K, raw_hw,
                        phase: str = "PlanA_win", debug_outputs: bool = False):
    """Jitted single-video detector: fn(VideoFrames) -> FrameResult over T.
    debug_outputs=True adds per-frame heatmap/prior tensors for the Debugger
    (utils/debugger.py; ref sgta_detector.py debug path)."""
    return jax.jit(
        _build_video_runner(model_apply, variables, cfg, camera_K, raw_hw,
                            phase, debug_outputs=debug_outputs)
    )


def make_batched_video_detector(model_apply, variables, cfg, camera_K, raw_hw,
                                phase: str = "PlanA_win"):
    """Batch across videos (frames are sequentially dependent; videos are
    not — SURVEY.md §7.7 'batch across videos'). fn(stacked VideoFrames with
    leading video dim) -> stacked FrameResult."""
    runner = _build_video_runner(model_apply, variables, cfg, camera_K, raw_hw, phase)
    return jax.jit(jax.vmap(runner))


def make_sharded_video_detector(model_apply, variables, cfg, camera_K, raw_hw,
                                mesh, phase: str = "PlanA_win"):
    """Multi-chip serving: a batch of videos sharded across a device mesh.

    Each device runs the full streaming recurrence (scan over frames) on its
    shard of the video batch; params replicate, and there are ZERO
    collectives in the hot loop — video-level inference is embarrassingly
    parallel, the multi-chip equivalent of the reference's
    one-process-per-GPU serving. Single-chip batched throughput is measured
    in docs/PERF.md (bench.py --full); this is the production-fill
    configuration for full v5e pods where one video cannot saturate a chip.

    fn(stacked VideoFrames, leading video dim divisible by mesh size)
    -> stacked FrameResult (sharded; np.asarray gathers to host)."""
    from sgtapose_tpu.parallel import mesh as mesh_lib

    runner = _build_video_runner(model_apply, variables, cfg, camera_K, raw_hw, phase)
    fn = jax.jit(jax.vmap(runner))

    def run(videos: VideoFrames) -> FrameResult:
        n = videos.images.shape[0]
        n_dev = mesh.devices.size
        if n % n_dev:
            raise ValueError(f"video batch {n} not divisible by mesh size {n_dev}")
        return fn(mesh_lib.shard_batch(videos, mesh))

    return run


def _build_cached_video_runner(model, variables, cfg, camera_K, raw_hw):
    """Feature-cache fast path (docs/PERF.md): frame t reuses frame t-1's
    current-pass trunk features as its previous-pass features, so the trunk
    runs ONCE per frame instead of twice — ~2x model FLOPs saved.

    Documented deviation from the reference/exact path: the cached features
    were conditioned on repro_hm_{t-1} (the PnP prior at t-1) instead of
    pre_hm_t (the detection-rendered prior at t). Frame 0 is EXACT (both
    passes see zero priors there). Checkpoints trained on the exact path may
    need fine-tuning to recover full accuracy on this path.

    `model` is the SGTAPose module (needs .trunk/.fuse methods).
    """
    from sgtapose_tpu.models.sgta import SGTAPose

    H_raw, W_raw = raw_hw
    in_h, in_w = cfg.model.input_res
    out_h, out_w = cfg.model.output_res
    K_cam = jnp.asarray(camera_K, jnp.float32)
    n_kp = cfg.model.num_classes

    c = jnp.array([W_raw / 2.0, H_raw / 2.0], jnp.float32)
    s = jnp.float32(max(H_raw, W_raw))
    trans_input = geometry.get_affine_transform(c, s, 0.0, (in_w, in_h))
    trans_output = geometry.get_affine_transform(c, s, 0.0, (out_w, out_h))
    trans_output_inv = geometry.invert_affine(trans_output)

    channels = (16, 32, 64, 128, 256, 512)
    # carry dtype follows the params (bf16 inference keeps the cache small)
    feat_dt = jax.tree_util.tree_leaves(variables["params"])[0].dtype

    def trunk(img_b, hm_b):
        return model.apply(
            variables, img_b.astype(feat_dt), hm_b.astype(feat_dt),
            method=SGTAPose.trunk,
        )

    def fuse(pre_feats, cur_feats, pre_cls_b, repro_cls_b):
        out = model.apply(
            variables, pre_feats, cur_feats,
            pre_cls_b.astype(feat_dt), repro_cls_b.astype(feat_dt),
            method=SGTAPose.fuse,
        )
        return {k: v.astype(jnp.float32) for k, v in out.items()}

    def frame_step(carry, inp):
        pre_feats, detected_kps, frame_idx, pq, pt, pok = carry
        cur_img, prev_x3d, next_x3d = inp
        first = frame_idx == 0

        valid = jnp.all(detected_kps > KP_SENTINEL, axis=1)
        warm = (pq, pt, pok) if cfg.infer.pnp_warm_start else None
        ok, repro, pose = pnp.pnp_reprojection_prior(
            prev_x3d, detected_kps, next_x3d, K_cam, valid, init=warm
        )
        repro = jnp.where(ok, repro, detected_kps)
        any_valid = jnp.any(valid)
        pre_hm, repro_hm, pre_cls, repro_cls = _render_priors(
            detected_kps, repro, any_valid, trans_input, trans_output,
            cfg, (W_raw, H_raw),
        )
        del pre_hm  # the cached features replace the pre pass entirely

        cur_feats = trunk(cur_img[None], repro_hm[None])
        # frame 0: previous-pass features := this frame's features (exact —
        # both passes would see zero priors on frame 0)
        pre_feats = [
            jnp.where(first, c_f, p_f) for c_f, p_f in zip(cur_feats, pre_feats)
        ]
        out = fuse(pre_feats, cur_feats, pre_cls[None], repro_cls[None])

        hm = jnp.clip(jax.nn.sigmoid(out["hm"][0]), 1e-4, 1 - 1e-4)
        dec = decode_lib.decode_heatmaps(
            hm,
            out["reg"][0],
            out["tracking"][0],
            max_peaks=cfg.infer.max_peaks,
            peak_thresh=cfg.infer.peak_thresh,
            ambiguity_gap=cfg.infer.ambiguity_gap,
            peak_offset=cfg.infer.peak_offset,
            sigma=cfg.infer.peak_sigma,
            ref_sort=cfg.infer.ref_sort,
            coord_mode=cfg.infer.decode_coord,
        )
        raw_kps = geometry.affine_points(dec.coords, trans_output_inv)
        keep = dec.valid & (dec.scores > cfg.infer.out_thresh)
        detected = jnp.where(keep[:, None], raw_kps, KP_SENTINEL)
        scores = jnp.where(keep, dec.scores, -1.0)
        trk_raw = dec.tracking @ trans_output_inv[:, :2].T

        new_carry = (
            list(cur_feats), detected, frame_idx + 1,
            pose.quat, pose.trans, pose.success,
        )
        return new_carry, FrameResult(
            detected_kps=detected, scores=scores, tracking=trk_raw
        )

    def run_video(video: VideoFrames) -> FrameResult:
        assert video.teacher_kps is None, (
            "teacher forcing is only implemented on the exact-path detector "
            "(make_video_detector); the feature-cache runner would silently "
            "run closed-loop"
        )
        prev_x3d = jnp.concatenate([video.x3d[:1], video.x3d[:-1]], axis=0)
        init_kps = (
            video.init_kps
            if video.init_kps is not None
            else jnp.full((n_kp, 2), KP_SENTINEL, jnp.float32)
        )
        init_feats = [
            jnp.zeros((1, in_h // (2 ** i), in_w // (2 ** i), channels[i]),
                      feat_dt)
            for i in range(6)
        ]
        init = (
            init_feats, init_kps, jnp.int32(0),
            jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
            jnp.zeros(3, jnp.float32), jnp.bool_(False),
        )
        _, results = jax.lax.scan(
            frame_step, init, (video.images, prev_x3d, video.x3d)
        )
        return results

    return run_video


def make_cached_video_detector(model, variables, cfg, camera_K, raw_hw,
                               quant=None, quant_scales=None,
                               quant_min_ch=0):
    """Jitted feature-cache detector (one trunk pass per frame; see
    _build_cached_video_runner for semantics). quant="int8" additionally runs
    the quantizable convs as s8xs8->s32 (models/layers.py); quant_scales /
    quant_min_ch select calibrated static activation scales and the
    channel-threshold gate."""
    fn = _build_cached_video_runner(model, variables, cfg, camera_K, raw_hw)
    if quant is not None:
        from sgtapose_tpu.models.layers import quantized_apply

        fn = quantized_apply(fn, quant, scales=quant_scales,
                             min_ch=quant_min_ch)
    return jax.jit(fn)
