"""Inference + evaluation entry point.

Rebuild of ref sgtapose/inference.py (:60-294 inference / inference_real) +
scripts/inference_scripts.sh:
  python -m sgtapose_tpu.cli.infer --dataset DIR --ckpt CKPT_DIR \
      [--is_real panda-orb --split_info dream_real_info/...json] \
      --output_dir OUT [--rf]

Synthetic mode walks per-video directories (NNNN_color.png + NNNN_meta.json);
real mode reads DREAM-real video splits. Per video the scan detector runs all
frames in one device program, then the analysis harness produces
PCK / ADD-AUC metrics + CSV artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from sgtapose_tpu.config import KEYPOINT_NAMES, SYNTHETIC_CAMERA_K, Config, ModelConfig
from sgtapose_tpu.data import loaders
from sgtapose_tpu.eval.analysis import analyze_sequence_results
from sgtapose_tpu.infer import detector as det_lib
from sgtapose_tpu.models.sgta import create_model
from sgtapose_tpu.train import trainer


def _make_apply(model, args, cfg=None, variables=None):
    """Inference apply wrapper shared by all run_* entries.

    --quant int8 runs the quantizable convs as s8xs8->s32 on the MXU
    (models/layers.py — a serving mode beyond reference parity).
    --quant_static additionally calibrates static activation scales on
    synthetic frames shaped by cfg (the fast serving form; needs variables);
    --quant_min_ch gates quantization to MXU-bound sites."""

    def apply(variables, *inputs):
        return model.apply(variables, *inputs, train=False)

    if getattr(args, "quant", None) is not None:
        from sgtapose_tpu.models.layers import calibrate, quantized_apply

        scales = None
        if getattr(args, "quant_static", False):
            if cfg is None or variables is None:
                raise ValueError("--quant_static needs cfg and variables")
            from sgtapose_tpu.eval.synthetic_eval import calibration_inputs

            scales = calibrate(
                lambda *a: apply(variables, *a), calibration_inputs(cfg)
            )
            print(f"int8: calibrated {len(scales)} static activation scales")
        apply = quantized_apply(
            apply, args.quant, scales=scales,
            min_ch=getattr(args, "quant_min_ch", 0),
        )
    return apply


def parse_args(argv=None):
    p = argparse.ArgumentParser("sgtapose_tpu infer")
    p.add_argument("--dataset", required=True)
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--output_dir", default="results/default")
    p.add_argument("--robot", default="panda_synthetic")
    p.add_argument("--object_name", default=None)
    p.add_argument("--is_real", default=None, help="real set name (e.g. panda-orb)")
    p.add_argument("--split_info", default=None, help="real split json path")
    p.add_argument("--arch", default="dlapawdl3new_34")
    p.add_argument("--input_res", type=int, default=480)
    p.add_argument("--dla_node", default="dcn", choices=["dcn", "conv"])
    p.add_argument("--kernel_list", default="12,6,3,1,1,1",
                   help="per-level attention window sizes (ref ks1..ks6)")
    p.add_argument("--rf", action="store_true", help="LM pose refinement")
    p.add_argument("--multi_frame", type=int, default=0,
                   help="sliding-window multiframe PnP size (0 = off)")
    p.add_argument("--max_videos", type=int, default=None)
    p.add_argument("--ref_sort", default="score", choices=["score", "y"],
                   help="peak ambiguity ordering; 'y' reproduces the "
                        "reference's exact behavior for parity evals")
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="quantized serving mode: quantizable convs execute "
                        "as s8xs8->s32 on the MXU (models/layers.py; "
                        "accuracy/fps measured in docs/PERF.md)")
    p.add_argument("--quant_static", action="store_true",
                   help="calibrate static activation scales on synthetic "
                        "frames before serving (faster than the default "
                        "dynamic per-tensor scales; docs/PERF.md)")
    p.add_argument("--quant_min_ch", type=int, default=0,
                   help="quantize only convs with min(in_ch,out_ch) >= N "
                        "(skip bandwidth-bound small-channel sites)")
    p.add_argument("--decode_coord", default="reg",
                   choices=["reg", "avg", "logquad", "mean"],
                   help="final sub-pixel coordinate estimator (see "
                        "decode/peaks.py; reg = reference parity)")
    p.add_argument("--phase", default=None,
                   help="inference phase/arch family (default: PlanA_win, or "
                        "Dream when --is_ct false); see train/phases.py")
    p.add_argument("--flip_test", action="store_true",
                   help="horizontal-flip TTA (DREAM single-frame mode only: "
                        "flip-average belief maps, ref _flip_output "
                        "average_flips rule; the reference's own flag is "
                        "broken on the temporal detector — see PARITY.md)")
    p.add_argument("--is_ct", default="true", choices=["true", "false"],
                   help="false = DREAM-baseline single-frame mode "
                        "(ref sgta_detector.py:50-52, model.py:31-41)")
    p.add_argument("--depth", action="store_true",
                   help="42-joint depth-variant evaluation "
                        "(ref inference.py:407-522 inference_real_depth)")
    p.add_argument("--track", action="store_true",
                   help="run the host-side tracker association pass per video "
                        "and write tracks.json (ref sgta_detector.py:198-202)")
    p.add_argument("--debug", type=int, default=0,
                   help="save per-frame debug images (pred-hm/prior-hm "
                        "blends + detection overlay with tracking arrows) "
                        "to output_dir/debug — ref sgta_detector.py debug "
                        "path via utils/debugger.py")
    p.add_argument("--hungarian", action="store_true",
                   help="Hungarian instead of greedy association (--track)")
    p.add_argument("--track_gate", type=float, default=0.2,
                   help="association distance gate in raw px (--track). The "
                        "reference hardcodes 0.2 (tracker.py:38-46, squared "
                        "0.04 gate on squared distances), which is below "
                        "real detection jitter and fragments tracks; raise "
                        "to ~2-5 px for usable ids")
    return p.parse_args(argv)


class DetOut:
    """Per-video detector output: detections + what the tracker pass needs."""

    def __init__(self, det, scores=None, tracking=None,
                 debug_hm=None, debug_pre_hm=None):
        self.det = det  # (T, K, 2) raw coords / sentinel
        self.scores = scores  # (T, K) or None
        self.tracking = tracking  # (T, K, 2) raw-unit displacement or None
        self.debug_hm = debug_hm  # (T, Ho, Wo, K) post-sigmoid, --debug only
        self.debug_pre_hm = debug_pre_hm  # (T, H_in, W_in, 1), --debug only


def _make_runner(args, apply, variables, cfg: Config, camera_K, raw_hw):
    """Per-video detection runner: the temporal scan detector (is_ct) or the
    DREAM single-frame detector (--is_ct false, ref sgta_detector.py:50-52).
    Returns fn(raw uint8 imgs (T,H,W,3), x3d (T,K,3)) -> DetOut with raw-pixel
    detections (blocking)."""
    if args.is_ct == "false":
        from sgtapose_tpu.infer.dream_detector import make_dream_detector

        dream_run = make_dream_detector(
            apply, variables, cfg, (raw_hw[1], raw_hw[0]),
            flip_test=getattr(args, "flip_test", False),
        )

        def run(imgs_np, x3d):
            kps, scores = dream_run(imgs_np)
            return DetOut(kps, scores)  # no tracking head in DREAM mode

        return run

    debug = getattr(args, "debug", 0) > 0
    scan = det_lib.make_video_detector(
        apply, variables, cfg, camera_K, raw_hw, phase=args.phase,
        debug_outputs=debug,
    )

    def run(imgs_np, x3d):
        images, _, _ = det_lib.preprocess_frames(jnp.asarray(imgs_np), cfg)
        video = det_lib.VideoFrames(
            images=images, x3d=jnp.asarray(x3d, jnp.float32)
        )
        res = scan(video)
        jax.block_until_ready(res.detected_kps)
        return DetOut(
            np.asarray(res.detected_kps),
            np.asarray(res.scores),
            np.asarray(res.tracking),
            debug_hm=np.asarray(res.debug_hm) if debug else None,
            debug_pre_hm=np.asarray(res.debug_pre_hm) if debug else None,
        )

    return run


def _track_pass(out: DetOut, args) -> "np.ndarray | None":
    """Host-side association over one video's detections when --track is on
    (ref sgta_detector.py:198-202 tracker.step inside the frame loop)."""
    if not args.track or out.scores is None:
        return None
    from sgtapose_tpu.infer.tracker import track_video

    return track_video(
        out.det, out.scores, out.tracking, gate=args.track_gate,
        hungarian=args.hungarian,
    )


class _VideoLoop:
    """Per-video orchestration shared by the synthetic and real drivers:
    per-raw-resolution runner cache (a mixed-resolution set rebuilds the
    warp/runner per resolution the way the reference re-instantiates its
    detector per video), per-frame resolution bookkeeping for the metrics,
    inference timing, the --track association pass, and --debug artifact
    dumps."""

    def __init__(self, args, apply, variables, cfg, camera_K, timer=None):
        self.args, self.apply, self.variables = args, apply, variables
        self.cfg, self.camera_K, self.timer = cfg, camera_K, timer
        self.runners = {}
        self.tracks = {}
        self.frame_res = []  # per-frame (w, h) so the metrics bucket correctly
        self.t_total, self.n_frames = 0.0, 0

    def run(self, vname, imgs_np, prior_pos, frame_names) -> DetOut:
        raw_hw = (imgs_np.shape[1], imgs_np.shape[2])
        if raw_hw not in self.runners:
            if self.runners:
                print(f"{vname}: new resolution {raw_hw}; building runner")
            self.runners[raw_hw] = _make_runner(
                self.args, self.apply, self.variables, self.cfg,
                self.camera_K, raw_hw,
            )
        self.frame_res += [(imgs_np.shape[2], imgs_np.shape[1])] * imgs_np.shape[0]
        t0 = time.perf_counter()
        if self.timer is not None:
            with self.timer.stage("detect"):
                out_v = self.runners[raw_hw](imgs_np, prior_pos)
        else:
            out_v = self.runners[raw_hw](imgs_np, prior_pos)
        self.t_total += time.perf_counter() - t0
        self.n_frames += imgs_np.shape[0]
        ids = _track_pass(out_v, self.args)
        if ids is not None:
            self.tracks[vname] = ids.tolist()
        if self.args.debug:
            _write_debug_images(self.args, out_v, imgs_np, vname,
                                frame_names, ids=ids)
        return out_v

    def res_arg(self):
        """(w, h) when uniform, else per-frame (F, 2) for mixed-res sets."""
        return (self.frame_res[0] if len(set(self.frame_res)) == 1
                else np.array(self.frame_res))

    def report(self):
        print(f"inference: {self.n_frames} frames in {self.t_total:.2f}s "
              f"({self.n_frames / max(self.t_total, 1e-9):.1f} fps)")

    def dump_tracks(self, path):
        if self.tracks:
            with open(path, "w") as f:
                json.dump(self.tracks, f)
            print(f"tracks written for {len(self.tracks)} videos")


def _write_debug_images(args, out: DetOut, imgs_np, vname, frame_names,
                        ids=None):
    """Per-frame debug artifacts when --debug > 0 (ref sgta_detector.py:
    960-1032 debug path): 'generic' raw frame + detections + tracking arrows
    (+ track ids under --track), 'pred_hm' blend of the class-colored center
    heatmaps, 'pre_hm' blend of the rendered temporal prior. The heatmap
    blends are drawn over the WARPED network-input image (as the reference
    does) — the heatmaps live in the centered-square warp frame, so resizing
    them onto the raw rectangle would misplace every blob on non-square
    videos."""
    from sgtapose_tpu.core import geometry
    from sgtapose_tpu.utils.debugger import Debugger

    dbg_dir = os.path.join(args.output_dir, "debug")
    K = out.det.shape[1]
    dbg = Debugger(num_classes=K)
    need_warp = out.debug_hm is not None or out.debug_pre_hm is not None
    if need_warp:
        H_raw, W_raw = imgs_np.shape[1], imgs_np.shape[2]
        in_res = int(args.input_res)
        trans_in = geometry.get_affine_transform(
            jnp.array([W_raw / 2.0, H_raw / 2.0], jnp.float32),
            float(max(H_raw, W_raw)), 0.0, (in_res, in_res),
        )
    for t, fname in enumerate(frame_names):
        dbg.clear()
        img = imgs_np[t]
        dbg.add_img(img, "generic")
        kps = out.det[t]
        dbg.add_keypoints(
            kps, "generic",
            scores=out.scores[t] if out.scores is not None else None,
        )
        if out.tracking is not None:
            for k in range(K):
                if kps[k, 0] > -999.0:
                    dbg.add_arrow(kps[k], out.tracking[t, k], "generic")
        if ids is not None:
            for k in range(K):
                if kps[k, 0] > -999.0:
                    dbg.add_tracking_id(kps[k], int(ids[t][k]), "generic")
        if need_warp:
            warped = np.asarray(geometry.warp_affine(
                jnp.asarray(img, jnp.float32), trans_in, (in_res, in_res)
            ))
            in_wh = (in_res, in_res)
            if out.debug_hm is not None:
                dbg.add_blend_img(
                    warped,
                    dbg.gen_colormap(out.debug_hm[t], output_res=in_wh),
                    "pred_hm",
                )
            if out.debug_pre_hm is not None:
                dbg.add_blend_img(
                    warped,
                    dbg.gen_colormap(out.debug_pre_hm[t], output_res=in_wh),
                    "pre_hm",
                )
        dbg.save_all_imgs(dbg_dir, prefix=f"{vname}_{fname}_")


def list_synthetic_videos(dataset_dir: str) -> Dict[str, List[str]]:
    """video name -> ordered frame basenames (without suffix)."""
    videos = {}
    for vd in sorted(os.listdir(dataset_dir)):
        full = os.path.join(dataset_dir, vd)
        if not os.path.isdir(full):
            continue
        frames = sorted(
            f[:-len("_color.png")] for f in os.listdir(full) if f.endswith("_color.png")
        )
        if len(frames) >= 2:
            videos[vd] = frames
    return videos


def run_synthetic(args, cfg: Config, model, variables):
    from sgtapose_tpu.utils.profiling import StageTimer

    camera_K = np.asarray(SYNTHETIC_CAMERA_K)
    kp_names = KEYPOINT_NAMES[args.robot]
    object_name = args.object_name or args.robot
    videos = list_synthetic_videos(args.dataset)
    names = list(videos)[: args.max_videos] if args.max_videos else list(videos)

    apply = _make_apply(model, args, cfg, variables)

    all_det, all_gt, all_pos, sample_names = [], [], [], []
    timer = StageTimer()  # per-stage buckets (ref sgta_detector.py:117-222)
    loop = _VideoLoop(args, apply, variables, cfg, camera_K, timer=timer)
    for vname in names:
        frames = videos[vname]
        imgs, projs, pos_cam, x3d_rob = [], [], [], []
        with timer.stage("load"):
            for f in frames:
                img = loaders.load_image(os.path.join(args.dataset, vname, f + "_color.png"))
                kp = loaders.load_seq_keypoints(
                    os.path.join(args.dataset, vname, f + "_meta.json"),
                    object_name, kp_names, camera_K,
                )
                imgs.append(img)
                projs.append(kp["projections"])
                pos_cam.append(kp["positions_wrt_cam"])
                x3d_rob.append(kp["positions_wrt_robot"])
        imgs_np = np.stack(imgs)
        out_v = loop.run(vname, imgs_np, np.stack(x3d_rob), frames)

        all_det.append(out_v.det)
        all_gt.append(np.stack(projs))
        all_pos.append(np.stack(pos_cam))
        sample_names += [f"{vname}/{f}" for f in frames]
        print(f"{vname}: {len(frames)} frames")
    print("stage times (s/video):",
          {k: round(v, 3) for k, v in timer.summary().items()})

    det = np.concatenate(all_det)
    gt = np.concatenate(all_gt)
    pos = np.concatenate(all_pos)
    loop.report()
    res_arg = loop.res_arg()
    results = analyze_sequence_results(
        det, gt.astype(np.float32), pos.astype(np.float32), camera_K,
        res_arg, args.output_dir, set_name="syn",
        sample_names=sample_names, rf=args.rf, syn=True,
    )
    # dt_and_json equivalent (ref inference.py:243-262)
    os.makedirs(args.output_dir, exist_ok=True)
    loop.dump_tracks(os.path.join(args.output_dir, "tracks.json"))
    with open(os.path.join(args.output_dir, "dt_and_gt.json"), "w") as f:
        json.dump(
            {
                "names": sample_names,
                "detections": det.tolist(),
                "gt_projections": gt.tolist(),
            },
            f,
        )
    results["_multiframe_inputs"] = dict(
        det=det, gt=gt.astype(np.float32), pos=pos.astype(np.float32),
        camera_K=camera_K, image_resolution=res_arg,
        video_lengths=[a.shape[0] for a in all_det], set_name="syn",
    )
    return results


def run_real(args, cfg: Config, model, variables):
    """DREAM-real sets (ref inference.py:186-294 inference_real): the split
    info json provides per-video lists of relative img/json paths; intrinsics
    come from the set's _camera_settings.json; GT 3D keypoint positions are
    camera-frame (`load_keypoints`), which serve both the temporal prior PnP
    and the ADD evaluation."""
    set_dir = os.path.join(args.dataset, args.is_real)
    camera_K = loaders.load_camera_intrinsics(
        os.path.join(set_dir, "_camera_settings.json")
    )
    split_path = args.split_info or os.path.join(
        args.dataset, "dream_real_info", f"{args.is_real}_split_info.json"
    )
    with open(split_path) as f:
        split = json.load(f)
    video_jsons = split["json_paths"]
    video_imgs = split["img_paths"]
    kp_names = KEYPOINT_NAMES["panda"]

    apply = _make_apply(model, args, cfg, variables)

    all_det, all_gt, all_pos, sample_names, json_list = [], [], [], [], []
    loop = _VideoLoop(args, apply, variables, cfg, camera_K)
    videos = list(zip(video_imgs, video_jsons))
    if args.max_videos:
        videos = videos[: args.max_videos]
    for vi, (imgs_rel, jsons_rel) in enumerate(videos):
        imgs, projs, pos_cam = [], [], []
        for img_rel, js_rel in zip(imgs_rel, jsons_rel):
            img_path = os.path.join(set_dir, img_rel)
            js_path = os.path.join(set_dir, js_rel)
            imgs.append(loaders.load_image(img_path))
            kp = loaders.load_keypoints(js_path, "panda", kp_names)
            projs.append(kp["projections"])
            pos_cam.append(kp["positions_wrt_cam"])
            json_list.append(js_path)
            sample_names.append(f"{vi:03d}/{os.path.basename(js_rel)}")
        imgs_np = np.stack(imgs)
        out_v = loop.run(
            f"{vi:03d}", imgs_np, np.stack(pos_cam),
            [os.path.splitext(os.path.basename(r))[0] for r in imgs_rel],
        )
        all_det.append(out_v.det)
        all_gt.append(np.stack(projs))
        all_pos.append(np.stack(pos_cam))
        print(f"video {vi}: {imgs_np.shape[0]} frames")

    det = np.concatenate(all_det)
    gt = np.concatenate(all_gt)
    pos = np.concatenate(all_pos)
    loop.report()

    os.makedirs(args.output_dir, exist_ok=True)
    loop.dump_tracks(os.path.join(args.output_dir, f"tracks_{args.is_real}.json"))
    with open(
        os.path.join(args.output_dir, f"dt_and_json_{args.is_real}.json"), "w"
    ) as f:
        json.dump({"dt": det.tolist(), "json": json_list}, f, indent=1)

    res_arg = loop.res_arg()
    results = analyze_sequence_results(
        det, gt.astype(np.float32), pos.astype(np.float32), camera_K,
        res_arg, args.output_dir, set_name=args.is_real,
        sample_names=sample_names, rf=args.rf, syn=False,
    )
    results["_multiframe_inputs"] = dict(
        det=det, gt=gt.astype(np.float32), pos=pos.astype(np.float32),
        camera_K=camera_K, image_resolution=res_arg,
        video_lengths=[a.shape[0] for a in all_det], set_name=args.is_real,
    )
    return results


def run_depth(args, cfg: Config, model, variables):
    """42-joint depth-variant evaluation (ref inference.py:407-522
    inference_real_depth): one flat directory of NNNN.png + NNNN.json frames,
    keypoints loaded via the joints_3n_fixed_42 format, detection as usual,
    then the same metric harness with 42 classes (ref
    analyze_ndds_center_dream_ours_42_dataset, analysis.py:1073-1548)."""
    import glob
    import warnings

    if getattr(args, "debug", 0) or getattr(args, "track", False):
        warnings.warn(
            "--debug/--track are not supported in --depth mode (the "
            "reference depth path has neither, ref inference.py:407-522); "
            "ignoring"
        )

    set_dir = (
        os.path.join(args.dataset, args.is_real) if args.is_real else args.dataset
    )
    pngs = sorted(glob.glob(os.path.join(set_dir, "*.png")))
    jsons = [p[: -len("png")] + "json" for p in pngs]
    camera_K = np.asarray(SYNTHETIC_CAMERA_K)
    object_name = args.object_name or "Franka_Emika_Panda"

    apply = _make_apply(model, args, cfg, variables)

    imgs, projs, pos_cam = [], [], []
    for img_path, js_path in zip(pngs, jsons):
        imgs.append(loaders.load_image(img_path))
        kp = loaders.load_depth_keypoints(js_path, object_name, camera_K)
        projs.append(kp["projections"])
        pos_cam.append(kp["positions_wrt_cam"])
    imgs_np = np.stack(imgs)
    raw_hw = (imgs_np.shape[1], imgs_np.shape[2])
    run = _make_runner(args, apply, variables, cfg, camera_K, raw_hw)
    t0 = time.perf_counter()
    det = run(imgs_np, np.stack(pos_cam).astype(np.float32)).det
    t_total = time.perf_counter() - t0
    print(f"depth inference: {len(pngs)} frames in {t_total:.2f}s")

    set_name = (args.is_real or "depth") + "_42"
    sample_names = [os.path.basename(p) for p in pngs]
    os.makedirs(args.output_dir, exist_ok=True)
    np_gt = np.stack(projs).astype(np.float32)
    np_pos = np.stack(pos_cam).astype(np.float32)
    with open(os.path.join(args.output_dir, f"dt_and_json_{set_name}.json"), "w") as f:
        json.dump({"dt": det.tolist(), "json": jsons}, f, indent=1)
    results = analyze_sequence_results(
        det, np_gt, np_pos, camera_K, (raw_hw[1], raw_hw[0]),
        args.output_dir, set_name=set_name, sample_names=sample_names,
        rf=args.rf, syn=False,
    )
    results["_multiframe_inputs"] = dict(
        det=det, gt=np_gt, pos=np_pos, camera_K=camera_K,
        image_resolution=(raw_hw[1], raw_hw[0]),
        video_lengths=[len(pngs)], set_name=set_name,
    )
    return results


def main(argv=None):
    from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = parse_args(argv)
    num_classes = 42 if args.depth else len(KEYPOINT_NAMES[args.robot])
    from sgtapose_tpu.config import InferConfig

    cfg = Config(
        model=ModelConfig(
            arch=args.arch,
            input_res=(args.input_res, args.input_res),
            num_classes=num_classes,
            dla_node=args.dla_node,
            kernel_list=tuple(int(x) for x in args.kernel_list.split(",")),
        ),
        infer=InferConfig(ref_sort=args.ref_sort, decode_coord=args.decode_coord),
        robot=args.robot,
    )
    if args.phase is None:
        args.phase = "Dream" if args.is_ct == "false" else "PlanA_win"
    if args.flip_test and args.is_ct != "false":
        raise SystemExit(
            "--flip_test is only defined for the DREAM single-frame mode "
            "(--is_ct false). On the temporal detector the reference's own "
            "flag is broken (pre_process never doubles the image batch, so "
            "_flip_output averages an empty [1:2] slice — "
            "ref sgta_detector.py:448,864-877; proven in "
            "tests/test_parity_detector.py); flip-TTA is also ill-posed "
            "there because the PnP prior and attention cls maps are not "
            "mirror-equivariant."
        )
    if args.phase.startswith("ablation_"):
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, ablation_mode=args.phase[len("ablation_"):]
            ),
        )
    model = create_model(cfg.model)
    state = trainer.create_train_state_for_phase(
        cfg, jax.random.PRNGKey(0), args.phase, max_iters=1
    )
    if args.ckpt:
        state = trainer.load_checkpoint(os.path.abspath(args.ckpt), state)
        print(f"loaded {args.ckpt}")
    else:
        import warnings

        warnings.warn(
            "no --ckpt given: running with RANDOM weights — detections will "
            "be empty/garbage. This mode only exercises the pipeline "
            "(tests/smoke); pass --ckpt for real inference.",
            stacklevel=1,
        )
        print("WARNING: no --ckpt — random-weight model, smoke mode only")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.depth:
        results = run_depth(args, cfg, model, variables)
    elif args.is_real:
        results = run_real(args, cfg, model, variables)
    else:
        results = run_synthetic(args, cfg, model, variables)

    if args.multi_frame > 0:
        # Multiframe PnP (ref analysis.py:95-599): both estimators — the
        # sliding-window per-video one (solve_multiframe_pnp) and the
        # random-combination one (solve_multiframe_pnp_real).
        from sgtapose_tpu.eval.analysis import (
            solve_multiframe_pnp,
            solve_multiframe_pnp_real,
        )

        mi = results.pop("_multiframe_inputs")
        mf = solve_multiframe_pnp(
            mi["det"], mi["gt"], mi["pos"], mi["camera_K"],
            mi["image_resolution"], multiframe=args.multi_frame,
            video_lengths=mi["video_lengths"], rf=args.rf,
            output_dir=args.output_dir, set_name=mi["set_name"],
        )
        mf_real = solve_multiframe_pnp_real(
            mi["det"], mi["pos"], mi["camera_K"],
            multiframe=args.multi_frame, rf=args.rf,
            output_dir=args.output_dir, set_name=mi["set_name"],
        )
        results["multiframe_pnp_metrics"] = mf
        results["multiframe_pnp_real_metrics"] = mf_real
        print(f"multiframe({args.multi_frame}) ADD AUC@0.06m: "
              f"sliding={mf['add_auc']:.5f} random={mf_real['add_auc']:.5f}")
    else:
        results.pop("_multiframe_inputs", None)
    km, pm = results["keypoint_metrics"], results["pnp_metrics"]
    print(f"PCK AUC@12px: {km['l2_error_auc']}")
    print(f"ADD AUC@0.06m: {pm['add_auc']}")
    return results


if __name__ == "__main__":
    main()
