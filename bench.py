"""Benchmark: sequential 480p inference throughput on one chip.

North-star metric (BASELINE.json): frames/sec/chip at 480p sequential
inference — the reference's per-frame path is pre_process -> model forward ->
CPU peak finding -> PnP prior for the next frame, all at batch 1
(ref lib/sgta_detector.py:117-236). Ours runs the ENTIRE sequential recurrence
(PnP prior -> prior rendering -> Siamese forward -> on-device peak decode ->
inverse affine -> per-class selection) as one `lax.scan` on device.

Output contract (round-4 restructure — BENCH_r03 was rc=124 because all
extras compiled BEFORE anything printed): the primary metric is measured
FIRST and the single stdout JSON line is printed + flushed the moment it
exists. Extras (fast path; with --full also batched/fused/int8) run AFTER
under an explicit wall-clock budget (BENCH_BUDGET_S, default 540 s measured
from process start) and are reported on stderr only — stdout always carries
exactly one JSON line, even if an extra is skipped or the process is killed
mid-extra.

Measurement notes: on this TPU tunnel, `block_until_ready` does not actually
block, so timing must force a host fetch (np.asarray) — the scan over T
frames runs in ONE device call and is fetched ONCE, which also amortizes the
~30 ms tunnel round-trip exactly like a production streaming deployment
would (device-resident recurrence, periodic result readback).

`vs_baseline` is measured fps / the REFERENCE implementation's measured fps
in this environment: 0.306 fps at 480p via the full SGTADetector.run per-frame
path (scripts/bench_reference.py, torch CPU — this container exposes one CPU
core and no CUDA; BASELINE.md records the protocol and caveats). The camera
rate (30 fps) is also reported for context.
"""

import argparse
import json
import os
import sys
import time

_T_START = time.perf_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="primary metric only (skip all extras)")
    ap.add_argument("--full", action="store_true",
                    help="also measure batched-8-videos, fused-attention and "
                         "int8 (heavy compiles; full matrix recorded in "
                         "docs/PERF.md)")
    args = ap.parse_args()

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "540"))

    def remaining():
        return budget_s - (time.perf_counter() - _T_START)

    # The axon tunnel can be DOWN for hours, and jax.devices() then hangs
    # indefinitely inside backend init — probe it in a bounded subprocess so
    # a broken tunnel fails this bench fast and loudly instead of stalling
    # the harness (observed 2026-08-17: >3 h outage).
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=180, capture_output=True,
        )
        probe_ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        probe_ok = False
    if not probe_ok:
        print(
            "bench.py: no usable JAX backend (device init failed or timed "
            "out — TPU tunnel down?); refusing to emit a bogus number.",
            file=sys.stderr,
        )
        # surface the real failure (may be an install problem, not the tunnel)
        try:
            err = probe.stderr.decode(errors="replace").strip()
            if err:
                print("--- probe stderr ---\n" + err[-2000:], file=sys.stderr)
        except NameError:  # TimeoutExpired path: no probe object
            pass
        sys.exit(1)

    import jax

    # persistent XLA compile cache + JAX_PLATFORMS honoring (shared helper —
    # utils/cache.py): the heavy detector-scan compile is paid once per
    # container; later runs — e.g. the driver's end-of-round capture after an
    # in-round run — start warm and emit the primary metric in ~1 min
    # instead of ~12.
    from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from sgtapose_tpu.config import Config
    from sgtapose_tpu.data import synthetic
    from sgtapose_tpu.infer import detector as det_lib
    from sgtapose_tpu.models.sgta import create_model
    from sgtapose_tpu.eval.synthetic_eval import make_bf16_apply
    from sgtapose_tpu.utils.precision import bf16_inference_variables

    cfg = Config()
    model = create_model(cfg.model)
    H, W = cfg.model.input_res
    Ho, Wo = cfg.model.output_res
    C = cfg.model.num_classes

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, H, W, 1)), jnp.zeros((1, H, W, 1)),
        jnp.zeros((1, Ho, Wo, C)), jnp.zeros((1, Ho, Wo, C)),
        train=False,
    )
    variables = bf16_inference_variables(variables)

    apply = make_bf16_apply(model)

    T = 32
    projs, imgs = synthetic.make_sequence(jax.random.PRNGKey(1), 2)
    # synthetic raws are 360x640; tile 2 frames into a T-frame video
    video_imgs = jnp.concatenate([imgs] * (T // 2), axis=0)
    x3d = jnp.tile(synthetic.SKELETON[None], (T, 1, 1))

    images, _, _ = det_lib.preprocess_frames(video_imgs, cfg)
    video = det_lib.VideoFrames(images=images, x3d=x3d)

    def timed_fps(runner, inp, frames, reps=3):
        res = runner(inp)  # compile + warm
        _ = np.asarray(res.detected_kps)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = runner(inp)
            _ = np.asarray(res.detected_kps)  # true sync (block_until_ready
            #                                   lies through the tunnel)
        return frames / ((time.perf_counter() - t0) / reps)

    # ---- PRIMARY METRIC: measure, print, flush — before anything else ----
    run = det_lib.make_video_detector(
        apply, variables, cfg, synthetic.camera_K(),
        raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
    )
    fps = timed_fps(run, video, T)

    REFERENCE_CPU_FPS = 0.306  # scripts/bench_reference.py, this container
    print(
        json.dumps(
            {
                "metric": "fps_480p_seq_inference_single_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / REFERENCE_CPU_FPS, 3),
                "vs_camera_rate_30fps": round(fps / 30.0, 3),
            }
        ),
        flush=True,
    )
    if args.quick:
        return

    # ---- EXTRAS: stderr only, each gated on the remaining budget ----------
    import dataclasses

    extras = {}

    def budget_ok(name, need_s):
        if remaining() < need_s:
            print(
                f"bench.py: skipping extra '{name}' — {remaining():.0f}s "
                f"left of {budget_s:.0f}s budget (needs ~{need_s:.0f}s); "
                "run with a larger BENCH_BUDGET_S to include it.",
                file=sys.stderr,
            )
            return False
        return True

    # feature-cache + warm-start-PnP fast paths combined
    # (infer/detector.py; docs/PERF.md documents both deviations)
    if budget_ok("fps_fast_path", 150):
        try:
            fast_cfg = dataclasses.replace(
                cfg, infer=dataclasses.replace(cfg.infer, pnp_warm_start=True)
            )
            cached = det_lib.make_cached_video_detector(
                model, variables, fast_cfg, synthetic.camera_K(),
                raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
            )
            extras["fps_fast_path"] = round(
                timed_fps(cached, video, T, reps=2), 2)
        except Exception as e:
            extras["fps_fast_path"] = None
            print(f"fast-path bench failed: {e}", file=sys.stderr)

    if args.full:
        # batched multi-video (production fill; videos are independent)
        if budget_ok("fps_batched_8videos_aggregate", 200):
            try:
                NV = 8
                batched_video = det_lib.VideoFrames(
                    images=jnp.broadcast_to(
                        video.images, (NV,) + video.images.shape),
                    x3d=jnp.broadcast_to(video.x3d, (NV,) + video.x3d.shape),
                )
                brun = det_lib.make_batched_video_detector(
                    apply, variables, cfg, synthetic.camera_K(),
                    raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
                )
                extras["fps_batched_8videos_aggregate"] = round(
                    timed_fps(brun, batched_video, T * NV, reps=2), 2
                )
            except Exception as e:
                extras["fps_batched_8videos_aggregate"] = None
                print(f"batched bench failed: {e}", file=sys.stderr)

        # Pallas fused biased attention (ops/attention_kernel.py)
        if budget_ok("fps_fused_attention", 260):
            try:
                fcfg = dataclasses.replace(
                    cfg,
                    model=dataclasses.replace(cfg.model, fused_attention=True),
                )
                fmodel = create_model(fcfg.model)
                fapply = make_bf16_apply(fmodel)
                frun = det_lib.make_video_detector(
                    fapply, variables, fcfg, synthetic.camera_K(),
                    raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
                )
                extras["fps_fused_attention"] = round(
                    timed_fps(frun, video, T, reps=2), 2)
            except Exception as e:  # kernel may not lower on every backend
                extras["fps_fused_attention"] = None
                print(f"fused-attention bench failed: {e}", file=sys.stderr)

        # int8 serving path (calibrated static scales, models/layers.py) —
        # measured slower than bf16 on this chip (docs/PERF.md int8 decision
        # table), so it is a --full-only extra, not a default one.
        if budget_ok("fps_int8", 260):
            try:
                from sgtapose_tpu.eval.synthetic_eval import calibration_inputs
                from sgtapose_tpu.models import layers as qlayers

                fp_apply = make_bf16_apply(model)
                scales = qlayers.calibrate(
                    lambda *a: fp_apply(variables, *a),
                    calibration_inputs(cfg, n_frames=2),
                )
                qrun = det_lib.make_video_detector(
                    make_bf16_apply(model, quant="int8", quant_scales=scales),
                    variables, cfg, synthetic.camera_K(),
                    raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
                )
                extras["fps_int8"] = round(
                    timed_fps(qrun, video, T, reps=2), 2)
            except Exception as e:  # int8 conv may not lower everywhere
                extras["fps_int8"] = None
                print(f"int8 bench failed: {e}", file=sys.stderr)

    if extras:
        print("bench.py extras: " + json.dumps(extras), file=sys.stderr)


if __name__ == "__main__":
    main()
