"""int8 min_ch gate sweep: 480p streaming-detector fps per channel gate.

Closes the docs/PERF.md round-3 "TPU sweep pending" item for the int8
static-scale serving mode (models/layers.py). For each min_ch threshold the
quantizable convs with min(in_ch, out_ch) >= min_ch run as s8 x s8 -> s32 on
the MXU with calibrated trace-time-constant activation scales; smaller sites
stay bf16 (bandwidth-bound — quantize/dequantize passes cost more than the
int8 MXU saving there). Baseline row (min_ch=None) is the plain bf16 path.

Same timing protocol as bench.py: the whole T-frame recurrence is one device
call, fetched once (np.asarray forces the sync through the tunnel).

Usage: python scripts/sweep_int8.py [--gates 0,64,128,256] [--frames 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def _probe_backend():
    """Bounded-subprocess backend probe (same rationale as bench.py: the axon
    tunnel can be down for hours and jax backend init then hangs forever)."""
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=180, capture_output=True,
        )
        ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print(
            "sweep_int8.py: no usable JAX backend (device init failed or "
            "timed out — TPU tunnel down?); exiting before in-process import.",
            file=sys.stderr,
        )
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gates", default="0,64,128,256",
                    help="comma-separated min_ch thresholds to sweep")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--dynamic", action="store_true",
                    help="also time the uncalibrated per-tensor-scale mode")
    args = ap.parse_args()
    # synthetic raws come in pairs; round T down to even and use that value
    # everywhere (frame construction AND the fps denominator)
    args.frames = max(2, 2 * (args.frames // 2))

    # probe AFTER arg parsing so --help never blocks on a 180s subprocess
    _probe_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from sgtapose_tpu.config import Config
    from sgtapose_tpu.data import synthetic
    from sgtapose_tpu.eval.synthetic_eval import (calibration_inputs,
                                                  make_bf16_apply)
    from sgtapose_tpu.infer import detector as det_lib
    from sgtapose_tpu.models import layers as qlayers
    from sgtapose_tpu.models.sgta import create_model
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

    T = args.frames
    _, imgs = synthetic.make_sequence(jax.random.PRNGKey(1), 2)
    video_imgs = jnp.concatenate([imgs] * (T // 2), axis=0)
    x3d = jnp.tile(synthetic.SKELETON[None], (T, 1, 1))
    images, _, _ = det_lib.preprocess_frames(video_imgs, cfg)
    video = det_lib.VideoFrames(images=images, x3d=x3d)

    def timed_fps(runner):
        res = runner(video)  # compile + warm
        _ = np.asarray(res.detected_kps)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            res = runner(video)
            _ = np.asarray(res.detected_kps)
        return T / ((time.perf_counter() - t0) / args.reps)

    fp_apply = make_bf16_apply(model)
    # one calibration serves every gate: every plain site records a scale
    # regardless of min_ch (models/layers.py:_dispatching_conv)
    scales = qlayers.calibrate(
        lambda *a: fp_apply(variables, *a), calibration_inputs(cfg, n_frames=2)
    )

    rows = []

    def run_row(label, apply_fn):
        # guarded like bench.py's int8 path: a lowering failure on one gate
        # must not lose the whole sweep's final summary
        try:
            runner = det_lib.make_video_detector(
                apply_fn, variables, cfg, synthetic.camera_K(),
                raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
            )
            fps = round(timed_fps(runner), 2)
        except Exception as e:
            print(f"row '{label}' failed: {e}", file=sys.stderr)
            fps = None
        rows.append({"config": label, "fps": fps})
        print(json.dumps(rows[-1]), flush=True)

    run_row("bf16", fp_apply)
    for gate in [int(g) for g in args.gates.split(",")]:
        run_row(
            f"int8_static_min_ch={gate}",
            make_bf16_apply(model, quant="int8", quant_scales=scales,
                            quant_min_ch=gate),
        )
    if args.dynamic:
        run_row("int8_dynamic", make_bf16_apply(model, quant="int8"))

    base = rows[0]["fps"]
    for r in rows:
        r["vs_bf16"] = (
            round(r["fps"] / base, 3) if base and r["fps"] else None
        )
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
