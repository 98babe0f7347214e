"""Benchmark: sequential 480p inference throughput on one chip.

North-star metric (BASELINE.json): frames/sec/chip at 480p sequential
inference — the reference's per-frame path is pre_process -> model forward ->
CPU peak finding -> PnP prior for the next frame, all at batch 1
(ref lib/sgta_detector.py:117-236). Ours runs the ENTIRE sequential recurrence
(PnP prior -> prior rendering -> Siamese forward -> on-device peak decode ->
inverse affine -> per-class selection) as one `lax.scan` on device.

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

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sgtapose_tpu.config import Config
    from sgtapose_tpu.data import synthetic
    from sgtapose_tpu.infer import detector as det_lib
    from sgtapose_tpu.models.sgta import create_model
    from sgtapose_tpu.utils.precision import bf16_inference_variables, cast_floating

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

    def apply(variables, *inputs):
        inputs = tuple(cast_floating(x, jnp.bfloat16) for x in inputs)
        out = model.apply(variables, *inputs, train=False)
        return {k: v.astype(jnp.float32) for k, v in out.items()}

    T = 32
    projs, imgs = synthetic.make_sequence(jax.random.PRNGKey(1), 2)
    # synthetic raws are 360x640; tile 2 frames into a T-frame video
    video_imgs = jnp.concatenate([imgs] * (T // 2), axis=0)
    x3d = jnp.tile(synthetic.SKELETON[None], (T, 1, 1))

    images, _, _ = det_lib.preprocess_frames(video_imgs, cfg)
    video = det_lib.VideoFrames(images=images, x3d=x3d)

    run = det_lib.make_video_detector(
        apply, variables, cfg, synthetic.camera_K(),
        raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
    )

    # compile + warm
    res = run(video)
    _ = np.asarray(res.detected_kps)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = run(video)
        _ = np.asarray(res.detected_kps)  # true sync (block_until_ready lies
        #                                   through the tunnel)
    dt = (time.perf_counter() - t0) / reps

    fps = T / dt
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
        )
    )


if __name__ == "__main__":
    main()
