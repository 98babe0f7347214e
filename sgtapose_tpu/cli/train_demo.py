"""Self-contained TPU training demonstration: train the flagship model on
on-device-generated synthetic sequences, then run the streaming detector and
report PCK/ADD metrics. No dataset required — this is the framework's
smoke-scale equivalent of the reference's franka_data training + syn_test
eval loop, runnable anywhere JAX has a device.

  python -m sgtapose_tpu.cli.train_demo --steps 600 --batch 8 --bf16
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sgtapose_tpu.config import Config, ModelConfig, TrainConfig
from sgtapose_tpu.data import pipeline, synthetic

from sgtapose_tpu.infer import detector as det_lib
from sgtapose_tpu.models.sgta import create_model
from sgtapose_tpu.train import trainer
from sgtapose_tpu.utils.precision import bf16_inference_variables


def parse_args(argv=None):
    p = argparse.ArgumentParser("sgtapose_tpu train_demo")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--input_res", type=int, default=480)
    p.add_argument("--dla_node", default="dcn")
    p.add_argument("--fused_attention", action="store_true",
                   help="Pallas fused biased-attention kernel (A/B knob)")
    p.add_argument("--dcn_chunks", type=int, default=1,
                   help="DCN sampling in N row slabs (large-batch memory knob)")
    p.add_argument("--dcn_remat", action="store_true",
                   help="recompute DCN nodes in the backward (memory knob)")
    p.add_argument("--eval_frames", type=int, default=16)
    p.add_argument("--eval_videos", type=int, default=4)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=317)
    p.add_argument("--schedule_iters", type=int, default=None,
                   help="LR-schedule horizon (warmup/poly constants) when it "
                        "should differ from --steps. Schedule constants are "
                        "baked into the compiled train step, so fine-tune "
                        "arms that pass the parent run's value (and match "
                        "its lr/reg_weight) reuse its executable verbatim "
                        "from the persistent compile cache")
    p.add_argument("--ckpt_out", default=None,
                   help="save the trained state (orbax) for offline evals")
    p.add_argument("--ckpt_every", type=int, default=0,
                   help="with --ckpt_out, also save every N steps to "
                        "<ckpt_out>_stepN (crash safety for long runs)")
    p.add_argument("--init_ckpt", default=None,
                   help="warm-start params/batch_stats from a checkpoint "
                        "(fresh optimizer + schedule — fine-tune mode)")
    p.add_argument("--resume_step", type=int, default=0,
                   help="with --init_ckpt: continue the PARENT run's lr "
                        "schedule from this step. Sets state.step and every "
                        "optimizer count leaf to N host-side, so the "
                        "already-compiled --schedule_iters executable (the "
                        "schedule is baked; the count is DATA) replays lr "
                        "steps N.. verbatim with zero recompile — preemption "
                        "resume. Adam moments restart (not checkpointed by "
                        "the params-only warm start)")
    p.add_argument("--init_backbone", default=None,
                   help="ImageNet DLA-34 .pth (bare state_dict) to initialize "
                        "the trunk from (ref dla.py:339-363 "
                        "load_pretrained_model)")
    p.add_argument("--init_backbone_stem", action="store_true",
                   help="also copy the ImageNet base_layer into the active "
                        "pre_img stem (deviation; see convert_imagenet_dla34)")
    p.add_argument("--reg_weight", type=float, default=0.01,
                   help="sub-pixel offset loss weight (reference default "
                        "0.01; raise to sharpen decode precision)")
    p.add_argument("--quant_train", action="store_true",
                   help="QAT fine-tune mode: train with fake-quantized convs "
                        "(straight-through int8 noise, models/layers.py) and "
                        "evaluate with real int8 serving")
    p.add_argument("--cache_prior", action="store_true",
                   help="fine-tune ON the feature-cache serving path's input "
                        "distribution: condition the pre pass on a PnP-"
                        "reprojection prior instead of the detection prior "
                        "(data/pipeline.py cache_prior)")
    p.add_argument("--eval_cache", action="store_true",
                   help="also evaluate on the feature-cache fast-path "
                        "detector (one trunk pass per frame)")
    return p.parse_args(argv)


def main(argv=None):
    from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = parse_args(argv)
    cfg = Config(
        model=ModelConfig(
            input_res=(args.input_res, args.input_res), dla_node=args.dla_node,
            fused_attention=args.fused_attention,
            dcn_chunks=args.dcn_chunks, dcn_remat=args.dcn_remat,
        ),
        train=TrainConfig(
            lr=args.lr,
            warmup_iters=min(100, (args.schedule_iters or args.steps) // 4),
        ),
    )
    state = trainer.create_train_state(
        cfg, jax.random.PRNGKey(args.seed),
        max_iters=args.schedule_iters or args.steps,
    )
    if args.init_ckpt:
        # fine-tune: take params/batch_stats from the checkpoint, keep the
        # fresh optimizer + warmup/poly schedule of THIS run
        donor = trainer.load_checkpoint(os.path.abspath(args.init_ckpt), state)
        state = state.replace(params=donor.params, batch_stats=donor.batch_stats)
        print(f"warm-started params from {args.init_ckpt}")
        if args.resume_step:
            state = trainer.resume_schedule_state(state, args.resume_step)
            print(f"schedule resumed at step {args.resume_step}", flush=True)
    if args.init_backbone:
        from sgtapose_tpu.utils.torch_convert import (
            convert_imagenet_dla34, load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(args.init_backbone)
        new_p, new_s, report = convert_imagenet_dla34(
            sd, state.params, state.batch_stats,
            map_stem=args.init_backbone_stem,
        )
        state = state.replace(params=new_p, batch_stats=new_s)
        print(f"ImageNet trunk init from {args.init_backbone}: "
              f"{report['n_converted']} tensors")
    batch_fn = pipeline.make_batch_fn(
        cfg, synthetic.camera_K(), cache_prior=args.cache_prior
    )
    raw_fn = jax.jit(functools.partial(synthetic.make_raw_batch, batch_size=args.batch))
    step = functools.partial(
        trainer.train_step, bf16=args.bf16, reg_weight=args.reg_weight
    )
    if args.quant_train:
        from sgtapose_tpu.models.layers import quantized_apply

        step = quantized_apply(step, "int8_train")
    step_fn = jax.jit(step, donate_argnums=0)

    print(f"training {args.steps} steps, batch {args.batch}, bf16={args.bf16}")
    t0 = time.time()
    for it in range(args.steps):
        k = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), it)
        raw = raw_fn(jax.random.fold_in(k, 0))
        batch = batch_fn(jax.random.fold_in(k, 1), raw)
        state, stats = step_fn(state, batch, jax.random.PRNGKey(args.seed + 2))
        if it % args.log_every == 0 or it == args.steps - 1:
            s = {k2: float(np.asarray(v)) for k2, v in stats.items()}
            print(
                f"step {it}: " + " ".join(f"{k2}={v:.5f}" for k2, v in s.items())
                + f"  ({(time.time()-t0):.0f}s)",
                flush=True,
            )
        if (
            args.ckpt_out and args.ckpt_every
            and it > 0 and it % args.ckpt_every == 0
        ):
            trainer.save_checkpoint(
                os.path.abspath(f"{args.ckpt_out}_step{it}"), state
            )
            print(f"saved checkpoint -> {args.ckpt_out}_step{it}", flush=True)
    print(f"training done in {time.time()-t0:.0f}s")
    if args.ckpt_out:
        trainer.save_checkpoint(os.path.abspath(args.ckpt_out), state)
        print(f"saved checkpoint -> {args.ckpt_out}")

    if args.eval_videos <= 0:
        print("eval skipped (--eval_videos 0)")
        return None

    # ---- streaming eval on held-out synthetic videos -------------------------
    from sgtapose_tpu.eval.synthetic_eval import (
        evaluate_runner, make_bf16_apply, make_eval_videos,
    )

    model = create_model(cfg.model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = bf16_inference_variables(variables)

    run = det_lib.make_video_detector(
        make_bf16_apply(model, quant="int8" if args.quant_train else None),
        variables, cfg, synthetic.camera_K(),
        raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
    )
    vids = make_eval_videos(args.eval_videos, args.eval_frames, args.seed)
    results, fps = evaluate_runner(run, cfg, vids, args.eval_frames)
    n_frames = args.eval_videos * args.eval_frames
    print(f"eval inference: {n_frames} frames ({fps:.1f} fps)")
    km, pm = results["keypoint_metrics"], results["pnp_metrics"]
    print(f"found in-frame: {km['num_found_gt_inframe']}/{km['num_gt_inframe']}")
    print(f"PCK AUC@12px: {km['l2_error_auc']}")
    print(f"L2 mean px: {km['l2_error_mean_px']}")
    print(f"ADD AUC@0.06m: {pm['add_auc']}")
    print(f"ADD mean m: {pm['add_mean']}")

    if args.eval_cache:
        runc = det_lib.make_cached_video_detector(
            model, variables, cfg, synthetic.camera_K(),
            raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
            quant="int8" if args.quant_train else None,
        )
        resc, fpsc = evaluate_runner(runc, cfg, vids, args.eval_frames)
        kmc, pmc = resc["keypoint_metrics"], resc["pnp_metrics"]
        print(f"[cache path] eval inference: {n_frames} frames ({fpsc:.1f} fps)")
        print(f"[cache path] PCK AUC@12px: {kmc['l2_error_auc']}")
        print(f"[cache path] ADD AUC@0.06m: {pmc['add_auc']}")
        results["cache_path"] = resc
    return results


if __name__ == "__main__":
    main()
