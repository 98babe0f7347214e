"""Training entry point.

Rebuild of ref sgtapose/train.py (:171-278 main) + scripts/train_scripts.sh:
  python -m sgtapose_tpu.cli.train --dataset DIR [--add_dataset DIR]
      [--val_dataset DIR] --output_dir OUT [--num_epochs 20] ...

Differences from the reference runtime (by design):
  * one process drives the whole mesh (jit SPMD) — no torch.distributed.launch
  * augmentation/priors/rendering on device — host workers only decode files
  * checkpoints are orbax directories ckpt/epoch_{e}
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import numpy as np

from sgtapose_tpu.config import (
    KEYPOINT_NAMES,
    SYNTHETIC_CAMERA_K,
    Config,
    ModelConfig,
    TrainConfig,
)
from sgtapose_tpu.data.discovery import (
    find_depth_seq_data_in_dir,
    find_ndds_seq_data_in_dir,
)
from sgtapose_tpu.data.loader import SeqBatchLoader
from sgtapose_tpu.data.pipeline import make_batch_fn
from sgtapose_tpu.parallel import mesh as mesh_lib
from sgtapose_tpu.train import trainer
from sgtapose_tpu.utils.logging import MetricsLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser("sgtapose_tpu train")
    p.add_argument("--dataset", required=True, help="training data dir (NDDS seq format)")
    p.add_argument("--add_dataset", default=None, help="optional second dir to concat")
    p.add_argument("--val_dataset", default=None)
    p.add_argument("--output_dir", default="exp/default")
    p.add_argument("--robot", default="panda_synthetic")
    p.add_argument("--object_name", default=None,
                   help="'ROBOT NAME' tag in the meta jsons (default: --robot)")
    p.add_argument("--arch", default="dlapawdl3new_34")
    p.add_argument("--num_epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=4, help="per device")
    p.add_argument("--lr", type=float, default=1.25e-4)
    p.add_argument("--seed", type=int, default=317)
    p.add_argument("--hm_disturb", type=float, default=0.75)
    p.add_argument("--lost_disturb", type=float, default=0.2)
    p.add_argument("--fp_disturb", type=float, default=0.1)
    p.add_argument("--fp_disturb_active", action="store_true",
                   help="actually inject false-positive prior blobs; the "
                        "reference flag exists but its live renderer has the "
                        "fp block commented out (utilities.py:999-1005), so "
                        "the default is inert like the reference")
    p.add_argument("--input_res", type=int, default=480)
    p.add_argument("--dla_node", default="dcn", choices=["dcn", "conv"])
    p.add_argument("--dcn_chunks", type=int, default=1,
                   help="DCN sampling in N row slabs (large-batch memory knob)")
    p.add_argument("--dcn_remat", action="store_true",
                   help="recompute DCN nodes in the backward (memory knob)")
    p.add_argument("--kernel_list", default="12,6,3,1,1,1",
                   help="per-level attention window sizes (ref ks1..ks6)")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port (ref "
                        "torch.distributed init, train.py:179). On TPU pod "
                        "slices pass --multihost alone for auto-detection")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host run with env auto-detection "
                        "(jax.distributed.initialize with no args)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="multi-host: total process count (with --coordinator)")
    p.add_argument("--process_id", type=int, default=None,
                   help="multi-host: this process's rank (with --coordinator)")
    p.add_argument("--num_workers", type=int, default=4,
                   help="loader IO threads (ref train.py:251 workers)")
    p.add_argument("--depth", action="store_true",
                   help="42-joint depth-variant training (flat png+json dir, "
                        "ref CenterTrackSeqDepthDataset datasets.py:445-635)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 model compute with f32 master params")
    p.add_argument("--phase", default="PlanA_win",
                   help="training phase (train/phases.py PHASES): PlanA_win | "
                        "PlanA_three | PlanA | PlanACAT | ablation_* | "
                        "CenterTrack | CenterNet | Dream")
    p.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    p.add_argument("--init_backbone", default=None,
                   help="ImageNet DLA-34 .pth (bare state_dict) to initialize "
                        "the trunk from — the reference's training-of-record "
                        "init (ref dla.py:339-363 load_pretrained_model)")
    p.add_argument("--init_backbone_stem", action="store_true",
                   help="also copy the ImageNet base_layer into the active "
                        "pre_img stem (deviation; see convert_imagenet_dla34)")
    p.add_argument("--lr_step", default=None,
                   help="comma-separated epoch milestones for 0.1x step decay "
                        "instead of warmup+poly (ref lib/opts_parallel.py "
                        "--lr_step; resume replays the decay, ref "
                        "lib/model/model.py:87-99)")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--image_log_every", type=int, default=250,
                   help="training mosaic (input | GT hm | pred hm) interval "
                        "(ref trainer_parallel.py:307-400); 0 disables")
    return p.parse_args(argv)


def build_config(args) -> Config:
    ablation_mode = (
        args.phase[len("ablation_"):] if args.phase.startswith("ablation_")
        else "shared_repro"
    )
    return Config(
        model=ModelConfig(
            arch=args.arch,
            input_res=(args.input_res, args.input_res),
            num_classes=42 if args.depth else len(KEYPOINT_NAMES[args.robot]),
            dla_node=args.dla_node,
            dcn_chunks=args.dcn_chunks,
            dcn_remat=args.dcn_remat,
            kernel_list=tuple(int(x) for x in args.kernel_list.split(",")),
            ablation_mode=ablation_mode,
        ),
        train=TrainConfig(
            lr=args.lr,
            num_epochs=args.num_epochs,
            batch_size_per_device=args.batch_size,
            seed=args.seed,
            hm_disturb=args.hm_disturb,
            lost_disturb=args.lost_disturb,
            fp_disturb=args.fp_disturb,
            fp_disturb_active=args.fp_disturb_active,
        ),
        robot=args.robot,
    )


def main(argv=None):
    from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = parse_args(argv)
    cfg = build_config(args)

    # multi-host: join the run BEFORE any device query (ref NCCL
    # init_process_group, train.py:179). The mesh then spans the global
    # device set and XLA routes gradient collectives over ICI + DCN.
    if args.coordinator and (args.num_processes is None or args.process_id is None):
        raise SystemExit(
            "--coordinator requires both --num_processes and --process_id "
            "(explicit off-pod setup); on TPU pod slices use --multihost "
            "alone for env auto-detection"
        )
    if args.multihost or args.coordinator:
        mesh_lib.initialize_multihost(
            args.coordinator, args.num_processes, args.process_id
        )
    rank0 = jax.process_index() == 0
    if rank0:
        os.makedirs(args.output_dir, exist_ok=True)
    # rank-0-only fs/TB writes (ref train.py:187-190)
    logger = MetricsLogger(
        args.output_dir if rank0 else None, resume=bool(args.resume)
    )

    mesh = mesh_lib.make_mesh(args.num_devices)
    n_dev = mesh.devices.size
    global_batch = cfg.train.batch_size_per_device * n_dev
    # each process loads only ITS slice: per-device batch x local devices
    local_batch = cfg.train.batch_size_per_device * max(
        1, n_dev // jax.process_count()
    )
    print(
        f"devices={n_dev} ({jax.process_count()} processes) "
        f"global_batch={global_batch} local_batch={local_batch}"
    )

    # dataset discovery (+ optional concat, ref train.py:193-202)
    three = args.phase == "PlanA_three"
    if args.depth and three:
        raise SystemExit(
            "--depth cannot be combined with --phase PlanA_three: the "
            "42-joint depth dataset is a 2-frame format (ref "
            "CenterTrackSeqDepthDataset, datasets.py:445-635)"
        )
    if args.depth:
        discover = find_depth_seq_data_in_dir
    elif three:
        from sgtapose_tpu.data.discovery import find_ndds_seq_triples_in_dir

        discover = find_ndds_seq_triples_in_dir
    else:
        discover = find_ndds_seq_data_in_dir
    pairs = discover(args.dataset)
    if args.add_dataset:
        pairs = pairs + discover(args.add_dataset)
    if jax.process_count() > 1:
        # DistributedSampler equivalent: disjoint per-process slice,
        # truncated to a COMMON length — uneven shards would give processes
        # different iters_per_epoch and desynchronize the global SPMD
        # launches into a deadlock (DistributedSampler pads for the same
        # reason; we drop the remainder instead)
        per_proc = len(pairs) // jax.process_count()
        start = jax.process_index() * per_proc
        pairs = pairs[start:start + per_proc]
    print(f"train pairs: {len(pairs)} (this process)")

    camera_K = np.asarray(SYNTHETIC_CAMERA_K)
    object_name = args.object_name or args.robot
    kp_names = [] if args.depth else KEYPOINT_NAMES[args.robot]
    if args.depth:
        object_name = args.object_name or "Franka_Emika_Panda"
    loader_cls = SeqBatchLoader
    if three:
        from sgtapose_tpu.data.loader import TripleBatchLoader

        loader_cls = TripleBatchLoader
    loader = loader_cls(
        pairs, cfg, camera_K, object_name,
        kp_names, local_batch, seed=args.seed,
        num_workers=args.num_workers, depth=args.depth,
    )
    val_loader = None
    if args.val_dataset:
        val_pairs = discover(args.val_dataset)
        val_loader = loader_cls(
            val_pairs, cfg, camera_K, object_name, kp_names,
            local_batch, shuffle=False, num_workers=args.num_workers,
            depth=args.depth,
        )

    iters_per_epoch = len(loader)
    max_iters = max(iters_per_epoch * cfg.train.num_epochs, 1)

    rng = jax.random.PRNGKey(args.seed)
    schedule = None
    if args.lr_step:
        from sgtapose_tpu.train.schedule import step_decay_schedule

        schedule = step_decay_schedule(
            cfg.train.lr,
            [int(e) for e in args.lr_step.split(",")],
            iters_per_epoch,
        )
    state = trainer.create_train_state_for_phase(
        cfg, rng, args.phase, max_iters=max_iters, schedule=schedule
    )
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
    if args.resume:
        state = trainer.load_checkpoint(os.path.abspath(args.resume), state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    if three:
        from sgtapose_tpu.data.pipeline import make_batch_fn_three

        batch_fn = make_batch_fn_three(cfg, camera_K)
    else:
        batch_fn = make_batch_fn(cfg, camera_K)
    pstep = trainer.make_parallel_train_step(
        mesh,
        bf16=args.bf16,
        phase=args.phase,
        hm_weight=cfg.train.hm_weight,
        reg_weight=cfg.train.reg_weight,
        tracking_weight=cfg.train.tracking_weight,
    )
    predict_fn = jax.jit(functools.partial(trainer.predict_step, phase=args.phase))
    # loss + prediction heads from ONE forward (val runs both per batch)
    eval_predict_fn = jax.jit(
        functools.partial(trainer.eval_predict_step, phase=args.phase)
    )
    drop_rng = jax.random.PRNGKey(args.seed + 1)

    def log_mosaic(batch, step):
        """Input | GT heatmap | predicted heatmap side-by-side
        (ref trainer_parallel.py:307-400 image logging)."""
        from sgtapose_tpu.config import IMAGE_MEAN, IMAGE_STD
        from sgtapose_tpu.utils.visualize import training_debug_mosaic

        one = {k: v[:1] for k, v in batch.items()}
        pred = predict_fn(state, one)
        img = np.asarray(one["cur_img"][0])
        img = (img * np.asarray(IMAGE_STD) + np.asarray(IMAGE_MEAN)) * 255.0
        mosaic = training_debug_mosaic(
            img, np.asarray(one["gt_belief_maps"][0]), np.asarray(pred["hm"][0])
        )
        logger.log_image(step, "train_mosaic", mosaic)

    for epoch in range(1, cfg.train.num_epochs + 1):
        t0 = time.time()
        for it, raw in enumerate(loader.epoch(epoch)):
            brng = jax.random.fold_in(jax.random.PRNGKey(args.seed + 2), int(state.step))
            batch = batch_fn(brng, jax.tree_util.tree_map(np.asarray, raw))
            batch = mesh_lib.shard_batch(batch, mesh)
            state, stats = pstep(state, batch, drop_rng)
            if it % args.log_every == 0:
                s = {k: float(v) for k, v in stats.items()}
                logger.log(int(state.step), s)
                print(
                    f"epoch {epoch} it {it}/{iters_per_epoch} "
                    + " ".join(f"{k}={v:.5f}" for k, v in s.items())
                )
            if (
                args.image_log_every and it % args.image_log_every == 0
                and jax.process_count() == 1
            ):  # multihost: mosaic fetch needs a fully-addressable batch
                log_mosaic(batch, int(state.step))
        # checkpoint per epoch (ref train.py:264-265)
        ckpt = os.path.abspath(os.path.join(args.output_dir, "ckpt", f"epoch_{epoch}"))
        trainer.save_checkpoint(ckpt, state)
        print(f"epoch {epoch} done in {time.time()-t0:.1f}s -> {ckpt}")

        if val_loader is not None and jax.process_count() > 1:
            print("val keypoint metrics skipped under multi-host (loss-only "
                  "val would need a process_allgather of decoded coords)")
        elif val_loader is not None:
            from sgtapose_tpu.decode.peaks import decode_heatmaps_batch
            from sgtapose_tpu.eval import metrics as metrics_lib

            vals, det_all, gt_all = [], [], []
            ratio = float(cfg.model.down_ratio)
            for raw in val_loader.epoch(0):
                batch = batch_fn(jax.random.PRNGKey(0), jax.tree_util.tree_map(np.asarray, raw))
                # one forward for both the loss and the keypoint metric
                # suite (ref train.py:44-166 save_results)
                stats, pred = eval_predict_fn(state, batch)
                vals.append({k: float(v) for k, v in stats.items()})
                dec = decode_heatmaps_batch(
                    pred["hm"], pred["reg"], pred["tracking"],
                    max_peaks=cfg.infer.max_peaks,
                    peak_thresh=cfg.infer.peak_thresh,
                    ambiguity_gap=cfg.infer.ambiguity_gap,
                    peak_offset=cfg.infer.peak_offset,
                    sigma=cfg.infer.peak_sigma,
                    ref_sort=cfg.infer.ref_sort,
                    coord_mode=cfg.infer.decode_coord,
                )
                det_all.append(np.asarray(dec.coords) * ratio)
                gt = np.asarray(batch["kp_int"], np.float32) + np.asarray(
                    batch["reg_target"]
                )
                gt_all.append(gt * ratio)
            mean = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]} if vals else {}
            if det_all:
                H, W = cfg.model.input_res
                km = metrics_lib.keypoint_metrics(
                    np.concatenate(det_all).reshape(-1, 2),
                    np.concatenate(gt_all).reshape(-1, 2),
                    (W, H),
                )
                mean.update({
                    "kp_found_inframe": km["num_found_gt_inframe"],
                    "kp_missing_inframe": km["num_missing_gt_inframe"],
                    "kp_l2_mean_px": km["l2_error_mean_px"] or -1.0,
                    "kp_pck_auc_12px": km["l2_error_auc"] or 0.0,
                })
            logger.log(int(state.step), mean, prefix="val")
            print(f"epoch {epoch} val: {mean}")

    logger.close()


if __name__ == "__main__":
    main()
