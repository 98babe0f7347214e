"""Checkpoint converter CLI: reference torch .pth <-> our orbax checkpoints.

The missing packaging piece of the real-data parity runbook
(scripts/parity_real.sh): the moment the released model_20.pth
(ref scripts/inference_scripts.sh:4) is available, one command produces an
orbax checkpoint every inference/eval entry point accepts.

  torch -> jax:  python -m sgtapose_tpu.cli.convert \
                     --torch_ckpt model_20.pth --out ckpt/converted
  jax -> torch:  python -m sgtapose_tpu.cli.convert \
                     --ckpt ckpt/epoch_20 --out_pth exported.pth

The conversion itself is utils/torch_convert.py (full-coverage tested:
356 tensors / 0 missing / 0 unused for the flagship); this module only adds
the model-shape template and orbax I/O around it.
"""

from __future__ import annotations

import argparse
import json
import os

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser("sgtapose_tpu convert")
    p.add_argument("--torch_ckpt", default=None,
                   help="reference .pth to ingest ({epoch,state_dict,...} or "
                        "bare state_dict)")
    p.add_argument("--ckpt", default=None,
                   help="orbax checkpoint dir to export (jax -> torch mode)")
    p.add_argument("--out", default=None, help="orbax output dir (torch -> jax)")
    p.add_argument("--out_pth", default=None, help=".pth output (jax -> torch)")
    p.add_argument("--arch", default="dlapawdl3new_34")
    p.add_argument("--ablation_mode", default="shared_repro",
                   help="for --arch dlaabla_34: shared_repro | shared | "
                        "wo_shared (wo_shared checkpoints carry a separate "
                        "base1 trunk that must be mapped)")
    p.add_argument("--dla_node", default="dcn", choices=["dcn", "conv"])
    p.add_argument("--kernel_list", default="12,6,3,1,1,1")
    p.add_argument("--num_classes", type=int, default=7)
    p.add_argument("--no_bgr_flip", action="store_true",
                   help="skip the BGR->RGB first-conv channel flip (the "
                        "reference trains on cv2 BGR frames; our loader "
                        "feeds RGB, so the flip is on by default)")
    p.add_argument("--lenient", action="store_true",
                   help="keep going on missing/mismatched tensors (like ref "
                        "load_model's shape-mismatch skip, model.py:59-83); "
                        "default is strict")
    p.add_argument("--report_out", default=None,
                   help="write the conversion report json here")
    return p.parse_args(argv)


_ARCH_PHASE = {
    "dlapawdl3new": "PlanA_win",
    "dlapawd": "PlanA_win",
    "dlapa": "PlanA",
    "dlapacat": "PlanACAT",
    "dlapawd3": "PlanA_three",
}


def _template_state(args):
    """Fresh TrainState as the shape template. Param shapes are
    input-resolution independent (convs + the (heads,n,n) attention bias
    depend only on kernel_list/K), so init at 64x64 for speed."""
    from sgtapose_tpu.config import Config, ModelConfig
    from sgtapose_tpu.train import trainer

    arch_base = args.arch.split("_")[0]
    phase = (
        f"ablation_{args.ablation_mode}" if arch_base == "dlaabla"
        else _ARCH_PHASE.get(arch_base, "PlanA_win")
    )
    cfg = Config(
        model=ModelConfig(
            arch=args.arch,
            input_res=(64, 64),
            num_classes=args.num_classes,
            dla_node=args.dla_node,
            kernel_list=tuple(int(x) for x in args.kernel_list.split(",")),
            ablation_mode=args.ablation_mode,
        )
    )
    return trainer.create_train_state_for_phase(
        cfg, jax.random.PRNGKey(0), phase, max_iters=1
    )


def main(argv=None):
    from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = parse_args(argv)
    from sgtapose_tpu.train import trainer
    from sgtapose_tpu.utils import torch_convert as tc

    arch_base = args.arch.split("_")[0]
    if arch_base == "dlaabla" and args.ablation_mode == "wo_shared":
        # wo_shared ablation checkpoints carry a second trunk (base1) +
        # cur_img stem; the plain 'dlaabla' mapping would silently leave
        # them at random init (torch_convert._flag_map:dlaabla_wo_shared)
        arch_base = "dlaabla_wo_shared"
    if args.torch_ckpt:
        if not args.out:
            raise SystemExit("--torch_ckpt needs --out (orbax dir)")
        sd = tc.load_torch_checkpoint(args.torch_ckpt)
        state = _template_state(args)
        params, stats, report = tc.convert_state_dict(
            sd, state.params, state.batch_stats,
            bgr_to_rgb=not args.no_bgr_flip,
            strict=not args.lenient,
            dla_node=args.dla_node,
            arch=arch_base,
        )
        state = state.replace(params=params, batch_stats=stats)
        trainer.save_checkpoint(os.path.abspath(args.out), state)
        print(f"converted {report['n_converted']} tensors -> {args.out}")
        if report["missing"] or report["mismatched"] or report["unused_ref_keys"]:
            print(f"report: missing={len(report['missing'])} "
                  f"mismatched={len(report['mismatched'])} "
                  f"unused={len(report['unused_ref_keys'])}")
        if args.report_out:
            with open(args.report_out, "w") as f:
                json.dump(report, f, indent=1, default=str)
        return

    if args.ckpt:
        if not args.out_pth:
            raise SystemExit("--ckpt needs --out_pth (.pth path)")
        state = _template_state(args)
        state = trainer.load_checkpoint(os.path.abspath(args.ckpt), state)
        sd = tc.export_state_dict(
            state.params, state.batch_stats,
            bgr_to_rgb=not args.no_bgr_flip,
            dla_node=args.dla_node,
            arch=arch_base,
        )
        tc.save_torch_checkpoint(args.out_pth, sd, epoch=int(state.step))
        print(f"exported {len(sd)} tensors -> {args.out_pth}")
        return

    raise SystemExit("pass --torch_ckpt (torch->jax) or --ckpt (jax->torch)")


if __name__ == "__main__":
    main()
