"""Export a trained trunk as a BARE ImageNet-format DLA-34 state_dict.

Thin CLI over utils/torch_convert.export_imagenet_dla34 (the inverse of
convert_imagenet_dla34; round-trip tested in tests/test_torch_convert.py).

Purpose: this environment has no ImageNet weights, so the
`train_demo --init_backbone` path is functionally validated by a
trunk-transfer A/B instead — export the trunk of a trained checkpoint here,
then warm-start a fresh run from the .pth and compare its early loss/eval
against scratch (scripts/train_r4_ab.sh base arm provides both the donor
and the scratch trace at the same seed).

Usage: python scripts/export_trunk_dla34.py --ckpt .cache/r4ab/base \
           --out .cache/r4ab/trunk_dla34.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--input_res", type=int, default=480,
                    help="input_res the checkpoint was trained at (shapes "
                         "must match for the orbax restore template)")
    ap.add_argument("--dla_node", default="dcn")
    args = ap.parse_args()

    from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import jax
    import numpy as np
    import torch

    from sgtapose_tpu.config import Config, ModelConfig
    from sgtapose_tpu.train import trainer
    from sgtapose_tpu.utils.torch_convert import export_imagenet_dla34

    cfg = Config(model=ModelConfig(
        input_res=(args.input_res, args.input_res), dla_node=args.dla_node,
    ))
    state = trainer.create_train_state(cfg, jax.random.PRNGKey(0), max_iters=1)
    state = trainer.load_checkpoint(os.path.abspath(args.ckpt), state)

    sd = export_imagenet_dla34(state.params, state.batch_stats)
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        args.out,
    )
    print(f"exported {len(sd)} trunk tensors -> {args.out}")


if __name__ == "__main__":
    main()
