"""Configuration system.

Dataclass mirror of the reference's argparse flag system
(ref: lib/opts_parallel.py — 150+ flags; we keep the ones that affect behavior,
grouped by subsystem, with identical defaults where parity matters).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

# Keypoint names per robot (ref: lib/opts_parallel.py:439-475 get_keypoint_names)
KEYPOINT_NAMES = {
    "panda": [
        "panda_link0",
        "panda_link2",
        "panda_link3",
        "panda_link4",
        "panda_link6",
        "panda_link7",
        "panda_hand",
    ],
    # synthetic-set names exactly as the reference's get_keypoint_names
    # emits them (ref lib/opts_parallel.py:439-475) so reference-generated
    # synthetic datasets load unchanged
    "panda_synthetic": [
        "Link0",
        "Link1",
        "Link3",
        "Link4",
        "Link6",
        "Link7",
        "Panda_hand",
    ],
    "kuka": [
        "Link0",
        "Link1",
        "Link2",
        "Link3",
        "Link4",
        "Link5",
        "Link6",
        "Link7",
        "Kuka_hand",
    ],
    "ur5e": [
        "Link0",
        "Link1",
        "Link2",
        "Link3",
        "Link4",
        "Link5",
        "Link6",
        "Ur_hand",
    ],
}

# Fixed synthetic camera intrinsics (ref: sgtapose/datasets.py:45)
SYNTHETIC_CAMERA_K = (
    (502.30, 0.0, 319.75),
    (0.0, 502.30, 179.75),
    (0.0, 0.0, 1.0),
)

# Image normalization: the reference uses mean=std=0.5 for BOTH training
# (ref sgtapose/train.py:211 image_normalization) and inference
# (ref lib/sgta_detector.py:58-59) — NOT ImageNet stats. Matching it is
# required for converted reference checkpoints to run correctly.
IMAGE_MEAN = (0.5, 0.5, 0.5)
IMAGE_STD = (0.5, 0.5, 0.5)


@dataclass(frozen=True)
class ModelConfig:
    """Architecture config (ref: lib/opts_parallel.py:102-145)."""

    arch: str = "dlapawdl3new_34"  # flagship: DLA-34 + l3new windowed attention
    num_classes: int = 7  # robot keypoints (panda)
    input_res: Tuple[int, int] = (480, 480)  # (H, W) network input
    down_ratio: int = 4  # output stride -> 120x120 heatmaps
    head_conv: int = 256  # hidden channels of each output head
    prior_bias: float = -4.6  # hm head bias init (ref: base_model.py:62)
    dla_node: str = "dcn"  # decoder node type: dcn | conv
    # Large-batch training memory knobs for the DCN decoder (numerics
    # unchanged; see models/deform_conv.py + docs/PERF.md): dcn_chunks > 1
    # computes deformable sampling in row slabs under lax.scan (bounds the
    # gather temps); dcn_remat recomputes the DCN in the backward instead of
    # saving its (B,H,W,9C) sampled activation. Defaults off (fastest).
    dcn_chunks: int = 1
    dcn_remat: bool = False
    num_decoder_layers: int = 3  # cross-attention encoder depth (weight-tied)
    n_heads: int = 8
    pos_embed: bool = True  # learned relative position bias in attention
    fused_attention: bool = False  # Pallas flash-style biased attention
    fused_attention_interpret: bool = False  # interpret mode (CPU tests)
    # Per-level top-k counts and window kernel sizes
    # (ref: opts_parallel.py k_list_1..6 = 1, ks1..6 = 12,6,3,1,1,1)
    k_list: Tuple[int, ...] = (1, 1, 1, 1, 1, 1)
    kernel_list: Tuple[int, ...] = (12, 6, 3, 1, 1, 1)
    # Scale from 120x120 cls-heatmap coords into each feature level's resolution
    # (ref: dla.py:1493 scale_list)
    scale_list: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5, 0.25, 0.125)
    # DLA_PlanA (dlapa) global-attention token count (ref dla.py:1022 K=28)
    topk_global: int = 28
    # DLA_PlanAAblation trunk/prior wiring (ref dla.py:1198-1240, selected by
    # opt.phase): wo_shared | shared | shared_repro
    ablation_mode: str = "shared_repro"
    # dtype policy: params in f32, activations bf16 on TPU
    use_bf16: bool = True

    @property
    def output_res(self) -> Tuple[int, int]:
        return (self.input_res[0] // self.down_ratio, self.input_res[1] // self.down_ratio)


@dataclass(frozen=True)
class TrainConfig:
    """Training config (ref: lib/opts_parallel.py:157-193, train_scripts.sh)."""

    lr: float = 1.25e-4
    num_epochs: int = 20
    batch_size_per_device: int = 4
    warmup_iters: int = 3000  # linear warmup (ref: trainer_parallel.py:219-231)
    poly_power: float = 1.0  # poly decay to max_iters
    seed: int = 317
    # Prior heatmap fault-injection curriculum (ref: train_scripts.sh:5-7)
    hm_disturb: float = 0.75
    lost_disturb: float = 0.2
    # fp_disturb mirrors the reference FLAG (opts_parallel.py:261, shipped at
    # 0.1) but is INERT by default, like the reference's live renderer: the
    # false-positive block in get_prev_hm is commented out
    # (utilities.py:999-1005), and the only implementation that applies it
    # (get_prev_ori_hm, utilities.py:1102) has zero call sites. Set
    # fp_disturb_active=True to opt into the documented deviation that
    # actually injects false positives (PARITY.md).
    fp_disturb: float = 0.1
    fp_disturb_active: bool = False
    # Loss weights (ref: trainer_parallel.py:102-104)
    hm_weight: float = 1.0
    reg_weight: float = 0.01
    tracking_weight: float = 0.0
    # checkpointing
    ckpt_dir: str = "ckpt"
    save_every_epochs: int = 1
    seq_frame: int = 3  # sequence window remap (ref: datasets.py:63-91)


@dataclass(frozen=True)
class InferConfig:
    """Inference config (ref: lib/opts_parallel.py:254-272, sgta_detector.py)."""

    out_thresh: float = 0.1
    peak_thresh: float = 0.01  # min blurred-map intensity for a peak
    peak_sigma: float = 3.0  # gaussian blur before local-max
    peak_offset: float = 0.4395  # offset_due_to_upsampling (ref: utils.py:212)
    ambiguity_gap: float = 0.25  # 2-peak score-gap acceptance rule
    max_peaks: int = 8  # static candidate-peak budget per class
    lm_refine: bool = True  # --rf weighted LM pose refinement
    sentinel: float = -999.999  # missing-detection marker (ref semantics)
    # peak ambiguity ordering: "score" (the evident intent) or "y" (the
    # reference's exact sort-by-subpixel-y behavior — use for checkpoint-
    # parity evaluation; see decode/peaks.py module docstring)
    ref_sort: str = "score"
    # final sub-pixel coordinate estimator: "reg" (reference cts_wreg parity),
    # "avg" (DREAM windowed average), "logquad" (log-parabola on the blurred
    # map — exact for gaussian peaks), "mean" (reg+logquad average). Measured
    # A/B in docs/PERF.md; "reg" stays the parity default.
    decode_coord: str = "reg"
    # streaming fast path: warm-start the per-frame prior PnP from the
    # previous frame's solved pose instead of a fresh DLT (eigh/svd) init
    # (same objective + success gate; the reference re-inits via cv2 EPnP
    # every frame). Off by default for exact parity.
    pnp_warm_start: bool = False


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for pjit data-parallel training (replaces torch DDP/NCCL).

    The reference's only parallelism is data-parallel DDP over NCCL
    (ref: train.py:179, trainer_parallel.py:141-151). TPU-native equivalent:
    a 1-D mesh with a "data" axis; gradients are psum'd over ICI by pjit.
    """

    data_axis: str = "data"
    # if None, use all visible devices
    num_devices: Optional[int] = None


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    robot: str = "panda_synthetic"

    @property
    def keypoint_names(self) -> Sequence[str]:
        return KEYPOINT_NAMES[self.robot]

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def default_config() -> Config:
    return Config()
