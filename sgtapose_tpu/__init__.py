"""sgtapose_tpu — TPU-native framework for camera-to-robot pose estimation from
image sequences (structure-prior guided temporal attention).

A from-scratch JAX/Flax/Pallas re-design of the capabilities of the reference
SGTAPose system (CVPR'23): sequential RGB frames of a robot arm + forward
kinematics -> 2D keypoint detection -> PnP camera-to-robot 6-DoF pose, with a
temporal structure prior (previous frame's pose reprojects the next frame's 3D
keypoints as a conditioning heatmap) and top-k windowed temporal cross-attention.

Everything on the compute path is JAX (jit/vmap/scan/pjit); data-parallel
training runs over a `jax.sharding.Mesh`; hot ops (deformable conv sampling)
have Pallas TPU kernels with pure-XLA fallbacks.

Layer map (mirrors reference SURVEY.md §1):
  core/      geometry + PnP/LM solvers          (ref: sgtapose/geometric_vision.py,
             utilities.py, rf_tools/LM.py — rebuilt as batched JAX)
  data/      dataset discovery, loaders, on-device augmentation + prior pipeline
  models/    DLA-34 backbone, deformable decoder, temporal cross-attention, heads
  decode/    on-device peak finding + sub-pixel decode
  train/     loss, LR schedule, pjit data-parallel trainer, checkpointing
  infer/     scan-based streaming detector
  eval/      PCK / ADD AUC metric harness
  parallel/  mesh + sharding helpers
"""

__version__ = "0.1.0"

from sgtapose_tpu import config  # noqa: F401
