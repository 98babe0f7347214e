"""Training phase dispatch (ref trainer_parallel.py:234-298 run_epoch's
phase-conditional forwards + Loss.forward's phase branch :88-127).

A phase names (a) which batch tensors feed the model and (b) which loss
terms apply:

  PlanA_win     flagship 6-input temporal model (the shipping config)
  PlanA_three   9-input three-frame variant
  PlanA         global-attention variant (dlapa): img pair + 1-ch priors
  PlanACAT      concat baseline: same 4-input wiring as PlanA
  ablation_shared_repro / ablation_shared / ablation_wo_shared
                DLA_PlanAAblation wirings (ref dla.py:1198-1240)
  CenterTrack   single-trunk (img, pre_img, noised prev-GT prior)
  CenterNet     single-frame, no priors
  Dream         DREAM baseline, heatmap loss only
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

PHASES = (
    "PlanA_win", "PlanA_three", "PlanA", "PlanACAT",
    "ablation_shared_repro", "ablation_shared", "ablation_wo_shared",
    "CenterTrack", "CenterNet", "Dream",
)


def model_inputs(phase: str, batch: Dict) -> Tuple:
    """Positional model inputs for the phase (ref run_epoch dispatch +
    sgta_detector.py:881-907 process dispatch)."""
    if phase == "PlanA_win":
        return (
            batch["cur_img"], batch["pre_img"], batch["pre_hm"],
            batch["repro_hm"], batch["pre_hm_cls"], batch["repro_hm_cls"],
        )
    if phase == "PlanA_three":
        return (
            batch["cur_img"], batch["ppre_img"], batch["pre_img"],
            batch["ppre_hm"], batch["pre_hm"], batch["repro_hm"],
            batch["ppre_hm_cls"], batch["pre_hm_cls"], batch["repro_hm_cls"],
        )
    if phase in ("PlanA", "PlanACAT", "ablation_shared_repro"):
        return (
            batch["cur_img"], batch["pre_img"], batch["pre_hm"],
            batch["repro_hm"],
        )
    if phase in ("ablation_shared", "ablation_wo_shared"):
        # our ablation module takes (cur, pre, pre_hm, repro_hm) positionally
        # and ignores repro_hm in these modes (the reference passes 3 args)
        return (
            batch["cur_img"], batch["pre_img"], batch["pre_hm"],
            batch["repro_hm"],
        )
    if phase == "CenterTrack":
        return (batch["cur_img"], batch["pre_img"], batch["pre_origin_hm"])
    if phase == "CenterNet":
        return (batch["cur_img"],)
    if phase == "Dream":
        return (batch["cur_img"],)
    raise ValueError(f"unknown phase: {phase}")


def input_names(phase: str) -> Tuple[str, ...]:
    """Batch keys consumed as model inputs (for bf16 casting)."""
    return {
        "PlanA_win": (
            "cur_img", "pre_img", "pre_hm", "repro_hm", "pre_hm_cls",
            "repro_hm_cls",
        ),
        "PlanA_three": (
            "cur_img", "ppre_img", "pre_img", "ppre_hm", "pre_hm", "repro_hm",
            "ppre_hm_cls", "pre_hm_cls", "repro_hm_cls",
        ),
        "PlanA": ("cur_img", "pre_img", "pre_hm", "repro_hm"),
        "PlanACAT": ("cur_img", "pre_img", "pre_hm", "repro_hm"),
        "ablation_shared_repro": ("cur_img", "pre_img", "pre_hm", "repro_hm"),
        "ablation_shared": ("cur_img", "pre_img", "pre_hm", "repro_hm"),
        "ablation_wo_shared": ("cur_img", "pre_img", "pre_hm", "repro_hm"),
        "CenterTrack": ("cur_img", "pre_img", "pre_origin_hm"),
        "CenterNet": ("cur_img",),
        "Dream": ("cur_img",),
    }[phase]


def loss_weights(phase: str, hm=1.0, reg=0.01, tracking=0.0) -> Dict[str, float]:
    """Per-head loss weights (ref Loss.forward: Dream = hm only,
    others hm=1/reg=0.01/tracking=0)."""
    if phase == "Dream":
        return {"hm_weight": hm, "reg_weight": 0.0, "tracking_weight": 0.0}
    return {"hm_weight": hm, "reg_weight": reg, "tracking_weight": tracking}
