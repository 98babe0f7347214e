"""Training losses.

Rebuild of ref lib/trainer_parallel.py:22-127:
  * heatmap: MSE between clamped sigmoid(hm logits) and GT belief maps
  * reg / tracking: SmoothL1 between head outputs GATHERED AT THE GT INTEGER
    KEYPOINT PIXELS and their targets — the reference does this with O(B*K)
    python loops (trainer_parallel.py:34-40); here it's one vmapped gather
  * weights: hm=1, reg=0.01, tracking=0.0 (ref :102-104)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def clamped_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """sigmoid clamped to [1e-4, 1 - 1e-4] (ref lib/model/utils.py:15-17)."""
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1.0 - 1e-4)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.SmoothL1Loss (beta=1, mean reduction)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def gather_at_keypoints(feat: jnp.ndarray, coords_int: jnp.ndarray) -> jnp.ndarray:
    """feat: (B, H, W, 2); coords_int: (B, K, 2) int (x, y) -> (B, K, 2)."""

    def one(f, c):
        return f[c[:, 1], c[:, 0]]

    return jax.vmap(one)(feat, coords_int)


def sgta_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    hm_weight: float = 1.0,
    reg_weight: float = 0.01,
    tracking_weight: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch must provide:
      gt_belief_maps     (B, H/4, W/4, C)  GT per-class heatmaps
      kp_int             (B, K, 2) int32   GT integer keypoint pixels (clipped)
      reg_target         (B, K, 2)         sub-pixel residual (float - int)
      tracking_target    (B, K, 2)         prev - next_int displacement
    """
    hm = clamped_sigmoid(outputs["hm"])
    hm_loss = jnp.mean((hm - batch["gt_belief_maps"]) ** 2)

    if "reg" in outputs:
        reg_pred = gather_at_keypoints(outputs["reg"], batch["kp_int"])
        reg_loss = smooth_l1(reg_pred, batch["reg_target"])
    else:  # Dream phase: heatmap-only network (ref Loss.forward :89-97)
        reg_loss = jnp.float32(0.0)

    if "tracking" in outputs:
        trk_pred = gather_at_keypoints(outputs["tracking"], batch["kp_int"])
        tracking_loss = smooth_l1(trk_pred, batch["tracking_target"])
    else:
        tracking_loss = jnp.float32(0.0)

    total = hm_weight * hm_loss + reg_weight * reg_loss + tracking_weight * tracking_loss
    return total, {
        "tot": total,
        "hm": hm_loss,
        "reg": reg_loss,
        "tracking": tracking_loss,
    }
