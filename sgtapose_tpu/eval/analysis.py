"""Analysis orchestration: dataset-level evaluation + artifacts.

Rebuild of ref sgtapose/analysis.py's analyze_ndds_center_dream_dataset
(:601-1071) on top of eval/metrics.py, plus the multiframe PnP capability
(:95-599 solve_multiframe_pnp[_real]).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from sgtapose_tpu.core import pnp
from sgtapose_tpu.eval import metrics


def analyze_sequence_results(
    detections: np.ndarray,
    gt_projs: np.ndarray,
    gt_pos_cam: np.ndarray,
    camera_K: np.ndarray,
    image_resolution: Tuple[int, int],
    output_dir: Optional[str] = None,
    set_name: str = "eval",
    sample_names: Optional[Sequence[str]] = None,
    rf: bool = True,
    syn: bool = False,
) -> Dict[str, Dict]:
    """Full eval of one set: keypoint metrics + per-frame PnP/ADD + artifacts.

    detections/gt_projs: (F, K, 2) raw-pixel coords (sentinel < -999 for
    missing detections); gt_pos_cam: (F, K, 3) camera-frame GT positions.
    """
    F, K, _ = detections.shape
    det_flat = detections.reshape(F * K, 2)
    gt_flat = gt_projs.reshape(F * K, 2)

    kp_m = metrics.keypoint_metrics(
        det_flat, gt_flat, image_resolution, syn=syn
    )
    adds, succ = metrics.compute_add_batch(
        detections, gt_projs, gt_pos_cam, camera_K, rf=rf
    )
    n_inframe = metrics.count_inframe_gt(gt_projs, image_resolution)
    pnp_m = metrics.pnp_metrics(adds, n_inframe)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        names = sample_names or [f"{set_name}_{i:06d}" for i in range(F)]
        metrics.write_keypoints_csv(
            os.path.join(output_dir, f"{set_name}_keypoints.csv"),
            names, detections, gt_projs,
        )
        metrics.write_pnp_csv(
            os.path.join(output_dir, f"{set_name}_pnp_results.csv"),
            names, succ.tolist(), adds.tolist(), n_inframe.tolist(),
        )
        metrics.write_analysis_results(
            os.path.join(output_dir, f"{set_name}_analysis_results.txt"),
            kp_m, pnp_m,
        )
    return {"keypoint_metrics": kp_m, "pnp_metrics": pnp_m, "adds": adds}


def solve_multiframe_pnp(
    detections: np.ndarray,
    x3d: np.ndarray,
    camera_K: np.ndarray,
    window: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Multi-frame PnP: stack a sliding window of frames' valid (2D, 3D)
    pairs into one solve — more correspondences, steadier pose.

    Capability port of ref analysis.py:316-599 solve_multiframe_pnp (which
    additionally subsamples random keypoint combinations; we use the full
    valid stack — same estimator family, deterministic).

    detections: (F, K, 2) with sentinels; x3d: (F, K, 3) (static scene:
    identical rows when the robot doesn't move). Returns (quats (F,4),
    trans (F,3)); frames with < 4 valid stacked pairs yield success=False
    poses (identity/zero).
    """
    F, K, _ = detections.shape
    quats = np.zeros((F, 4), np.float32)
    transs = np.zeros((F, 3), np.float32)
    for f in range(F):
        lo = max(0, f - window + 1)
        det_w = detections[lo : f + 1].reshape(-1, 2)
        x3d_w = x3d[lo : f + 1].reshape(-1, 3)
        valid = np.all(det_w > metrics.PNP_MAGIC, axis=1)
        res = pnp.solve_pnp(
            jnp.asarray(x3d_w, jnp.float32),
            jnp.asarray(det_w, jnp.float32),
            jnp.asarray(camera_K, jnp.float32),
            jnp.asarray(valid),
        )
        quats[f] = np.asarray(res.quat)
        transs[f] = np.asarray(res.trans)
    return quats, transs
