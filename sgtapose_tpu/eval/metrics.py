"""Evaluation metric harness: PCK / keypoint L2 AUC, PnP ADD AUC, CSVs.

Numerically-exact rebuild of ref sgtapose/analysis.py:
  * keypoint_metrics (:1640-1739): in/out-frame found/missing buckets, L2
    stats over found in-frame keypoints, PCK AUC at 12 px via 0.01-px
    trapezoid, `syn` mode's 140 px horizontal gap (640->480 center crop)
  * pnp_metrics (:1742-1793): ADD stats over PnP-successful frames, ADD AUC
    at 0.06 m via 1e-5 trapezoid, viable = >=4 in-frame GT keypoints
  * per-frame ADD computation (:771-906): PnP on the detected subset against
    GT camera-frame 3D positions; optional weighted LM refinement (--rf) with
    w = exp(-5 d^2) and add = min(refined, pnp)

Aggregation is numpy (host, exactness); the per-frame PnP + LM solves are
batched JAX on device.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from sgtapose_tpu.core import geometry, pnp

PNP_MAGIC = -999.0

# np.trapezoid is NumPy >= 2.0; fall back to the old name on 1.x installs.
_trapezoid = getattr(np, "trapezoid", None) or np.trapz


def keypoint_metrics(
    keypoints_detected: np.ndarray,
    keypoints_gt: np.ndarray,
    image_resolution: Tuple[int, int],
    auc_pixel_threshold: float = 12.0,
    syn: bool = False,
) -> Dict[str, object]:
    """detected/gt: (N, 2) raw-pixel coords over ALL frames*keypoints;
    detections below -999 are 'missing'. image_resolution: (w, h)."""
    det = np.asarray(keypoints_detected, np.float64)
    gt = np.asarray(keypoints_gt, np.float64)
    gap = 140.0 if syn else 0.0
    res = np.asarray(image_resolution)
    if res.ndim == 1:
        w, h = res  # one resolution for the whole set
    else:
        # per-row (w, h) — mixed-resolution sets (shape (N, 2))
        w, h = res[:, 0], res[:, 1]

    out_of_frame = (
        (gt[:, 0] < gap)
        | (gt[:, 0] > w - gap)
        | (gt[:, 1] < 0.0)
        | (gt[:, 1] > h)
    )
    missing = (det[:, 0] < -999.0) & (det[:, 1] < -999.0)

    num_gt_outframe = int(out_of_frame.sum())
    num_missing_gt_outframe = int((out_of_frame & missing).sum())
    num_found_gt_outframe = int((out_of_frame & ~missing).sum())
    num_gt_inframe = int((~out_of_frame).sum())
    num_missing_gt_inframe = int((~out_of_frame & missing).sum())
    found_in = ~out_of_frame & ~missing
    num_found_gt_inframe = int(found_in.sum())

    if num_found_gt_inframe > 0:
        errs = np.linalg.norm(det[found_in] - gt[found_in], axis=1)
        mean, med, std = float(errs.mean()), float(np.median(errs)), float(errs.std())
        delta = 0.01
        thresholds = np.arange(0, auc_pixel_threshold, delta)
        y = (errs[None, :] < thresholds[:, None]).sum(axis=1)
        auc = float(
            _trapezoid(y, dx=delta) / auc_pixel_threshold / num_gt_inframe
        )
    else:
        mean = med = std = auc = None

    return {
        "num_gt_outframe": num_gt_outframe,
        "num_missing_gt_outframe": num_missing_gt_outframe,
        "num_found_gt_outframe": num_found_gt_outframe,
        "num_gt_inframe": num_gt_inframe,
        "num_found_gt_inframe": num_found_gt_inframe,
        "num_missing_gt_inframe": num_missing_gt_inframe,
        "l2_error_mean_px": mean,
        "l2_error_median_px": med,
        "l2_error_std_px": std,
        "l2_error_auc": auc,
        "l2_error_auc_thresh_px": auc_pixel_threshold,
    }


def pnp_metrics(
    pnp_add: np.ndarray,
    num_inframe_projs_gt: np.ndarray,
    num_min_inframe_projs_gt_for_pnp: int = 4,
    add_auc_threshold: float = 0.06,
) -> Dict[str, object]:
    pnp_add = np.asarray(pnp_add, np.float64)
    n_inframe = np.asarray(num_inframe_projs_gt)
    found = pnp_add > PNP_MAGIC
    add_found = pnp_add[found]
    num_found = int(found.sum())
    num_possible = int((n_inframe >= num_min_inframe_projs_gt_for_pnp).sum())

    delta = 1e-5
    thresholds = np.arange(0.0, add_auc_threshold, delta)
    counts = (add_found[None, :] <= thresholds[:, None]).sum(axis=1) / max(
        float(num_possible), 1.0
    )
    auc = float(_trapezoid(counts, dx=delta) / add_auc_threshold)

    stats = lambda f: float(f(add_found)) if num_found else None
    return {
        "num_pnp_found": num_found,
        "num_pnp_not_found": num_possible - num_found,
        "num_pnp_possible": num_possible,
        "add_mean": stats(np.mean),
        "add_median": stats(np.median),
        "add_std": stats(np.std),
        "add_max": stats(np.max),
        "add_min": stats(np.min),
        "add_auc": auc,
        "add_auc_thresh": add_auc_threshold,
    }


# -----------------------------------------------------------------------------
# Per-frame ADD (batched on device)
# -----------------------------------------------------------------------------


def _frame_add(detected, gt_pos_cam, K_cam, rf: bool):
    """One frame (or stacked multiframe window): PnP on the detected subset +
    optional LM refine -> ADD. detected: (M, 2); gt_pos_cam: (M, 3).
    Returns (add, success)."""
    valid = jnp.all(detected > PNP_MAGIC, axis=1)
    res = pnp.solve_pnp(gt_pos_cam, detected, K_cam, valid)
    R = geometry.quat_to_matrix(res.quat)
    aligned = geometry.transform_points(gt_pos_cam, R, res.trans)
    err = jnp.linalg.norm(aligned - gt_pos_cam, axis=1)
    wsum = jnp.maximum(jnp.sum(valid), 1)
    add_pnp = jnp.sum(err * valid) / wsum  # mean over the detected subset

    if rf:
        # weights from SQUARED reprojection distance (ref analysis.py:826-842)
        proj = geometry.project_points(gt_pos_cam, R, res.trans, K_cam)
        d2 = jnp.sum((detected - proj) ** 2, axis=1)
        w = jnp.exp(-5.0 * d2)[:, None].repeat(2, axis=1)
        w = w * valid[:, None]
        q1, t1 = pnp.register_gn(detected, gt_pos_cam, res.quat, res.trans, w, K_cam)
        qn = q1 / jnp.maximum(jnp.linalg.norm(q1), 1e-12)
        finite = jnp.all(jnp.isfinite(q1)) & jnp.all(jnp.isfinite(t1))
        R1 = geometry.quat_to_matrix(jnp.where(finite, qn, res.quat))
        t1 = jnp.where(finite, t1, res.trans)
        aligned1 = geometry.transform_points(gt_pos_cam, R1, t1)
        err1 = jnp.linalg.norm(aligned1 - gt_pos_cam, axis=1)
        add_rf = jnp.sum(err1 * valid) / wsum
        add_pnp = jnp.minimum(add_pnp, add_rf)  # ref analysis.py:878

    add = jnp.where(res.success, add_pnp, -999.99)
    return add, res.success


# Module-level jit: keyed by (shapes, rf) in jax's cache, so repeated eval
# sweeps reuse the compiled 200-iter LM program instead of re-tracing a fresh
# wrapper every call.
_frame_add_batched = jax.jit(
    jax.vmap(_frame_add, in_axes=(0, 0, None, None)), static_argnums=(3,)
)


def compute_add_batch(
    detected: np.ndarray,
    gt_pos_cam: np.ndarray,
    camera_K: np.ndarray,
    rf: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """(F, M, 2), (F, M, 3) -> (adds (F,), successes (F,)). Rows may be
    stacked multiframe windows (M = multiframe * K)."""
    adds, succ = _frame_add_batched(
        jnp.asarray(detected, jnp.float32),
        jnp.asarray(gt_pos_cam, jnp.float32),
        jnp.asarray(camera_K, jnp.float32),
        rf,
    )
    return np.asarray(adds), np.asarray(succ)


def count_inframe_gt(gt_projs: np.ndarray, image_resolution) -> np.ndarray:
    """Per frame: number of strictly-in-frame GT projections
    (ref analysis.py:791-799). image_resolution: (w, h), or (F, 2) per-frame
    for mixed-resolution sets."""
    res = np.asarray(image_resolution)
    if res.ndim == 1:
        w, h = res
    else:
        w, h = res[:, 0][:, None], res[:, 1][:, None]
    inb = (
        (gt_projs[..., 0] > 0.0)
        & (gt_projs[..., 0] < w)
        & (gt_projs[..., 1] > 0.0)
        & (gt_projs[..., 1] < h)
    )
    return inb.sum(axis=-1)


# -----------------------------------------------------------------------------
# Artifact writers (ref analysis.py:1550-1637, :908-1056)
# -----------------------------------------------------------------------------


def write_keypoints_csv(path, names, detected, gt):
    """Per-keypoint CSV: name, kp index, detected xy, gt xy."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "keypoint", "det_x", "det_y", "gt_x", "gt_y"])
        for name, det_f, gt_f in zip(names, detected, gt):
            for k in range(len(det_f)):
                w.writerow([name, k, det_f[k][0], det_f[k][1], gt_f[k][0], gt_f[k][1]])


def write_pnp_csv(path, names, successes, adds, n_inframe):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "pnp_success", "add", "n_inframe_gt"])
        for row in zip(names, successes, adds, n_inframe):
            w.writerow(list(row))


def write_analysis_results(path, kp_metrics: Dict, pnp_results: Dict):
    """analysis_results.txt equivalent (ref analysis.py:908-1056)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("Keypoint metrics\n")
        for k, v in kp_metrics.items():
            f.write(f"  {k}: {v}\n")
        f.write("PnP metrics\n")
        for k, v in pnp_results.items():
            f.write(f"  {k}: {v}\n")
