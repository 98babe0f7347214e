"""Keypoint metadata loaders (host side, pure numpy + stdlib json).

Rebuilds of the reference loaders (which parse the .json files with a YAML
parser after tab-stripping — they're JSON; we use the json module):
  * load_seq_keypoints: synthetic NDDS format — per-keypoint
    `location_wrt_cam`, frame-level `R2C Mat` rotation; projections computed
    through K; robot-frame positions via the inverse camera-to-robot
    transform (ref sgtapose/utilities.py:665-729)
  * load_keypoints: DREAM-real format — `objects[0].keypoints` with
    `projected_location` (ref sgtapose/utilities.py:582-663)
  * load_camera_intrinsics (ref sgtapose/utilities.py:510-532)
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np


def _load_json(path: str):
    with open(path, "r") as f:
        return json.loads(f.read().replace("\t", " "))


def load_camera_intrinsics(camera_data_path: str) -> np.ndarray:
    data = _load_json(camera_data_path)
    s = data["camera_settings"][0]["intrinsic_settings"]
    return np.array(
        [[s["fx"], 0.0, s["cx"]], [0.0, s["fy"], s["cy"]], [0.0, 0.0, 1.0]]
    )


def load_image_resolution(camera_data_path: str):
    data = _load_json(camera_data_path)
    size = data["camera_settings"][0]["captured_image_size"]
    return (size["width"], size["height"])


def load_seq_keypoints(
    data_path: str, object_name: str, keypoint_names: Sequence[str], camera_K: np.ndarray
) -> Dict[str, np.ndarray]:
    """Synthetic sequence format. Returns dict of float64 arrays:
    projections (K,2), positions_wrt_cam (K,3), positions_wrt_robot (K,3)."""
    data = _load_json(data_path)[0]
    assert object_name == data["ROBOT NAME"], (object_name, data["ROBOT NAME"])
    kps = data["keypoints"]

    mat = np.array(kps[0]["R2C Mat"])  # robot->cam rotation
    inv = mat.T
    trans = np.array(kps[0]["location_wrt_cam"])

    by_name = {}
    # ordered scan mirroring the reference's monotone cursor (utilities.py:694-702)
    cursor = 0
    for name in keypoint_names:
        while kps[cursor]["Name"] != name:
            cursor += 1
        by_name[name] = kps[cursor]

    projections, pos_cam, pos_rob = [], [], []
    for name in keypoint_names:
        kp = by_name[name]
        p_cam = np.array(kp["location_wrt_cam"], dtype=np.float64)
        proj = camera_K @ p_cam
        proj = proj / proj[2]
        projections.append(proj[:2])
        pos_cam.append(p_cam)
        pos_rob.append(inv @ (p_cam - trans))

    return {
        "projections": np.array(projections),
        "positions_wrt_cam": np.array(pos_cam),
        "positions_wrt_robot": np.array(pos_rob),
    }


def load_keypoints(
    data_path: str, object_name: str, keypoint_names: Sequence[str]
) -> Dict[str, np.ndarray]:
    """DREAM-real format (panda-orb / 3cam sets)."""
    data = _load_json(data_path)
    object_names = [o["class"] for o in data["objects"]]
    obj = data["objects"][object_names.index(object_name)]
    kp_by_name = {kp["name"]: kp for kp in obj["keypoints"]}

    projections, pos_cam = [], []
    for name in keypoint_names:
        kp = kp_by_name[name]
        pos_cam.append(kp["location"])
        projections.append(kp.get("projected_location", [np.nan, np.nan]))
    return {
        "projections": np.array(projections, dtype=np.float64),
        "positions_wrt_cam": np.array(pos_cam, dtype=np.float64),
    }


def load_image(path: str) -> np.ndarray:
    """(H, W, 3) uint8 RGB."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def load_depth_keypoints(
    data_path: str, object_name: str, camera_K: np.ndarray
) -> Dict[str, np.ndarray]:
    """42-joint depth-variant format (ref sgtapose/utilities.py:731-776
    load_depth_keypoints): frame-level `R2C_mat` + `joints_3n_fixed_42`
    camera-frame positions; projections computed through K; robot-frame
    positions via the inverse camera-to-robot transform anchored at
    keypoint 0."""
    data = _load_json(data_path)[0]
    assert object_name == data["ROBOT NAME"], (object_name, data["ROBOT NAME"])
    kps = data["keypoints"]
    joints = data["joints_3n_fixed_42"]

    mat = np.array(kps[0]["R2C_mat"])
    inv = mat.T
    trans = np.array(kps[0]["location_wrt_cam"]).reshape(1, 3)

    pos_cam = np.array([j["location_wrt_cam"] for j in joints], dtype=np.float64)
    pos_rob = (inv @ (pos_cam - trans).T).T
    proj = (camera_K @ pos_cam.T).T
    proj = proj[:, :2] / proj[:, 2:3]
    return {
        "projections": proj,
        "positions_wrt_cam": pos_cam,
        "positions_wrt_robot": pos_rob,
    }


def load_x3d(data_path: str, object_name: str, keypoint_names) -> np.ndarray:
    """Camera-frame 3D keypoint positions only (ref utilities.py:17-44
    load_x3d/load_depth_x3d behavior for the detector's prior PnP)."""
    kp = load_seq_keypoints(data_path, object_name, keypoint_names, np.eye(3))
    return kp["positions_wrt_cam"]
