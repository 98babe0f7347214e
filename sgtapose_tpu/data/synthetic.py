"""Synthetic sequence generator: random camera-to-robot poses + a fixed robot
keypoint skeleton, rendered as blob images. Used by tests and bench (the
container ships no dataset); also a smoke model of the reference's synthetic
franka_data distribution (640x360 raws, K = SYNTHETIC_CAMERA_K).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sgtapose_tpu.config import SYNTHETIC_CAMERA_K
from sgtapose_tpu.core import geometry
from sgtapose_tpu.data.pipeline import RawSample

RAW_H, RAW_W = 360, 640

# a panda-ish 7-keypoint chain in the robot frame (meters)
SKELETON = jnp.array(
    [
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.333],
        [0.0, -0.1, 0.45],
        [0.08, -0.1, 0.6],
        [0.08, 0.05, 0.75],
        [0.0, 0.1, 0.85],
        [0.0, 0.12, 0.95],
    ],
    jnp.float32,
)


def robot_skeleton(n_kp: int) -> jnp.ndarray:
    """Skeleton for an n-keypoint robot: the panda chain, linearly
    re-sampled to n points (kuka has 9 keypoints, ur5e 8 — ref
    opts_parallel.py:439-475 get_keypoint_names)."""
    if n_kp == SKELETON.shape[0]:
        return SKELETON
    seg = jnp.linspace(0.0, SKELETON.shape[0] - 1.0, n_kp)
    lo = jnp.clip(jnp.floor(seg).astype(jnp.int32), 0, SKELETON.shape[0] - 2)
    frac = (seg - lo)[:, None]
    return SKELETON[lo] * (1 - frac) + SKELETON[lo + 1] * frac


def camera_K() -> jnp.ndarray:
    return jnp.asarray(SYNTHETIC_CAMERA_K, jnp.float32)


def random_pose(rng: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-from-robot pose with the robot in front of the camera.

    The translation is chosen so the SKELETON's centroid (not its base) sits
    on the optical axis at ~2.15-2.65 m: with the arm spanning ~±0.55 m of
    its centroid this keeps all keypoints inside the 640x360 frame for the
    vast majority of poses (the previous base-anchored 1.8 m placement left
    the distal 3 keypoints out of frame in 33-46% of poses, starving both
    training and PnP of those classes)."""
    k1, k2 = jax.random.split(rng)
    q = jax.random.normal(k1, (4,))
    q = q / jnp.linalg.norm(q)
    centroid = jnp.mean(SKELETON, axis=0)
    R = geometry.quat_to_matrix(q)
    depth = jnp.array([0.0, 0.0, 2.4]) + jax.random.uniform(
        k2, (3,), minval=-0.25, maxval=0.25
    ) * jnp.array([2.6, 2.8, 1.0])  # lateral spread leaves ~5-10% of distal
    # keypoints out of frame so the clip/missing-detection paths stay exercised
    t = depth - R @ centroid
    return q, t


def render_frame(projs: jnp.ndarray) -> jnp.ndarray:
    """Blob image: one bright gaussian per keypoint on a dark background.
    (H_raw, W_raw, 3) float in [0, 255]."""
    n = projs.shape[0]
    conf = jnp.ones((n,), jnp.float32)
    hm = geometry.render_gaussian_heatmap(projs, conf, RAW_H, RAW_W, radius=8, sigma=3.0)
    per = geometry.render_gaussian_heatmap(
        projs, conf, RAW_H, RAW_W, radius=8, sigma=3.0, per_class=True
    )
    # color-code keypoints so the net can tell them apart: maximally
    # separated RGB corners (a hue ramp left adjacent classes too similar
    # for shallow/frozen-trunk probes to distinguish)
    palette = jnp.array(
        [
            [255.0, 40.0, 40.0],
            [40.0, 255.0, 40.0],
            [40.0, 80.0, 255.0],
            [255.0, 255.0, 40.0],
            [255.0, 40.0, 255.0],
            [40.0, 255.0, 255.0],
            [255.0, 255.0, 255.0],
            [255.0, 140.0, 40.0],
            [140.0, 40.0, 255.0],
        ],
        jnp.float32,
    )
    if n <= palette.shape[0]:
        colors = palette[:n]
    else:
        # many-keypoint variants (e.g. the 42-joint depth dataset): cycle the
        # palette with a brightness ramp so every class stays distinct-ish
        reps = -(-n // palette.shape[0])
        scales = jnp.linspace(1.0, 0.45, reps)
        colors = jnp.concatenate(
            [palette * s for s in scales], axis=0
        )[:n]
    img = jnp.einsum("khw,kc->hwc", per, colors)
    return jnp.clip(img + 20.0, 0.0, 255.0)


def make_sequence(
    rng: jax.Array,
    num_frames: int = 2,
    return_pos_cam: bool = False,
    n_kp: int | None = None,
):
    """Simulate a short video: smooth camera motion over a static robot.
    Returns (projs (T,K,2), imgs (T,H,W,3)) and, with return_pos_cam, also
    the camera-frame keypoint positions (T,K,3) for ADD evaluation.
    n_kp selects the robot config (default: the 7-kp panda chain)."""
    skel = SKELETON if n_kp is None else robot_skeleton(n_kp)
    k_pose, k_vel = jax.random.split(rng)
    q0, t0 = random_pose(k_pose)
    dq = jax.random.normal(jax.random.fold_in(k_vel, 0), (4,)) * 0.01
    dt = jax.random.normal(jax.random.fold_in(k_vel, 1), (3,)) * 0.01
    K = camera_K()

    projs, imgs, pos = [], [], []
    for f in range(num_frames):
        q = q0 + dq * f
        q = q / jnp.linalg.norm(q)
        t = t0 + dt * f
        R = geometry.quat_to_matrix(q)
        p = geometry.project_points(skel, R, t, K)
        projs.append(p)
        imgs.append(render_frame(p))
        pos.append(geometry.transform_points(skel, R, t))
    if return_pos_cam:
        return jnp.stack(projs), jnp.stack(imgs), jnp.stack(pos)
    return jnp.stack(projs), jnp.stack(imgs)


def make_raw_batch(rng: jax.Array, batch_size: int) -> RawSample:
    """Batch of (prev, next) synthetic frame pairs."""
    rngs = jax.random.split(rng, batch_size)

    def one(r):
        projs, imgs = make_sequence(r, 2)
        return RawSample(
            prev_img=imgs[0],
            next_img=imgs[1],
            prev_projs=projs[0],
            next_projs=projs[1],
            prev_x3d_rob=SKELETON,
            next_x3d_rob=SKELETON,
        )

    return jax.vmap(one)(rngs)


# -----------------------------------------------------------------------------
# On-disk synthetic dataset (NDDS-seq format the loaders understand)
# -----------------------------------------------------------------------------


def write_synthetic_dataset(
    out_dir: str,
    n_videos: int = 2,
    n_frames: int = 4,
    seed: int = 0,
    robot_name: str = "panda_synthetic",
):
    """Write NNNN_color.png + NNNN_meta.json videos in the synthetic format
    (per-keypoint location_wrt_cam + frame-level 'R2C Mat' — the structure
    ref utilities.py:665-729 parses). The robot frame is anchored at
    keypoint 0, so 'location_wrt_cam' of keypoint 0 doubles as the frame
    translation, exactly like the reference data."""
    import json
    import os

    import numpy as np
    from PIL import Image

    from sgtapose_tpu.config import KEYPOINT_NAMES

    K = np.asarray(SYNTHETIC_CAMERA_K)
    base = robot_name.replace("_synthetic", "")
    kp_names = KEYPOINT_NAMES.get(
        robot_name, KEYPOINT_NAMES.get(base, KEYPOINT_NAMES["panda_synthetic"])
    )
    skeleton = robot_skeleton(len(kp_names))
    rng = jax.random.PRNGKey(seed)
    for v in range(n_videos):
        vdir = os.path.join(out_dir, f"{v:05d}")
        os.makedirs(vdir, exist_ok=True)
        rv = jax.random.fold_in(rng, v)
        q0, t0 = random_pose(rv)
        dq = jax.random.normal(jax.random.fold_in(rv, 1), (4,)) * 0.01
        dt = jax.random.normal(jax.random.fold_in(rv, 2), (3,)) * 0.01
        for f in range(n_frames):
            q = q0 + dq * f
            q = q / jnp.linalg.norm(q)
            t = t0 + dt * f
            R = geometry.quat_to_matrix(q)
            pos_cam = np.asarray(geometry.transform_points(skeleton, R, t))
            projs = np.asarray(geometry.project_points(skeleton, R, t, jnp.asarray(K, jnp.float32)))
            img = np.asarray(render_frame(jnp.asarray(projs))).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(vdir, f"{f:04d}_color.png"))
            meta = [
                {
                    "ROBOT NAME": robot_name,
                    "keypoints": [
                        {
                            "Name": name,
                            "location_wrt_cam": pos_cam[i].tolist(),
                            "R2C Mat": np.asarray(R).tolist(),
                        }
                        for i, name in enumerate(kp_names)
                    ],
                }
            ]
            with open(os.path.join(vdir, f"{f:04d}_meta.json"), "w") as fp:
                json.dump(meta, fp)


def write_real_dataset(
    out_dir: str,
    set_name: str = "panda-test",
    n_videos: int = 1,
    n_frames: int = 3,
    seed: int = 0,
):
    """Write a DREAM-real-format set: {set}/XXXXXX.rgb.png + .json with
    objects[0].keypoints (location + projected_location), _camera_settings
    .json, and dream_real_info/{set}_split_info.json (img_paths/json_paths
    per video) — the structure ref inference.py:186-231 consumes."""
    import json
    import os

    import numpy as np
    from PIL import Image

    from sgtapose_tpu.config import KEYPOINT_NAMES

    K = np.asarray(SYNTHETIC_CAMERA_K)
    kp_names = KEYPOINT_NAMES["panda"]
    set_dir = os.path.join(out_dir, set_name)
    info_dir = os.path.join(out_dir, "dream_real_info")
    os.makedirs(set_dir, exist_ok=True)
    os.makedirs(info_dir, exist_ok=True)

    with open(os.path.join(set_dir, "_camera_settings.json"), "w") as f:
        json.dump(
            {
                "camera_settings": [
                    {
                        "intrinsic_settings": {
                            "fx": K[0, 0], "fy": K[1, 1],
                            "cx": K[0, 2], "cy": K[1, 2],
                        },
                        "captured_image_size": {"width": RAW_W, "height": RAW_H},
                    }
                ]
            },
            f,
        )

    rng = jax.random.PRNGKey(seed)
    img_paths, json_paths = [], []
    idx = 0
    for v in range(n_videos):
        rv = jax.random.fold_in(rng, v)
        q0, t0 = random_pose(rv)
        dq = jax.random.normal(jax.random.fold_in(rv, 1), (4,)) * 0.01
        dt = jax.random.normal(jax.random.fold_in(rv, 2), (3,)) * 0.01
        v_imgs, v_jsons = [], []
        for f_i in range(n_frames):
            q = q0 + dq * f_i
            q = q / jnp.linalg.norm(q)
            t = t0 + dt * f_i
            R = geometry.quat_to_matrix(q)
            pos_cam = np.asarray(geometry.transform_points(SKELETON, R, t))
            projs = np.asarray(
                geometry.project_points(SKELETON, R, t, jnp.asarray(K, jnp.float32))
            )
            img = np.asarray(render_frame(jnp.asarray(projs))).astype(np.uint8)
            img_name = f"{idx:06d}.rgb.png"
            js_name = f"{idx:06d}.json"
            Image.fromarray(img).save(os.path.join(set_dir, img_name))
            blob = {
                "objects": [
                    {
                        "class": "panda",
                        "keypoints": [
                            {
                                "name": name,
                                "location": pos_cam[i].tolist(),
                                "projected_location": projs[i].tolist(),
                            }
                            for i, name in enumerate(kp_names)
                        ],
                    }
                ]
            }
            with open(os.path.join(set_dir, js_name), "w") as fp:
                json.dump(blob, fp)
            v_imgs.append(img_name)
            v_jsons.append(js_name)
            idx += 1
        img_paths.append(v_imgs)
        json_paths.append(v_jsons)

    with open(os.path.join(info_dir, f"{set_name}_split_info.json"), "w") as f:
        json.dump({"img_paths": img_paths, "json_paths": json_paths}, f)


def skeleton_42() -> jnp.ndarray:
    """42-joint depth-variant skeleton: the 7-keypoint chain densified by
    linear interpolation (6 segments x 7 points), mirroring the reference's
    `joints_3n_fixed_42` joint cloud density (ref utilities.py:731-776)."""
    pts = []
    for i in range(6):
        a, b = SKELETON[i], SKELETON[i + 1]
        for s in range(7):
            pts.append(a + (b - a) * (s / 7.0))
    return jnp.stack(pts)  # (42, 3)


def write_depth_dataset(
    out_dir: str,
    set_name: str = "panda-depth",
    n_frames: int = 4,
    seed: int = 0,
    robot_name: str = "Franka_Emika_Panda",
):
    """Write the 42-joint depth-variant format (flat {set}/NNNN.png + .json,
    ref inference.py:407-423 globbing): each json carries keypoints[0] with
    `R2C_mat` + `location_wrt_cam` (the camera->robot anchor) and
    `joints_3n_fixed_42` camera-frame positions — the structure
    ref utilities.py:731-776 load_depth_keypoints parses."""
    import json
    import os

    import numpy as np
    from PIL import Image

    K = np.asarray(SYNTHETIC_CAMERA_K)
    joints = skeleton_42()
    set_dir = os.path.join(out_dir, set_name)
    os.makedirs(set_dir, exist_ok=True)
    rng = jax.random.PRNGKey(seed)
    q0, t0 = random_pose(rng)
    dq = jax.random.normal(jax.random.fold_in(rng, 1), (4,)) * 0.01
    dt = jax.random.normal(jax.random.fold_in(rng, 2), (3,)) * 0.01
    for f in range(n_frames):
        q = q0 + dq * f
        q = q / jnp.linalg.norm(q)
        t = t0 + dt * f
        R = geometry.quat_to_matrix(q)
        pos_cam = np.asarray(geometry.transform_points(joints, R, t))
        projs = np.asarray(
            geometry.project_points(joints, R, t, jnp.asarray(K, jnp.float32))
        )
        img = np.asarray(render_frame(jnp.asarray(projs))).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(set_dir, f"{f:04d}.png"))
        anchor_cam = np.asarray(geometry.transform_points(SKELETON[:1], R, t))[0]
        meta = [
            {
                "ROBOT NAME": robot_name,
                "keypoints": [
                    {
                        "Name": "Link0",
                        "R2C_mat": np.asarray(R).tolist(),
                        "location_wrt_cam": anchor_cam.tolist(),
                    }
                ],
                "joints_3n_fixed_42": [
                    {"location_wrt_cam": pos_cam[i].tolist()}
                    for i in range(pos_cam.shape[0])
                ],
            }
        ]
        with open(os.path.join(set_dir, f"{f:04d}.json"), "w") as fp:
            json.dump(meta, fp)
