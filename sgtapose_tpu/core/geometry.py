"""Core geometry: affine transforms, image warps, Gaussian heatmap rendering,
quaternions, camera projection.

Pure JAX, fully vmappable, static shapes. Rebuilt TPU-first from the behavioral
spec of the reference's numpy/cv2 code:
  - affine transform construction    (ref: sgtapose/utilities.py:889-926)
  - point transforms + clipping      (ref: sgtapose/utilities.py:928-983)
  - image warp (cv2.warpAffine)      (ref: sgtapose/utilities.py:879-887)
  - Gaussian heatmap splats          (ref: sgtapose/utilities.py:800-853,
                                          985-1134 — per-keypoint numpy loops
                                          replaced by one vectorized max-reduce)
  - quaternion/projection utilities  (ref: sgtapose/geometric_vision.py:341-359,
                                          rf_tools/LM.py:93-122)

Conventions: quaternions are (w, x, y, z); image coordinates are (x, y) with
x along width; heatmaps are (H, W); images are NHWC.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# -----------------------------------------------------------------------------
# Affine transforms
# -----------------------------------------------------------------------------


def _third_point(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Third triangle point: b + perp(a - b). (ref: utilities.py:924-926)"""
    d = a - b
    return b + jnp.stack([-d[1], d[0]])


def get_affine_transform(
    center,
    scale,
    rot_deg,
    output_size: Tuple[int, int],
    shift=(0.0, 0.0),
    inv: bool = False,
) -> jnp.ndarray:
    """2x3 affine matrix mapping a square crop of the source image (centered at
    `center`, side `scale`, rotated `rot_deg`) onto `output_size` (w, h).

    Behavioral mirror of ref utilities.py:889-922 (which calls
    cv2.getAffineTransform on 3 point pairs); here we solve the 3-point system
    in closed form so it jits/vmaps.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    if scale.ndim == 0:
        scale = jnp.stack([scale, scale])
    shift = jnp.asarray(shift, jnp.float32)
    dst_w, dst_h = output_size[0], output_size[1]

    rot = jnp.deg2rad(jnp.asarray(rot_deg, jnp.float32))
    sn, cs = jnp.sin(rot), jnp.cos(rot)
    src_w = scale[0]
    # direction of "up" rotated by rot (ref get_dir of [0, -src_w/2])
    src_dir = jnp.stack([src_w * 0.5 * sn, -src_w * 0.5 * cs])
    dst_dir = jnp.array([0.0, -0.5 * dst_w], jnp.float32)

    src0 = center + scale * shift
    src1 = center + src_dir + scale * shift
    src2 = _third_point(src0, src1)
    dst0 = jnp.array([dst_w * 0.5, dst_h * 0.5], jnp.float32)
    dst1 = dst0 + dst_dir
    dst2 = _third_point(dst0, dst1)

    src = jnp.stack([src0, src1, src2])  # (3,2)
    dst = jnp.stack([dst0, dst1, dst2])
    if inv:
        src, dst = dst, src

    # Solve [x y 1] @ A^T = dst for A (2x3): build 3x3 from homogeneous src.
    ones = jnp.ones((3, 1), jnp.float32)
    src_h = jnp.concatenate([src, ones], axis=1)  # (3,3)
    # A^T = solve(src_h, dst)  -> (3,2)
    At = jnp.linalg.solve(src_h, dst)
    return At.T  # (2,3)


def invert_affine(M: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2x3 affine matrix."""
    A = M[:, :2]
    b = M[:, 2]
    Ainv = jnp.linalg.inv(A)
    binv = -Ainv @ b
    return jnp.concatenate([Ainv, binv[:, None]], axis=1)


def affine_points(pts: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """Apply 2x3 affine to (N, 2) points. (ref: utilities.py:928-941)

    Elementwise form (not a matmul): keypoint coordinates must keep full f32
    precision, and TPU matmuls default to bf16 accumulation.
    """
    x = M[0, 0] * pts[..., 0] + M[0, 1] * pts[..., 1] + M[0, 2]
    y = M[1, 0] * pts[..., 0] + M[1, 1] * pts[..., 1] + M[1, 2]
    return jnp.stack([x, y], axis=-1)


def affine_transform_and_clip(
    pts: jnp.ndarray,
    M: jnp.ndarray,
    width,
    height,
    raw_width,
    raw_height,
) -> jnp.ndarray:
    """Transform (N,2) points, clip into [0, w-1]x[0, h-1]; points whose RAW
    coordinates fall outside the raw frame are zeroed.
    (ref: utilities.py:943-972 — sentinel keypoints (-999.999) land outside the
    raw frame and become (0,0), which the Gaussian renderer then skips.)
    """
    new = affine_points(pts, M)
    new = jnp.stack(
        [jnp.clip(new[:, 0], 0.0, width - 1.0), jnp.clip(new[:, 1], 0.0, height - 1.0)],
        axis=1,
    )
    in_raw = (
        (pts[:, 0] >= 0.0)
        & (pts[:, 0] < raw_width)
        & (pts[:, 1] >= 0.0)
        & (pts[:, 1] < raw_height)
    )
    return jnp.where(in_raw[:, None], new, 0.0)


# -----------------------------------------------------------------------------
# Image warp (replaces cv2.warpAffine with INTER_LINEAR)
# -----------------------------------------------------------------------------


def warp_affine(
    image: jnp.ndarray, M: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Bilinear warp of an (H, W, C) image by the FORWARD 2x3 affine `M`
    (dst <- src mapping, like cv2.warpAffine): for each destination pixel we
    sample the source at M^{-1} @ (x, y, 1). Out-of-bounds reads are zero.

    Static output shape; vmap over a batch for the data pipeline.
    """
    Minv = invert_affine(M)
    out_h, out_w = out_hw
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    src_x = Minv[0, 0] * gx + Minv[0, 1] * gy + Minv[0, 2]
    src_y = Minv[1, 0] * gx + Minv[1, 1] * gy + Minv[1, 2]

    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = src_x - x0
    fy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = image[yi_c, xi_c]  # (out_h, out_w, C)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out


def normalize_image(img: jnp.ndarray, mean, std) -> jnp.ndarray:
    """uint8/float [0,255] HWC -> normalized float32 HWC.
    (ref: utilities.py:879-887 _get_input, minus the HWC->CHW transpose: we
    keep NHWC, the TPU-native layout.)
    """
    img = img.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img - mean) / std


# -----------------------------------------------------------------------------
# Gaussian heatmap rendering (vectorized splat + max-reduce)
# -----------------------------------------------------------------------------


def render_gaussian_heatmap(
    centers: jnp.ndarray,
    confidences: jnp.ndarray,
    height: int,
    width: int,
    radius: int = 4,
    sigma: float = 2.0,
    per_class: bool = False,
    subpixel: bool = False,
) -> jnp.ndarray:
    """Render truncated Gaussians at integer-floored centers, combined by max.

    Reference semantics (utilities.py:800-853 draw_umich_gaussian):
      * x, y = int(center) (truncation toward zero)
      * drawn ONLY if the full (2r+1)^2 window fits strictly inside the map
        (x - r >= 0, x + r + 1 < W, y - r >= 0, y + r + 1 < H)
      * Gaussian centered at the integer pixel (no sub-pixel residual)
      * exp(-(dx^2+dy^2) / (2 sigma^2)), truncated to the window
      * combined into the map with np.maximum, scaled by `confidences`

    centers: (K, 2) float (x, y); confidences: (K,) in [0, 1].
    Returns (H, W) if per_class=False else (K, H, W).
    """
    cx = jnp.trunc(centers[:, 0]).astype(jnp.int32)  # int() truncates
    cy = jnp.trunc(centers[:, 1]).astype(jnp.int32)
    drawable = (
        (cx - radius >= 0)
        & (cx + radius + 1 < width)
        & (cy - radius >= 0)
        & (cy + radius + 1 < height)
    )
    conf = confidences * drawable.astype(confidences.dtype)

    gy = jnp.arange(height, dtype=jnp.int32)[None, :, None]  # (1,H,1)
    gx = jnp.arange(width, dtype=jnp.int32)[None, None, :]  # (1,1,W)
    dy = (gy - cy[:, None, None]).astype(jnp.float32)
    dx = (gx - cx[:, None, None]).astype(jnp.float32)
    window = (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
    if subpixel:
        # the teaser renderer keeps the fractional residual in the exponent
        # (ref draw_umich_gaussian_teaser utilities.py:823-845, res=[ct-int])
        dx = dx - (centers[:, 0] - cx.astype(jnp.float32))[:, None, None]
        dy = dy - (centers[:, 1] - cy.astype(jnp.float32))[:, None, None]
    g = jnp.exp(-(dx ** 2 + dy ** 2) / (2.0 * sigma * sigma))
    g = jnp.where(window, g, 0.0) * conf[:, None, None]
    if per_class:
        return g
    return jnp.max(g, axis=0)


def render_prior_heatmap(
    kp_projs_raw: jnp.ndarray,
    trans_input: jnp.ndarray,
    input_w: int,
    input_h: int,
    raw_width,
    raw_height,
    confidences: jnp.ndarray | None = None,
    radius: int = 4,
    sigma: float = 2.0,
) -> jnp.ndarray:
    """Noise-free prior heatmap at network-input resolution.
    (ref: utilities.py:1045-1057 get_prev_hm_wo_noise)
    """
    pts = affine_transform_and_clip(
        kp_projs_raw, trans_input, input_w, input_h, raw_width, raw_height
    )
    if confidences is None:
        confidences = jnp.ones((pts.shape[0],), jnp.float32)
    return render_gaussian_heatmap(pts, confidences, input_h, input_w, radius, sigma)


def render_prior_heatmap_cls(
    kp_projs_raw: jnp.ndarray,
    trans_output: jnp.ndarray,
    output_w: int,
    output_h: int,
    raw_width,
    raw_height,
    confidences: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-class prior heatmaps at output resolution (K, H, W).
    (ref: utilities.py:1085-1098 get_prev_hm_wo_noise_cls)
    """
    pts = affine_transform_and_clip(
        kp_projs_raw, trans_output, output_w, output_h, raw_width, raw_height
    )
    if confidences is None:
        confidences = jnp.ones((pts.shape[0],), jnp.float32)
    return render_gaussian_heatmap(
        pts, confidences, output_h, output_w, radius=4, sigma=2.0, per_class=True
    )


def render_teaser_heatmap(
    kp_projs_raw: jnp.ndarray,
    trans_input: jnp.ndarray,
    input_w: int,
    input_h: int,
    raw_width,
    raw_height,
) -> jnp.ndarray:
    """Display-quality prior heatmap: sigma=6, radius=12, SUB-PIXEL gaussian
    centers (ref utilities.py:1059-1083 get_prev_hm_wo_noise_teaser +
    draw_umich_gaussian_teaser :823-845 — unlike the training renderer, the
    teaser keeps the fractional residual in the exponent). Used for prior
    visualizations (ref sgta_detector.py _get_teaser_imgs)."""
    pts = affine_transform_and_clip(
        kp_projs_raw, trans_input, input_w, input_h, raw_width, raw_height
    )
    conf = jnp.ones((pts.shape[0],), jnp.float32)
    return render_gaussian_heatmap(
        pts, conf, input_h, input_w, radius=12, sigma=6.0, subpixel=True
    )


def render_noised_prior_heatmap(
    rng: jax.Array,
    kp_projs_raw: jnp.ndarray,
    trans_input: jnp.ndarray,
    input_w: int,
    input_h: int,
    raw_width,
    raw_height,
    hm_disturb: float,
    lost_disturb: float,
    fp_disturb: float = 0.0,
) -> jnp.ndarray:
    """Training prior with jitter + random drops + optional false positives
    (the fault-injection curriculum).
    (ref: utilities.py:985-1006 get_prev_hm — jitter N(0,1)*hm_disturb*2 is
    applied AFTER the affine+clip, drops with prob lost_disturb.)

    fp_disturb > 0 injects an extra blob near each keypoint with probability
    fp_disturb, jittered by N(0,1)*0.05*2 — the semantics of the reference's
    COMMENTED-OUT fp block (utilities.py:999-1005; the standalone
    get_prev_ori_hm at utilities.py:1102 implements the same thing but has
    zero call sites). The reference-live behavior is therefore fp_disturb=0;
    callers opt in via TrainConfig.fp_disturb_active (PARITY.md deviation).
    """
    pts = affine_transform_and_clip(
        kp_projs_raw, trans_input, input_w, input_h, raw_width, raw_height
    )
    k_jit, k_drop, k_fp, k_fpjit = jax.random.split(rng, 4)
    n_kp = pts.shape[0]
    jitter = jax.random.normal(k_jit, (n_kp, 2)) * hm_disturb * 2.0
    noised = pts + jitter
    keep = jax.random.uniform(k_drop, (n_kp,)) > lost_disturb
    conf = keep.astype(jnp.float32)
    hm = render_gaussian_heatmap(noised, conf, input_h, input_w, radius=4, sigma=2.0)
    if fp_disturb > 0.0:
        fp = jax.random.uniform(k_fp, (n_kp,)) < fp_disturb
        fp_pts = pts + jax.random.normal(k_fpjit, (n_kp, 2)) * 0.05 * 2.0
        fp_hm = render_gaussian_heatmap(
            fp_pts, (fp & keep).astype(jnp.float32), input_h, input_w, radius=4, sigma=2.0
        )
        hm = jnp.maximum(hm, fp_hm)
    return hm


def render_gt_heatmap(
    kp_projs_net_output_int: jnp.ndarray, output_w: int, output_h: int
) -> jnp.ndarray:
    """GT per-class training target at output res (K, H, W).
    (ref: utilities.py:1124-1134 get_hm, called with INT coords datasets.py:185)
    """
    conf = jnp.ones((kp_projs_net_output_int.shape[0],), jnp.float32)
    return render_gaussian_heatmap(
        kp_projs_net_output_int.astype(jnp.float32),
        conf,
        output_h,
        output_w,
        radius=4,
        sigma=2.0,
        per_class=True,
    )


# -----------------------------------------------------------------------------
# Quaternions (w, x, y, z) and projection
# -----------------------------------------------------------------------------


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-norm-insensitive quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3).
    (ref: geometric_vision.py:341-359 quaternion_to_matrix)
    """
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3,3) -> quaternion (4,) wxyz, w >= 0 branch-selected.

    Branchless jit-safe variant of the standard Shepperd method
    (ref behavior: rf_tools/LM.py:20-71 matrix_to_quaternion).
    """
    m00, m01, m02 = m[0, 0], m[0, 1], m[0, 2]
    m10, m11, m12 = m[1, 0], m[1, 1], m[1, 2]
    m20, m21, m22 = m[2, 0], m[2, 1], m[2, 2]
    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ]
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))
    # candidate quats (unnormalized), one per dominant component
    cand = jnp.stack(
        [
            jnp.stack([q_abs[0] ** 2, m21 - m12, m02 - m20, m10 - m01]),
            jnp.stack([m21 - m12, q_abs[1] ** 2, m10 + m01, m02 + m20]),
            jnp.stack([m02 - m20, m10 + m01, q_abs[2] ** 2, m12 + m21]),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[3] ** 2]),
        ]
    )
    denom = 2.0 * jnp.maximum(q_abs, 0.1)
    cand = cand / denom[:, None]
    best = jnp.argmax(q_abs)
    q = cand[best]
    return q / jnp.linalg.norm(q)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, wxyz. (ref: LM.py:109-116)"""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotate_point_by_quat(pt: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector by quaternion q p q*. (ref: LM.py:118-122)"""
    p = jnp.concatenate([jnp.zeros(pt.shape[:-1] + (1,), pt.dtype), pt], axis=-1)
    qc = q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)
    out = quat_multiply(quat_multiply(q, p), qc)
    return out[..., 1:]


def project_points(
    x3d: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, K: jnp.ndarray
) -> jnp.ndarray:
    """Project (N,3) world points by pose (R, t) and intrinsics K -> (N,2) pixels.
    (ref: geometric_vision.py:260-277 reprojection inside get_pnp_keypoints)

    Full-precision matmuls: pixel coordinates can't afford TPU bf16 rounding.
    """
    cam = jnp.matmul(x3d, R.T, precision="highest") + t  # (N,3)
    uvw = jnp.matmul(cam, K.T, precision="highest")
    return uvw[:, :2] / uvw[:, 2:3]


def transform_points(x3d: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(N,3) points through rigid transform."""
    return jnp.matmul(x3d, R.T, precision="highest") + t
