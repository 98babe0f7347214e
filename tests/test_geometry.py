"""Golden tests for core geometry vs the reference formulas.

Oracles are independent numpy reimplementations of the reference's documented
behavior (SURVEY.md §4: affine round-trips, gaussian renderers vs formulas,
quaternion identities)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtapose_tpu.core import geometry


def ref_affine_matrix(center, scale, rot, output_size, inv=False):
    """Numpy oracle for the 3-point affine construction (ref utilities.py:889-922)."""

    def get_dir(src_point, rot_rad):
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        return [
            src_point[0] * cs - src_point[1] * sn,
            src_point[0] * sn + src_point[1] * cs,
        ]

    def get_3rd_point(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], dtype=np.float32)

    center = np.array(center, dtype=np.float32)
    scale = np.array([scale, scale], dtype=np.float32) if np.isscalar(scale) else np.array(scale, np.float32)
    src_w = scale[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    src_dir = np.array(get_dir([0, src_w * -0.5], rot_rad), np.float32)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5], np.float32) + dst_dir
    src[2] = get_3rd_point(src[0], src[1])
    dst[2] = get_3rd_point(dst[0], dst[1])
    if inv:
        src, dst = dst, src
    # solve exactly like cv2.getAffineTransform
    A = np.zeros((6, 6))
    b = np.zeros(6)
    for i in range(3):
        A[2 * i, :3] = [src[i, 0], src[i, 1], 1]
        A[2 * i + 1, 3:] = [src[i, 0], src[i, 1], 1]
        b[2 * i] = dst[i, 0]
        b[2 * i + 1] = dst[i, 1]
    sol = np.linalg.solve(A, b)
    return sol.reshape(2, 3)


@pytest.mark.parametrize("rot", [0.0, 15.0, -30.0])
@pytest.mark.parametrize("scale", [640.0, 480.0, 512.5])
def test_affine_matches_reference(rot, scale):
    center = (320.0, 180.0)
    out = (480, 480)
    M_ref = ref_affine_matrix(center, scale, rot, out)
    M = np.asarray(geometry.get_affine_transform(center, scale, rot, out))
    np.testing.assert_allclose(M, M_ref, rtol=1e-4, atol=1e-4)

    Minv_ref = ref_affine_matrix(center, scale, rot, out, inv=True)
    Minv = np.asarray(geometry.get_affine_transform(center, scale, rot, out, inv=True))
    np.testing.assert_allclose(Minv, Minv_ref, rtol=1e-4, atol=1e-3)


def test_affine_round_trip():
    M = geometry.get_affine_transform((320.0, 240.0), 640.0, 0.0, (480, 480))
    Minv = geometry.invert_affine(M)
    pts = jnp.array([[10.0, 20.0], [300.0, 400.0], [639.0, 479.0]])
    back = geometry.affine_points(geometry.affine_points(pts, M), Minv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_affine_clip_zeroes_out_of_raw_frame():
    M = geometry.get_affine_transform((320.0, 240.0), 640.0, 0.0, (480, 480))
    pts = jnp.array([[100.0, 100.0], [-999.999, -999.999], [700.0, 100.0]])
    out = geometry.affine_transform_and_clip(pts, M, 480, 480, 640, 480)
    out = np.asarray(out)
    assert np.all(out[1] == 0.0)  # sentinel -> outside raw frame -> zeroed
    assert np.all(out[2] == 0.0)  # x=700 >= raw_width
    assert np.all(out[0] > 0.0)


def ref_draw_gaussian(heatmap, center, radius=4, sigma=2.0, k=1.0):
    """Oracle mirror of draw_umich_gaussian (ref utilities.py:800-853)."""
    h, w = heatmap.shape
    x, y = int(center[0]), int(center[1])
    if x - radius >= 0 and x + radius + 1 < w and y - radius >= 0 and y + radius + 1 < h:
        d = 2 * radius + 1
        m = (d - 1) / 2.0
        ys, xs = np.ogrid[-m : m + 1, -m : m + 1]
        g = np.exp(-(xs ** 2 + ys ** 2) / (2 * sigma * sigma))
        np.maximum(
            heatmap[y - radius : y + radius + 1, x - radius : x + radius + 1],
            g * k,
            out=heatmap[y - radius : y + radius + 1, x - radius : x + radius + 1],
        )
    return heatmap


def test_gaussian_heatmap_matches_reference():
    H = W = 64
    centers = np.array([[10.3, 12.9], [2.0, 2.0], [60.0, 60.0], [30.0, 30.0]], np.float32)
    conf = np.array([1.0, 1.0, 1.0, 0.0], np.float32)

    ref = np.zeros((H, W), np.float32)
    for c, k in zip(centers, conf):
        ref_draw_gaussian(ref, c, k=k)

    ours = np.asarray(
        geometry.render_gaussian_heatmap(jnp.asarray(centers), jnp.asarray(conf), H, W)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # center (2,2): window would cross the border -> reference skips it entirely
    assert ours[2, 2] == 0.0
    # confidence 0 keypoint contributes nothing
    assert ref[30, 30] == 0.0


def test_gaussian_heatmap_per_class_shape():
    out = geometry.render_gaussian_heatmap(
        jnp.zeros((7, 2)) + 50.0, jnp.ones((7,)), 120, 120, per_class=True
    )
    assert out.shape == (7, 120, 120)
    assert float(out[0, 50, 50]) == pytest.approx(1.0)


def test_quat_matrix_round_trip(rng):
    for _ in range(10):
        q = rng.randn(4).astype(np.float32)
        q /= np.linalg.norm(q)
        R = np.asarray(geometry.quat_to_matrix(jnp.asarray(q)))
        # orthonormality
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
        q2 = np.asarray(geometry.matrix_to_quat(jnp.asarray(R)))
        # sign ambiguity
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-4)


def test_rotate_point_matches_matrix(rng):
    q = rng.randn(4).astype(np.float32)
    q /= np.linalg.norm(q)
    pts = rng.randn(5, 3).astype(np.float32)
    R = np.asarray(geometry.quat_to_matrix(jnp.asarray(q)))
    out_q = np.asarray(geometry.rotate_point_by_quat(jnp.asarray(pts), jnp.asarray(np.tile(q, (5, 1)))))
    np.testing.assert_allclose(out_q, pts @ R.T, atol=1e-5)


def test_warp_affine_identity():
    img = np.arange(32 * 32 * 3, dtype=np.float32).reshape(32, 32, 3) / 100.0
    M = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = np.asarray(geometry.warp_affine(jnp.asarray(img), M, (32, 32)))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_warp_affine_translation():
    img = np.zeros((16, 16, 1), np.float32)
    img[4, 6, 0] = 1.0
    # shift +2 in x, +3 in y
    M = jnp.array([[1.0, 0.0, 2.0], [0.0, 1.0, 3.0]])
    out = np.asarray(geometry.warp_affine(jnp.asarray(img), M, (16, 16)))
    assert out[7, 8, 0] == pytest.approx(1.0, abs=1e-5)


def test_projection():
    K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])
    R = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 2.0])
    pts = jnp.array([[0.0, 0.0, 0.0], [0.1, -0.1, 0.0]])
    proj = np.asarray(geometry.project_points(pts, R, t, K))
    np.testing.assert_allclose(proj[0], [320.0, 240.0], atol=1e-4)
    np.testing.assert_allclose(proj[1], [320.0 + 500 * 0.05, 240.0 - 500 * 0.05], atol=1e-3)
