"""Native C++ LM solver: build, ABI, convergence vs JAX solver."""

import numpy as np
import jax.numpy as jnp
import pytest

from sgtapose_tpu.core import geometry, pnp
from sgtapose_tpu import native

K = np.array([[502.30, 0.0, 319.75], [0.0, 502.30, 179.75], [0.0, 0.0, 1.0]])


def make_pose(rng, n=7):
    q = rng.randn(4).astype(np.float64); q /= np.linalg.norm(q)
    R = np.asarray(geometry.quat_to_matrix(jnp.asarray(np.float32(q))), np.float64)
    t = np.array([0.1, -0.05, 1.5]) + rng.rand(3) * 0.3
    x3d = (rng.rand(n, 3) - 0.5) * 0.6
    cam = x3d @ R.T + t
    uvw = cam @ K.T
    x2d = uvw[:, :2] / uvw[:, 2:3]
    return q, t, x3d, x2d


def reproj_err(q, t, x3d, x2d):
    q = np.asarray(q, np.float64); q = q / np.linalg.norm(q)
    R = np.asarray(geometry.quat_to_matrix(jnp.asarray(np.float32(q))), np.float64)
    proj = (x3d @ R.T + t) @ K.T
    proj = proj[:, :2] / proj[:, 2:3]
    return float(np.mean(np.linalg.norm(proj - x2d, axis=1)))


def test_build():
    assert native.available()


def test_native_lm_converges(rng):
    q, t, x3d, x2d = make_pose(rng)
    q0 = q + rng.randn(4) * 0.05; q0 /= np.linalg.norm(q0)
    t0 = t + rng.randn(3) * 0.05
    w = np.ones((7, 2))
    err0 = reproj_err(q0, t0, x3d, x2d)
    q1, t1 = native.lm_refine(x2d, x3d, q0, t0, w, K)
    err1 = reproj_err(q1, t1, x3d, x2d)
    assert err1 < err0
    assert err1 < 1e-2
    # unit-quaternion constraint held to float64 precision
    assert abs(np.linalg.norm(q1) - 1.0) < 1e-4


def test_native_matches_jax_solver(rng):
    """Native f64 and JAX f32 solvers land in the same basin."""
    q, t, x3d, x2d = make_pose(rng)
    q0 = q + rng.randn(4) * 0.03; q0 /= np.linalg.norm(q0)
    t0 = t + rng.randn(3) * 0.03
    w = np.ones((7, 2))
    qn, tn = native.lm_refine(x2d, x3d, q0, t0, w, K)
    qj, tj = pnp.register_gn(
        jnp.asarray(np.float32(x2d)), jnp.asarray(np.float32(x3d)),
        jnp.asarray(np.float32(q0)), jnp.asarray(np.float32(t0)),
        jnp.asarray(np.float32(w)), jnp.asarray(np.float32(K)),
    )
    qj = np.asarray(qj, np.float64); qj /= np.linalg.norm(qj)
    qn2 = qn / np.linalg.norm(qn)
    if np.dot(qn2, qj) < 0:
        qj = -qj
    np.testing.assert_allclose(qn2, qj, atol=5e-3)
    np.testing.assert_allclose(tn, np.asarray(tj, np.float64), atol=2e-2)


def test_native_weighted_downweights_outlier(rng):
    """Zero-weighted outlier point must not perturb the solution."""
    q, t, x3d, x2d = make_pose(rng)
    x2d_bad = x2d.copy()
    x2d_bad[3] += 200.0  # gross outlier
    w = np.ones((7, 2))
    w[3] = 0.0
    q0 = q + rng.randn(4) * 0.02; q0 /= np.linalg.norm(q0)
    t0 = t + rng.randn(3) * 0.02
    q1, t1 = native.lm_refine(x2d_bad, x3d, q0, t0, w, K)
    # error on the clean points stays small
    clean = [i for i in range(7) if i != 3]
    assert reproj_err(q1, t1, x3d[clean], x2d[clean]) < 1e-2
