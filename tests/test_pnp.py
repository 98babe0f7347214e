"""PnP + LM solver tests: recover known synthetic poses (SURVEY.md §4:
'PnP solve vs known poses, LM convergence vs LM.py:374-411-style synthetic
poses')."""

import functools
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtapose_tpu.core import geometry, pnp

K = jnp.array([[502.30, 0.0, 319.75], [0.0, 502.30, 179.75], [0.0, 0.0, 1.0]])


def make_pose(rng, n_points=7):
    """Random pose + points in front of the camera (LM.py:348-372 style)."""
    q = rng.randn(4).astype(np.float32)
    q /= np.linalg.norm(q)
    R = np.asarray(geometry.quat_to_matrix(jnp.asarray(q)))
    t = np.array([0.1, -0.05, 1.5]) + rng.rand(3) * 0.3
    x3d = (rng.rand(n_points, 3).astype(np.float32) - 0.5) * 0.6
    cam = x3d @ R.T + t
    uvw = cam @ np.asarray(K).T
    x2d = uvw[:, :2] / uvw[:, 2:3]
    return q, t.astype(np.float32), x3d, x2d.astype(np.float32)


def reproj_err(q, t, x3d, x2d):
    R = geometry.quat_to_matrix(jnp.asarray(q))
    proj = geometry.project_points(jnp.asarray(x3d), R, jnp.asarray(t), K)
    return float(jnp.mean(jnp.linalg.norm(proj - x2d, axis=1)))


def test_solve_pnp_exact(rng):
    for trial in range(5):
        q, t, x3d, x2d = make_pose(rng)
        res = pnp.solve_pnp(jnp.asarray(x3d), jnp.asarray(x2d), K)
        assert bool(res.success)
        assert reproj_err(res.quat, res.trans, x3d, x2d) < 0.1
        # pose itself should match (up to quat sign)
        qd = np.abs(np.dot(np.asarray(res.quat), q))
        assert qd > 0.999, f"trial {trial}: quat mismatch {qd}"
        np.testing.assert_allclose(np.asarray(res.trans), t, atol=5e-3)


def test_solve_pnp_noisy(rng):
    q, t, x3d, x2d = make_pose(rng)
    x2d_noisy = x2d + rng.randn(*x2d.shape).astype(np.float32) * 1.0
    res = pnp.solve_pnp(jnp.asarray(x3d), jnp.asarray(x2d_noisy), K)
    assert bool(res.success)
    # should still land close to GT pose
    assert reproj_err(res.quat, res.trans, x3d, x2d) < 5.0


def test_solve_pnp_masked(rng):
    q, t, x3d, x2d = make_pose(rng)
    # corrupt two rows but mask them out
    x2d_bad = x2d.copy()
    x2d_bad[0] = [-999.999, -999.999]
    x2d_bad[3] = [1e4, 1e4]
    valid = jnp.array([False, True, True, False, True, True, True])
    res = pnp.solve_pnp(jnp.asarray(x3d), jnp.asarray(x2d_bad), K, valid)
    assert bool(res.success)
    assert reproj_err(res.quat, res.trans, x3d, x2d) < 0.5


def test_solve_pnp_too_few_points(rng):
    q, t, x3d, x2d = make_pose(rng)
    valid = jnp.array([True, True, True, False, False, False, False])
    res = pnp.solve_pnp(jnp.asarray(x3d), jnp.asarray(x2d), K, valid)
    assert not bool(res.success)


def test_solve_pnp_batch(rng):
    poses = [make_pose(rng) for _ in range(4)]
    x3d = jnp.asarray(np.stack([p[2] for p in poses]))
    x2d = jnp.asarray(np.stack([p[3] for p in poses]))
    valid = jnp.ones((4, 7), bool)
    res = pnp.solve_pnp_batch(x3d, x2d, K, valid)
    assert res.success.shape == (4,)
    assert bool(jnp.all(res.success))
    for i, (q, t, x3di, x2di) in enumerate(poses):
        assert reproj_err(res.quat[i], res.trans[i], x3di, x2di) < 0.1


def test_register_gn_improves_pose(rng):
    """The reference-parity GN refiner recovers a pose from a perturbed init
    (mirror of the rf_tools/LM.py __main__ self-test)."""
    q, t, x3d, x2d = make_pose(rng)
    # perturb init
    q0 = q + rng.randn(4).astype(np.float32) * 0.05
    q0 /= np.linalg.norm(q0)
    t0 = t + rng.randn(3).astype(np.float32) * 0.05
    w = np.ones((7, 2), np.float32)
    err_before = reproj_err(q0, t0, x3d, x2d)
    q1, t1 = pnp.register_gn(
        jnp.asarray(x2d), jnp.asarray(x3d), jnp.asarray(q0), jnp.asarray(t0),
        jnp.asarray(w), K,
    )
    q1n = np.asarray(q1)
    q1n = q1n / np.linalg.norm(q1n)
    err_after = reproj_err(q1n, np.asarray(t1), x3d, x2d)
    assert err_after < err_before
    assert err_after < 0.5
    # unit-quaternion constraint held
    assert abs(np.linalg.norm(np.asarray(q1)) - 1.0) < 1e-2


def test_reprojection_weights(rng):
    q, t, x3d, x2d = make_pose(rng)
    w = pnp.reprojection_weights(jnp.asarray(x2d), jnp.asarray(x3d), jnp.asarray(q), jnp.asarray(t), K)
    # perfect reprojection -> weight exp(0) = 1
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-3)
    x2d_off = x2d + 1.0
    w2 = pnp.reprojection_weights(jnp.asarray(x2d_off), jnp.asarray(x3d), jnp.asarray(q), jnp.asarray(t), K)
    np.testing.assert_allclose(np.asarray(w2), np.exp(-5.0), rtol=1e-2)


def test_pnp_reprojection_prior(rng):
    """Structure prior: pose from prev frame reprojects next frame's points."""
    q, t, x3d, x2d = make_pose(rng)
    next_x3d = x3d + rng.randn(7, 3).astype(np.float32) * 0.02
    ok, next_est, _ = pnp.pnp_reprojection_prior(
        jnp.asarray(x3d), jnp.asarray(x2d), jnp.asarray(next_x3d), K
    )
    assert bool(ok)
    # oracle projection with GT pose
    R = geometry.quat_to_matrix(jnp.asarray(q))
    expect = geometry.project_points(jnp.asarray(next_x3d), R, jnp.asarray(t), K)
    np.testing.assert_allclose(np.asarray(next_est), np.asarray(expect), atol=0.5)


def test_noised_pnp_prior_shapes(rng):
    q, t, x3d, x2d = make_pose(rng)
    key = jax.random.PRNGKey(0)
    ok, next_est, noised_out, _ = pnp.noised_pnp_prior(
        key, jnp.asarray(x3d), jnp.asarray(x2d), jnp.asarray(x3d), K,
        hm_disturb=0.75, lost_disturb=0.2,
    )
    assert next_est.shape == (7, 2)
    assert noised_out.shape == (7, 2)
    # dropped points marked with sentinel
    no = np.asarray(noised_out)
    dropped = no[:, 0] < -900
    kept = ~dropped
    if kept.any():
        # kept points are jittered GT
        assert np.abs(no[kept] - x2d[kept]).max() < 10.0


def test_solve_pnp_warm_start_matches_fresh(rng):
    """Warm-starting LM from a near-solution pose lands in the same optimum
    as the fresh DLT init (same objective + gate), and a use_init=False warm
    tuple falls back to the DLT path exactly."""
    q, t, x3d, x2d = make_pose(rng)
    fresh = pnp.solve_pnp(jnp.asarray(x3d), jnp.asarray(x2d), K)
    assert bool(fresh.success)

    q0 = q + rng.randn(4).astype(np.float32) * 0.02
    q0 /= np.linalg.norm(q0)
    t0 = t + rng.randn(3).astype(np.float32) * 0.02
    warm = pnp.solve_pnp(
        jnp.asarray(x3d), jnp.asarray(x2d), K,
        init=(jnp.asarray(q0), jnp.asarray(t0), jnp.bool_(True)),
    )
    assert bool(warm.success)
    qd = min(
        np.linalg.norm(np.asarray(warm.quat) - np.asarray(fresh.quat)),
        np.linalg.norm(np.asarray(warm.quat) + np.asarray(fresh.quat)),
    )
    assert qd < 5e-3
    np.testing.assert_allclose(
        np.asarray(warm.trans), np.asarray(fresh.trans), atol=5e-3
    )

    cold = pnp.solve_pnp(
        jnp.asarray(x3d), jnp.asarray(x2d), K,
        init=(jnp.asarray(q0), jnp.asarray(t0), jnp.bool_(False)),
    )
    np.testing.assert_allclose(np.asarray(cold.quat), np.asarray(fresh.quat), atol=1e-6)


def test_epnp_matches_cv2_full_solve(rng):
    """The EPnP init puts LM in the SAME basin as cv2's EPnP+ITERATIVE
    (ref geometric_vision.py:88-107): on random 7-point poses with 1 px
    detection noise, the prior reprojection of a fresh 3D set under the two
    solvers' poses agrees to sub-0.05 px (measured max over 200 poses:
    0.0076 px; this compact in-suite version runs 25).

    The prior_grade solver (1-case EPnP, no fallback branch — the smaller
    program compiled into the vmapped training-prior path) is held to the
    SAME bar in the same loop (measured max over 248 poses: 0.0079 px)."""
    cv2 = pytest.importorskip("cv2")

    K = np.array(
        [[502.30, 0, 319.75], [0, 502.30, 179.75], [0, 0, 1]], np.float64
    )
    solve = jax.jit(pnp.solve_pnp)
    solve_prior = jax.jit(functools.partial(pnp.solve_pnp, prior_grade=True))
    worst = 0.0
    worst_prior = 0.0
    used = 0
    for _ in range(25):
        n = 7
        x3d = rng.randn(n, 3) * 0.3
        ax = rng.randn(3)
        ax /= np.linalg.norm(ax)
        R, _ = cv2.Rodrigues(ax * rng.uniform(0, np.pi))
        t = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.2, 0.2),
                      rng.uniform(0.8, 2.5)])
        cam = x3d @ R.T + t
        if (cam[:, 2] < 0.1).any():
            continue
        proj = cam @ K.T
        x2d = proj[:, :2] / proj[:, 2:3] + rng.randn(n, 2) * 1.0

        ok, rvec, tvec = cv2.solvePnP(
            x3d.reshape(n, 1, 3), x2d.reshape(n, 1, 2), K, np.array([]),
            flags=cv2.SOLVEPNP_EPNP,
        )
        ok, rvec, tvec = cv2.solvePnP(
            x3d.reshape(n, 1, 3), x2d.reshape(n, 1, 2), K, np.array([]),
            flags=cv2.SOLVEPNP_ITERATIVE, useExtrinsicGuess=True,
            rvec=rvec, tvec=tvec,
        )
        Rcv, _ = cv2.Rodrigues(rvec)

        res = solve(jnp.asarray(x3d, jnp.float32), jnp.asarray(x2d, jnp.float32),
                    jnp.asarray(K, jnp.float32))
        assert bool(res.success)
        Rj = np.asarray(geometry.quat_to_matrix(res.quat), np.float64)
        tj = np.asarray(res.trans, np.float64)

        resp = solve_prior(jnp.asarray(x3d, jnp.float32),
                           jnp.asarray(x2d, jnp.float32),
                           jnp.asarray(K, jnp.float32))
        assert bool(resp.success)
        Rp = np.asarray(geometry.quat_to_matrix(resp.quat), np.float64)
        tp = np.asarray(resp.trans, np.float64)

        x3d_next = rng.randn(n, 3) * 0.3
        pa = (x3d_next @ Rcv.T + tvec.ravel()) @ K.T
        pb = (x3d_next @ Rj.T + tj) @ K.T
        pc = (x3d_next @ Rp.T + tp) @ K.T
        d = np.linalg.norm(
            pa[:, :2] / pa[:, 2:3] - pb[:, :2] / pb[:, 2:3], axis=1
        ).mean()
        dp = np.linalg.norm(
            pa[:, :2] / pa[:, 2:3] - pc[:, :2] / pc[:, 2:3], axis=1
        ).mean()
        worst = max(worst, d)
        worst_prior = max(worst_prior, dp)
        used += 1
    assert used >= 20
    assert worst < 0.05, worst
    assert worst_prior < 0.05, worst_prior
