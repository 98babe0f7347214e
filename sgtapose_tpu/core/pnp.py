"""Batched, on-device PnP + weighted LM pose refinement.

One JAX solver family replaces BOTH of the reference's native/host solvers:
  * cv2.solvePnP (EPnP init + SOLVEPNP_ITERATIVE refine)
      (ref: sgtapose/geometric_vision.py:43-116 solve_pnp)
  * the C++/Eigen `LM` shared library + its python Gauss-Newton mirror
      (ref: sgtapose/rf_tools/libtestso_final.so; rf_tools/LM.py:128-266 —
       residual `fun`, symbolically-expanded Jacobian `dfun`, GN loop with
       1e-4 damping, <=200 iters, 1e8-weighted unit-quaternion constraint row)

Design (TPU-first):
  * static shapes everywhere — variable valid-keypoint counts are handled by
    zero weights, not row filtering (the reference filters rows,
    analysis.py:801-805)
  * init by masked EPnP (same algorithm as the reference's cv2 init stage;
    masked DLT + a canonical pose remain as gated fallbacks), then
    Levenberg-Marquardt on the reprojection residual inside lax.while_loop
  * the refine stage's Jacobian comes from jax.jacfwd of the closed-form
    residual — exact, and replaces ~60 lines of sympy-generated expressions
  * everything vmaps: solve a whole batch of frames' PnPs in one XLA program

Quaternions are (w, x, y, z).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sgtapose_tpu.core import geometry


class PnPResult(NamedTuple):
    success: jnp.ndarray  # () bool
    quat: jnp.ndarray  # (4,) wxyz
    trans: jnp.ndarray  # (3,)


# -----------------------------------------------------------------------------
# DLT initialization
# -----------------------------------------------------------------------------


def _normalize_2d(x2d: jnp.ndarray, w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley normalization of weighted 2D points. Returns (x_norm, T 3x3)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    mean = jnp.sum(x2d * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((x2d - mean) ** 2, axis=1) + 1e-12)
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-8)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    xn = (x2d - mean) * s
    return xn, T


def _normalize_3d(x3d: jnp.ndarray, w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    mean = jnp.sum(x3d * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((x3d - mean) ** 2, axis=1) + 1e-12)
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(3.0) / jnp.maximum(mean_d, 1e-8)
    return (x3d - mean) * s, s, mean


def dlt_init(
    x3d: jnp.ndarray, x2d: jnp.ndarray, K: jnp.ndarray, weights: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked DLT estimate of (R, t) from (N,3)-(N,2) correspondences.

    Works in normalized camera coordinates (K^-1 applied) with Hartley
    conditioning; the 12-vector nullspace of the weighted design matrix is the
    flattened projection [R|t], recovered via eigh of A^T A (12x12 — tiny,
    TPU-friendly), then projected onto SO(3) by SVD.
    """
    Kinv = jnp.linalg.inv(K)
    xy1 = jnp.concatenate([x2d, jnp.ones_like(x2d[:, :1])], axis=1)
    xyn = jnp.matmul(xy1, Kinv.T, precision="highest")[:, :2]  # normalized image coords

    xn2, T2 = _normalize_2d(xyn, weights)
    xn3, s3, m3 = _normalize_3d(x3d, weights)

    n = x3d.shape[0]
    zeros = jnp.zeros((n, 4), jnp.float32)
    X_h = jnp.concatenate([xn3, jnp.ones((n, 1), jnp.float32)], axis=1)  # (N,4)
    u = xn2[:, 0:1]
    v = xn2[:, 1:2]
    rows_u = jnp.concatenate([X_h, zeros, -u * X_h], axis=1)  # (N,12)
    rows_v = jnp.concatenate([zeros, X_h, -v * X_h], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2N,12)
    ww = jnp.concatenate([weights, weights], axis=0)
    A = A * ww[:, None]
    AtA = jnp.matmul(A.T, A, precision="highest")
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]  # smallest eigenvalue
    P = p.reshape(3, 4)

    # Undo normalizations: P maps normalized-3D -> normalized-2D.
    # x2n = T2 @ x2 ; X3n = s3 (X3 - m3). Full P' (on raw coords):
    T2_inv = jnp.linalg.inv(T2)
    S3 = jnp.zeros((4, 4), jnp.float32)
    S3 = S3.at[0, 0].set(s3).at[1, 1].set(s3).at[2, 2].set(s3).at[3, 3].set(1.0)
    S3 = S3.at[0, 3].set(-s3 * m3[0]).at[1, 3].set(-s3 * m3[1]).at[2, 3].set(-s3 * m3[2])
    P = jnp.matmul(jnp.matmul(T2_inv, P, precision="highest"), S3, precision="highest")

    # cheirality: make mean depth positive
    X_full = jnp.concatenate([x3d, jnp.ones((n, 1), jnp.float32)], axis=1)
    depths = jnp.matmul(X_full, P[2].T, precision="highest")
    sign = jnp.where(jnp.sum(depths * weights) < 0, -1.0, 1.0)
    P = P * sign

    # scale so rotation block has unit singular values; project onto SO(3)
    Rraw = P[:, :3]
    U, S, Vt = jnp.linalg.svd(Rraw)
    scale = jnp.maximum(jnp.mean(S), 1e-12)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], jnp.float32))
    D = D.at[2, 2].set(det)
    R = jnp.matmul(jnp.matmul(U, D, precision="highest"), Vt, precision="highest")
    t = P[:, 3] / scale
    return R, t


# -----------------------------------------------------------------------------
# EPnP initialization (the reference's cv2.SOLVEPNP_EPNP init,
# geometric_vision.py:88-96). Static-shape, masked, f32.
# -----------------------------------------------------------------------------

_EPNP_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _epnp_control_points(x3d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """4 control points: weighted centroid + the 3 PCA axes scaled by their
    std-devs (cv2 epnp choose_control_points). Near-planar clouds get the
    weakest axis floored so the barycentric basis stays invertible; the
    multi-init fallback in solve_pnp covers truly degenerate cases."""
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    c0 = jnp.sum(x3d * w[:, None], axis=0) / wsum
    d = (x3d - c0) * jnp.sqrt(w)[:, None]
    cov = jnp.matmul(d.T, d, precision="highest") / wsum
    vals, vecs = jnp.linalg.eigh(cov)  # ascending
    floor = jnp.maximum(vals[2], 1e-8) * 1e-6 + 1e-12
    scale = jnp.sqrt(jnp.maximum(vals, floor))
    # descending order like cv2 (largest axis first); row k = control point k+1
    cs = c0[None, :] + (scale[::-1, None] * vecs.T[::-1])
    return jnp.concatenate([c0[None, :], cs], axis=0)  # (4,3)


def _epnp_barycentric(x3d: jnp.ndarray, cw: jnp.ndarray) -> jnp.ndarray:
    """alphas (N,4): p_i = sum_j alpha_ij c_j, sum_j alpha_ij = 1."""
    CC = (cw[1:4] - cw[0]).T  # (3,3), columns are c_j - c_0
    # one 3x3 solve for ALL points (RHS = (3, N))
    a123 = jnp.linalg.solve(CC, (x3d - cw[0]).T).T  # (N,3)
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _epnp_nullspace(
    alphas: jnp.ndarray, x2d: jnp.ndarray, K: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """The 4 smallest-eigenvalue vectors of M^T M, as (4, 4, 3): v[k][j] is
    candidate camera-frame control point j from nullspace vector k (k=0 is
    the smallest eigenvalue — cv2's v[0])."""
    fu, fv = K[0, 0], K[1, 1]
    uc, vc = K[0, 2], K[1, 2]
    n = x2d.shape[0]
    a = alphas  # (N,4)
    zero = jnp.zeros((n, 4), jnp.float32)
    du = (uc - x2d[:, 0])[:, None] * a  # (N,4)
    dv = (vc - x2d[:, 1])[:, None] * a
    # rows interleave (x-part, 0, z-part) per control point j
    rows_u = jnp.stack([a * fu, zero, du], axis=2).reshape(n, 12)
    rows_v = jnp.stack([zero, a * fv, dv], axis=2).reshape(n, 12)
    M = jnp.concatenate([rows_u, rows_v], axis=0)
    M = M * jnp.concatenate([w, w])[:, None]
    MtM = jnp.matmul(M.T, M, precision="highest")
    _, vecs = jnp.linalg.eigh(MtM)
    return vecs[:, :4].T.reshape(4, 4, 3)


def _epnp_L_rho(v: jnp.ndarray, cw: jnp.ndarray):
    """L (6,10) and rho (6,) of the beta constraint ||c_i - c_j||_cam^2 =
    ||c_i - c_j||_world^2 (cv2 epnp compute_L_6x10 / compute_rho).
    Beta-product order: [b0b0, b0b1, b1b1, b0b2, b1b2, b2b2,
                         b0b3, b1b3, b2b3, b3b3]."""
    dv = jnp.stack(
        [jnp.stack([v[k, i] - v[k, j] for (i, j) in _EPNP_PAIRS]) for k in range(4)]
    )  # (4,6,3)
    dot = lambda a, b: jnp.sum(dv[a] * dv[b], axis=1)  # (6,)
    L = jnp.stack(
        [
            dot(0, 0), 2 * dot(0, 1), dot(1, 1), 2 * dot(0, 2), 2 * dot(1, 2),
            dot(2, 2), 2 * dot(0, 3), 2 * dot(1, 3), 2 * dot(2, 3), dot(3, 3),
        ],
        axis=1,
    )  # (6,10)
    rho = jnp.stack([jnp.sum((cw[i] - cw[j]) ** 2) for (i, j) in _EPNP_PAIRS])
    return L, rho


def _lsq(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    AtA = jnp.matmul(A.T, A, precision="highest")
    AtA = AtA + 1e-9 * jnp.eye(A.shape[1], dtype=A.dtype)
    return jnp.linalg.solve(AtA, jnp.matmul(A.T, b, precision="highest"))


def _betas_approx(L: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """The three cv2 epnp beta initializations, stacked (3,4)."""
    eps = 1e-8
    # case 1: unknowns [b0b0, b0b1, b0b2, b0b3]
    x = _lsq(L[:, jnp.array([0, 1, 3, 6])], rho)
    s = jnp.where(x[0] < 0, -1.0, 1.0)
    b0 = jnp.sqrt(jnp.abs(x[0]))
    b1 = jnp.stack([b0, s * x[1] / jnp.maximum(b0, eps),
                    s * x[2] / jnp.maximum(b0, eps),
                    s * x[3] / jnp.maximum(b0, eps)])

    # case 2: unknowns [b0b0, b0b1, b1b1]
    x = _lsq(L[:, jnp.array([0, 1, 2])], rho)
    b0 = jnp.sqrt(jnp.abs(x[0]))
    bb1 = jnp.where(jnp.sign(x[2]) == jnp.sign(x[0]),
                    jnp.sqrt(jnp.abs(x[2])), 0.0)
    b0 = jnp.where(x[1] < 0, -b0, b0)
    b2 = jnp.stack([b0, bb1, jnp.zeros(()), jnp.zeros(())])

    # case 3: unknowns [b0b0, b0b1, b1b1, b0b2, b1b2]
    x = _lsq(L[:, jnp.array([0, 1, 2, 3, 4])], rho)
    b0 = jnp.sqrt(jnp.abs(x[0]))
    bb1 = jnp.where(jnp.sign(x[2]) == jnp.sign(x[0]),
                    jnp.sqrt(jnp.abs(x[2])), 0.0)
    b0 = jnp.where(x[1] < 0, -b0, b0)
    bb2 = x[3] / jnp.where(jnp.abs(b0) < eps, jnp.inf, b0)
    b3 = jnp.stack([b0, bb1, bb2, jnp.zeros(())])
    return jnp.stack([b1, b2, b3])


def _betas_gn(L: jnp.ndarray, rho: jnp.ndarray, betas: jnp.ndarray,
              iters: int = 5) -> jnp.ndarray:
    """cv2 epnp gauss_newton: 5 fixed iterations on the 6 distance residuals
    over the 4 betas."""

    def b10(b):
        return jnp.stack([
            b[0] * b[0], b[0] * b[1], b[1] * b[1], b[0] * b[2], b[1] * b[2],
            b[2] * b[2], b[0] * b[3], b[1] * b[3], b[2] * b[3], b[3] * b[3],
        ])

    res = lambda b: jnp.matmul(L, b10(b), precision="highest") - rho
    jac = jax.jacfwd(res)

    def body(_, b):
        r = res(b)
        J = jac(b)
        return b - _lsq(J, r)

    return jax.lax.fori_loop(0, iters, body, betas)


def _epnp_pose(
    betas: jnp.ndarray, v: jnp.ndarray, alphas: jnp.ndarray,
    x3d: jnp.ndarray, w: jnp.ndarray,
):
    """(R, t) from one beta candidate: camera-frame control points, point
    cloud, sign fix, then weighted Horn alignment (cv2 estimate_R_and_t)."""
    ccs = jnp.einsum("k,kjc->jc", betas, v)  # (4,3)
    pcs = jnp.matmul(alphas, ccs, precision="highest")  # (N,3)
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    sgn = jnp.where(jnp.sum(pcs[:, 2] * w) < 0, -1.0, 1.0)
    pcs = pcs * sgn
    pc0 = jnp.sum(pcs * w[:, None], axis=0) / wsum
    pw0 = jnp.sum(x3d * w[:, None], axis=0) / wsum
    ABt = jnp.matmul(
        ((pcs - pc0) * w[:, None]).T, x3d - pw0, precision="highest"
    )
    U, _, Vt = jnp.linalg.svd(ABt)
    det = jnp.linalg.det(jnp.matmul(U, Vt, precision="highest"))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(det)
    R = jnp.matmul(jnp.matmul(U, D, precision="highest"), Vt,
                   precision="highest")
    t = pc0 - jnp.matmul(R, pw0, precision="highest")
    return R, t


def epnp_init(
    x3d: jnp.ndarray, x2d: jnp.ndarray, K: jnp.ndarray, weights: jnp.ndarray,
    n_cases: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked EPnP (Lepetit et al.) estimate of (R, t) — the same algorithm
    cv2.solvePnP runs for the reference's init stage
    (ref geometric_vision.py:88-96, flags=SOLVEPNP_EPNP). All three beta
    cases are Gauss-Newton-refined and the lowest-reprojection candidate
    wins, matching cv2's case selection. Row masking via `weights` replaces
    the reference's NaN row filtering (static shapes).

    n_cases=1 solves only cv2's case-1 beta parameterization (the one that
    wins on well-conditioned clouds) — a smaller XLA program for the
    vmapped training-prior path where compile time is at a premium
    (measured vs cv2 full solve: max 0.0079 px over 248 poses, same bar as
    the 3-case solver's 0.0076 px; see tests/test_pnp.py)."""
    cw = _epnp_control_points(x3d, weights)
    alphas = _epnp_barycentric(x3d, cw)
    v = _epnp_nullspace(alphas, x2d, K, weights)
    L, rho = _epnp_L_rho(v, cw)
    betas0 = _betas_approx(L, rho)

    def solve_case(b0):
        b = _betas_gn(L, rho, b0)
        R, t = _epnp_pose(b, v, alphas, x3d, weights)
        proj = geometry.project_points(x3d, R, t, K)
        err = jnp.sum(
            jnp.linalg.norm(proj - x2d, axis=1) * weights
        ) / jnp.maximum(jnp.sum(weights), 1e-8)
        err = jnp.where(jnp.isfinite(err), err, jnp.inf)
        return R, t, err

    if n_cases == 1:
        R, t, _ = solve_case(betas0[0])
        return R, t
    Rs, ts, errs = jax.vmap(solve_case)(betas0)
    best = jnp.argmin(errs)
    return Rs[best], ts[best]


# -----------------------------------------------------------------------------
# Reprojection LM refinement (replaces SOLVEPNP_ITERATIVE)
# -----------------------------------------------------------------------------


def _reproj_residual(params, x3d, x2d, K, weights):
    """Weighted reprojection residual, (2N,). params = (qw,qx,qy,qz,tx,ty,tz)."""
    q = params[:4]
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    t = params[4:]
    R = geometry.quat_to_matrix(q)
    proj = geometry.project_points(x3d, R, t, K)
    r = (proj - x2d) * weights[:, None]
    return r.reshape(-1)


@partial(jax.jit, static_argnames=("max_iters",))
def refine_pose_lm(
    x3d: jnp.ndarray,
    x2d: jnp.ndarray,
    K: jnp.ndarray,
    weights: jnp.ndarray,
    quat_init: jnp.ndarray,
    trans_init: jnp.ndarray,
    max_iters: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Levenberg-Marquardt on the plain (non-squared) reprojection residual,
    with per-point weights; mirrors cv2 SOLVEPNP_ITERATIVE's role in
    ref geometric_vision.py:97-107. Quaternion is renormalized inside the
    residual so no constraint row is needed here.
    """
    params0 = jnp.concatenate([quat_init, trans_init])

    res_fn = lambda p: _reproj_residual(p, x3d, x2d, K, weights)
    jac_fn = jax.jacfwd(res_fn)

    def cond(state):
        i, params, lam, delta_norm = state
        return (i < max_iters) & (delta_norm > 1e-8)

    def body(state):
        i, params, lam, _ = state
        r = res_fn(params)
        J = jac_fn(params)
        JtJ = jnp.matmul(J.T, J, precision="highest")
        g = jnp.matmul(J.T, r, precision="highest")
        H = JtJ + lam * jnp.diag(jnp.diag(JtJ) + 1e-9)
        delta = jnp.linalg.solve(H, g)
        new_params = params - delta
        new_cost = jnp.sum(res_fn(new_params) ** 2)
        old_cost = jnp.sum(r ** 2)
        improved = new_cost < old_cost
        params = jnp.where(improved, new_params, params)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-10, 1e8)
        return (i + 1, params, lam, jnp.linalg.norm(delta))

    init = (jnp.int32(0), params0, jnp.float32(1e-3), jnp.float32(1.0))
    _, params, _, _ = jax.lax.while_loop(cond, body, init)
    q = params[:4]
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    return q, params[4:]


def solve_pnp(
    x3d: jnp.ndarray,
    x2d: jnp.ndarray,
    K: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    refine_iters: int = 30,
    init: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    prior_grade: bool = False,
) -> PnPResult:
    """Full PnP: masked EPnP init + LM refine — the same two-stage scheme as
    ref solve_pnp (geometric_vision.py:43-116, SOLVEPNP_EPNP then
    SOLVEPNP_ITERATIVE), static-shape. `valid` masks bad rows
    (NaN filtering in the reference) with weight 0.

    init: optional (quat0, trans0, use_init) warm start — when use_init is
    True the DLT (eigh+svd) is skipped via lax.cond and LM starts from the
    given pose (streaming detectors carry the previous frame's solution;
    same objective and success gate, so good warm starts land in the same
    optimum the fresh init would).

    prior_grade=True compiles a ~3x smaller program for the vmapped
    training-prior path: 1-case EPnP init and NO DLT/canonical fallback
    branch (under vmap lax.cond lowers to select, so the fallback's two
    extra LM refinements run for EVERY sample — pure waste when the inputs
    are noised GT projections that EPnP handles). Failures still gate
    success=False and callers keep their is_pnp fallback semantics.

    success mirrors the reference's pnp_retval: False when fewer than 4 valid
    points or the solution is degenerate (non-finite).
    """
    n = x3d.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    finite = jnp.all(jnp.isfinite(x3d), axis=1) & jnp.all(jnp.isfinite(x2d), axis=1)
    valid = valid & finite
    w = valid.astype(jnp.float32)
    x3d = jnp.where(valid[:, None], x3d, 0.0)
    x2d = jnp.where(valid[:, None], x2d, 0.0)

    def fresh_init(_):
        R0, t0 = epnp_init(x3d, x2d, K, w,
                           n_cases=1 if prior_grade else 3)
        return geometry.matrix_to_quat(R0), t0

    if init is None:
        q0, t0 = fresh_init(None)
    else:
        quat0, trans0, use_init = init
        q0, t0 = jax.lax.cond(
            use_init,
            lambda _: (quat0.astype(jnp.float32), trans0.astype(jnp.float32)),
            fresh_init,
            operand=None,
        )

    n_valid = jnp.sum(w)

    def masked_reproj_err(q_, t_):
        R_ = geometry.quat_to_matrix(q_)
        proj_ = geometry.project_points(x3d, R_, t_, K)
        return jnp.sum(jnp.linalg.norm(proj_ - x2d, axis=1) * w) / jnp.maximum(
            n_valid, 1.0
        )

    # Primary init is EPnP — the reference's own init stage (cv2
    # SOLVEPNP_EPNP, geometric_vision.py:88-96) — so LM starts in the same
    # basin cv2's ITERATIVE refine does. If that does not converge (mean
    # reprojection above a few px: near-degenerate geometry, wild outliers),
    # a fallback branch runs LM from the masked-DLT init and from a canonical
    # front-facing pose (object centroid pushed in front of the camera) and
    # the best optimum wins; the lax.cond keeps converged solves (the common
    # case) at single-refine cost.
    q_a, t_a = refine_pose_lm(x3d, x2d, K, w, q0, t0, max_iters=refine_iters)
    err_a = masked_reproj_err(q_a, t_a)
    err_a = jnp.where(jnp.isfinite(err_a), err_a, jnp.inf)

    centroid = jnp.sum(x3d * w[:, None], axis=0) / jnp.maximum(n_valid, 1.0)
    q_c = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    t_c = jnp.array([0.0, 0.0, 2.0], jnp.float32) - centroid

    if prior_grade:
        # One unconditional canonical-pose LM restart instead of the full
        # cond-fallback (DLT + 2 LMs): at shipping noise (0.75/0.2) the
        # 1-case-EPnP-only tail is fat (p95 ~34 px vs the reference's ~2.7)
        # and this restart restores it (measured p95 3.3 px, max 29 over 400
        # noised solves — reference-grade; full solver p95 2.8). Under vmap
        # a cond executes both branches anyway, so unconditional best-of-2
        # is the same step cost at smaller program size.
        q_e, t_e = refine_pose_lm(x3d, x2d, K, w, q_c, t_c,
                                  max_iters=refine_iters)
        err_e = masked_reproj_err(q_e, t_e)
        err_e = jnp.where(jnp.isfinite(err_e), err_e, jnp.inf)
        use_a2 = err_a <= err_e
        q_p = jnp.where(use_a2, q_a, q_e)
        t_p = jnp.where(use_a2, t_a, t_e)
        err_p = jnp.minimum(err_a, err_e)
        ok = (
            (n_valid >= 4)
            & jnp.all(jnp.isfinite(q_p))
            & jnp.all(jnp.isfinite(t_p))
            & (err_p < 1e3)
        )
        q_p = jnp.where(ok, q_p, jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32))
        t_p = jnp.where(ok, t_p, jnp.zeros(3, jnp.float32))
        return PnPResult(success=ok, quat=q_p, trans=t_p)

    def fallback_candidates(_):
        R_d, t_d = dlt_init(x3d, x2d, K, w)
        q_b, t_b = refine_pose_lm(x3d, x2d, K, w,
                                  geometry.matrix_to_quat(R_d), t_d,
                                  max_iters=refine_iters)
        err_b = masked_reproj_err(q_b, t_b)
        q_e, t_e = refine_pose_lm(x3d, x2d, K, w, q_c, t_c,
                                  max_iters=refine_iters)
        err_e = masked_reproj_err(q_e, t_e)
        err_b = jnp.where(jnp.isfinite(err_b), err_b, jnp.inf)
        err_e = jnp.where(jnp.isfinite(err_e), err_e, jnp.inf)
        use_b = err_b <= err_e
        return (
            jnp.where(use_b, q_b, q_e),
            jnp.where(use_b, t_b, t_e),
            jnp.minimum(err_b, err_e),
        )

    q_b, t_b, err_b = jax.lax.cond(
        err_a > 3.0,  # px mean; bad basins sit at tens-hundreds of px
        fallback_candidates,
        lambda _: (q_a, t_a, jnp.full((), jnp.inf, err_a.dtype)),
        operand=None,
    )
    use_a = err_a <= err_b
    q = jnp.where(use_a, q_a, q_b)
    t = jnp.where(use_a, t_a, t_b)
    reproj_err = jnp.minimum(err_a, err_b)

    # degenerate-solution gate: a pose whose reprojection is wildly off never
    # converged; report failure like cv2's pnp_retval=False so callers take
    # their fallback paths (ref geometric_vision.py:111-116 except branch)
    ok = (
        (n_valid >= 4)
        & jnp.all(jnp.isfinite(q))
        & jnp.all(jnp.isfinite(t))
        & (reproj_err < 1e3)
    )
    q = jnp.where(ok, q, jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32))
    t = jnp.where(ok, t, jnp.zeros(3, jnp.float32))
    return PnPResult(success=ok, quat=q, trans=t)


solve_pnp_batch = jax.vmap(solve_pnp, in_axes=(0, 0, None, 0))


# -----------------------------------------------------------------------------
# Reference-parity weighted GN refiner (the --rf "LM" from rf_tools)
# -----------------------------------------------------------------------------


def _squared_residuals(params, x3d, x2d, K, weights):
    """The reference's `fun` (rf_tools/LM.py:128-158): per-row SQUARED weighted
    reprojection error, plus a 2e8-weighted squared unit-quaternion constraint.
    Quaternion rotation applied via q p q* exactly like the symbolic form.
    Returns (2N + 1,).
    """
    q = params[:4]
    t = params[4:]
    fx, cx = K[0, 0], K[0, 2]
    fy, cy = K[1, 1], K[1, 2]
    rot = geometry.rotate_point_by_quat(x3d, q[None, :].repeat(x3d.shape[0], 0))
    cam = rot + t
    u = (fx * cam[:, 0] + cx * cam[:, 2]) / cam[:, 2]
    v = (fy * cam[:, 1] + cy * cam[:, 2]) / cam[:, 2]
    rx = weights[:, 0] ** 2 * (x2d[:, 0] - u) ** 2
    ry = weights[:, 1] ** 2 * (x2d[:, 1] - v) ** 2
    qn = jnp.sum(q * q) - 1.0
    constraint = 2e8 * qn * qn
    return jnp.concatenate(
        [jnp.stack([rx, ry], axis=1).reshape(-1), constraint[None]]
    )


@partial(jax.jit, static_argnames=("max_iters",))
def register_gn(
    x2d: jnp.ndarray,
    x3d: jnp.ndarray,
    quat_init: jnp.ndarray,
    trans_init: jnp.ndarray,
    weights: jnp.ndarray,
    K: jnp.ndarray,
    max_iters: int = 200,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-parity Gauss-Newton on SQUARED residuals.

    Mirrors rf_tools/LM.py:222-266 (`GN` / `register_GN_C` / C++ `LM`):
      value <- value - (J^T J + 1e-4 I)^-1 J^T f
      stop when sum|delta| <= 1e-4 or 200 iterations.
    f is the squared-residual vector; J = jacfwd(f) — identical math to the
    sympy-expanded `dfun`, without 60 lines of generated code. The constraint
    row keeps the quaternion on the unit sphere (weight 1e8 on each of 2 rows,
    folded into a single 2e8 row as in `fun`).

    weights: (N, 2) per-point x/y confidence weights (the trailing 1e8
    constraint row of the reference's (N+1, 2) array is implicit here).

    Deviation from the reference loop (documented): the reference runs plain
    GN with a fixed 1e-4 damping in float64; in float32 (the TPU-native dtype)
    that diverges — JtJ condition numbers reach ~1e8. We therefore use
    adaptive Levenberg damping scaled by diag(JtJ) plus step acceptance
    (only take steps that reduce ||f||^2). The objective and therefore the
    fixed points are identical; only the iteration path differs.
    """
    params0 = jnp.concatenate([quat_init, trans_init]).astype(jnp.float32)
    f_fn = lambda p: _squared_residuals(p, x3d, x2d, K, weights)
    jac_fn = jax.jacfwd(f_fn)

    def cond(state):
        i, params, lam, delta_sum = state
        return (i < max_iters) & (delta_sum > 1e-4)

    def body(state):
        i, params, lam, _ = state
        f = f_fn(params)
        J = jac_fn(params)
        JtJ = jnp.matmul(J.T, J, precision="highest")
        damp = lam * (jnp.diag(JtJ) + 1e-4)
        H = JtJ + jnp.diag(damp)
        delta = jnp.linalg.solve(H, jnp.matmul(J.T, f, precision="highest"))
        new_params = params - delta
        old_cost = jnp.sum(f * f)
        new_f = f_fn(new_params)
        new_cost = jnp.sum(new_f * new_f)
        ok = jnp.all(jnp.isfinite(new_params)) & (new_cost < old_cost)
        params = jnp.where(ok, new_params, params)
        lam = jnp.clip(jnp.where(ok, lam * 0.33, lam * 4.0), 1e-8, 1e10)
        # keep iterating while rejected steps still have damping room
        delta_sum = jnp.where(ok, jnp.sum(jnp.abs(delta)), jnp.float32(1.0))
        delta_sum = jnp.where(lam >= 1e10, 0.0, delta_sum)
        return (i + 1, params, lam, delta_sum)

    init = (jnp.int32(0), params0, jnp.float32(1e-4), jnp.float32(100.0 * 7))
    _, params, _, _ = jax.lax.while_loop(cond, body, init)
    return params[:4], params[4:]


def reprojection_weights(
    x2d: jnp.ndarray,
    x3d: jnp.ndarray,
    quat: jnp.ndarray,
    trans: jnp.ndarray,
    K: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Confidence weights w = exp(-5 * d) per coordinate, where d is the
    squared deviation between a detection and its reprojection under the
    current pose estimate. (ref: rf_tools/LM.py:279-320 get_weights, driven by
    analysis.py:816-848 which feeds squared distances.)

    Returns (N, 2). Invalid detections get weight 0 (replaces the reference's
    row filtering with static shapes).
    """
    R = geometry.quat_to_matrix(quat)
    proj = geometry.project_points(x3d, R, trans, K)
    d = (proj - x2d) ** 2
    w = jnp.exp(-5.0 * d)
    if valid is not None:
        w = w * valid[:, None].astype(w.dtype)
    return w


# -----------------------------------------------------------------------------
# Structure-prior generation (train + inference shared primitive)
# -----------------------------------------------------------------------------


def pnp_reprojection_prior(
    prev_x3d: jnp.ndarray,
    prev_x2d: jnp.ndarray,
    next_x3d: jnp.ndarray,
    K: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    init: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    prior_grade: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, PnPResult]:
    """PnP from the previous frame's (3D, 2D) pairs, then reproject the next
    frame's FK 3D keypoints: the temporal structure prior.
    (ref: geometric_vision.py:233-310 get_pnp_keypoints / is_pnp)

    init: optional warm-start pose (see solve_pnp). Returns (success,
    next_2d_est (N,2), full PnPResult — for carrying the pose). On failure
    the caller falls back to the previous detections (is_pnp semantics).
    """
    res = solve_pnp(prev_x3d, prev_x2d, K, valid, init=init,
                    prior_grade=prior_grade)
    R = geometry.quat_to_matrix(res.quat)
    next_est = geometry.project_points(next_x3d, R, res.trans, K)
    return res.success, next_est, res


def noised_pnp_prior(
    rng: jax.Array,
    prev_x3d: jnp.ndarray,
    prev_x2d_gt: jnp.ndarray,
    next_x3d: jnp.ndarray,
    K: jnp.ndarray,
    hm_disturb: float,
    lost_disturb: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, PnPResult]:
    """Training-time prior generation with fault injection
    (ref: geometric_vision.py:233-280 get_pnp_keypoints):
      * jitter each previous GT projection by N(0,1) * hm_disturb * 2
      * drop each point with probability lost_disturb (weight-0, not removed)
      * PnP on surviving noised points; reproject next frame's 3D points

    Returns (success, next_2d_est (N,2), prev_2d_noised_out (N,2) with dropped
    points set to the -999.999 sentinel, PnPResult — the solved pose, used by
    the cache-prior training mode to render a repro-style prior for the prev
    frame).
    """
    k_jit, k_drop = jax.random.split(rng)
    n = prev_x2d_gt.shape[0]
    noise = jax.random.normal(k_jit, (n, 2)) * hm_disturb * 2.0
    noised = prev_x2d_gt + noise
    keep = jax.random.uniform(k_drop, (n,)) > lost_disturb
    # prior_grade: the inputs here are noised GT projections — EPnP+LM always
    # converges; the full solver's vmapped fallback branch would run 2 extra
    # LM refinements per sample for nothing (compile AND step time).
    success, next_est, res = pnp_reprojection_prior(
        prev_x3d, noised, next_x3d, K, keep, prior_grade=True)
    sentinel = jnp.full((n, 2), -999.999, jnp.float32)
    noised_out = jnp.where(keep[:, None], noised, sentinel)
    return success, next_est, noised_out, res
