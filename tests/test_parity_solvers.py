"""Numerical parity against the LIVING reference's solvers and decoder.

Three oracles, all real reference code running in this image:
  * the reference's actual C++/Eigen LM binary
    (rf_tools/libtestso_final.so, called like rf_tools/LM.py:256-266)
    vs our JAX register_gn (core/pnp.py) and our C++ lm_solver
  * scipy-based peaks_from_belief_maps (image_proc.py:1032-1143) plus the
    _peaks_info selection rule (lib/model/utils.py:207-284, mirrored here in
    numpy because the original hardcodes .cuda()) vs decode/peaks.py with
    ref_sort="y"
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sgtapose_tpu import native  # noqa: E402
from sgtapose_tpu.core import geometry, pnp  # noqa: E402
from sgtapose_tpu.decode import peaks as dec  # noqa: E402

import ref_oracle  # noqa: E402

K = np.array([[502.30, 0.0, 319.75], [0.0, 502.30, 179.75], [0.0, 0.0, 1.0]])


def make_pose(rng, n=7, noise_px=0.5):
    """Random pose + correspondences with mild 2D noise, like LM.py:348-372
    make_one_pose (the reference's own solver self-test)."""
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R = np.asarray(geometry.quat_to_matrix(jnp.asarray(np.float64(q))), np.float64)
    t = np.array([0.1, -0.05, 1.2]) + rng.rand(3) * 0.4
    x3d = (rng.rand(n, 3) - 0.5) * 0.6
    cam = x3d @ R.T + t
    uvw = cam @ K.T
    x2d = uvw[:, :2] / uvw[:, 2:3] + rng.randn(n, 2) * noise_px
    return q, t, x3d, x2d


def reproj_err(q, t, x3d, x2d):
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q)
    R = np.asarray(geometry.quat_to_matrix(jnp.asarray(q)), np.float64)
    proj = (x3d @ R.T + t) @ K.T
    proj = proj[:, :2] / proj[:, 2:3]
    return float(np.mean(np.linalg.norm(proj - x2d, axis=1)))


def quat_dist(q1, q2):
    """Geodesic-ish distance handling the q/-q double cover."""
    q1 = np.asarray(q1) / np.linalg.norm(q1)
    q2 = np.asarray(q2) / np.linalg.norm(q2)
    return min(np.linalg.norm(q1 - q2), np.linalg.norm(q1 + q2))


# -----------------------------------------------------------------------------
# LM solver parity: reference .so  vs  JAX register_gn  vs  native lm_solver
# -----------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_lm_so_vs_jax_and_native(seed):
    rng = np.random.RandomState(seed)
    q, t, x3d, x2d = make_pose(rng)
    q0 = q + rng.randn(4) * 0.05
    q0 /= np.linalg.norm(q0)
    t0 = t + rng.randn(3) * 0.05
    w = np.ones((7, 2))

    q_ref, t_ref = ref_oracle.ref_lm(x2d, x3d, q0, t0, w, K)
    q_nat, t_nat = native.lm_refine(x2d, x3d, q0, t0, w, K)
    q_jax, t_jax = pnp.register_gn(
        jnp.asarray(np.float32(x2d)), jnp.asarray(np.float32(x3d)),
        jnp.asarray(np.float32(q0)), jnp.asarray(np.float32(t0)),
        jnp.asarray(np.float32(w)), jnp.asarray(np.float32(K)),
    )
    q_jax, t_jax = np.asarray(q_jax), np.asarray(t_jax)

    e_ref = reproj_err(q_ref, t_ref, x3d, x2d)
    e_nat = reproj_err(q_nat, t_nat, x3d, x2d)
    e_jax = reproj_err(q_jax, t_jax, x3d, x2d)

    # Same objective, so all three must land in the same basin: the reference
    # solution, our C++ f64 solver, and the f32 JAX solver agree on the pose
    # (tolerance reflects the flat noise-limited optimum: 0.5px 2D noise).
    assert quat_dist(q_ref, q_nat) < 5e-3, (q_ref, q_nat)
    assert np.linalg.norm(np.asarray(t_ref) - np.asarray(t_nat)) < 5e-3
    assert quat_dist(q_ref, q_jax) < 1e-2, (q_ref, q_jax)
    assert np.linalg.norm(np.asarray(t_ref) - t_jax) < 1e-2
    # and none is meaningfully worse than the reference optimum
    assert e_nat <= e_ref * 1.02 + 1e-4
    assert e_jax <= e_ref * 1.05 + 1e-3


def test_lm_so_vs_jax_confidence_weighted():
    """With the reference's exp(-5 d^2) confidence weights and one outlier
    downweighted, solutions still coincide (analysis.py:816-848 pipeline)."""
    rng = np.random.RandomState(7)
    q, t, x3d, x2d = make_pose(rng, noise_px=0.3)
    x2d_out = x2d.copy()
    x2d_out[3] += 25.0  # outlier detection
    q0 = q + rng.randn(4) * 0.03
    q0 /= np.linalg.norm(q0)
    t0 = t + rng.randn(3) * 0.03

    w = np.asarray(
        pnp.reprojection_weights(
            jnp.asarray(np.float32(x2d_out)), jnp.asarray(np.float32(x3d)),
            jnp.asarray(np.float32(q0)), jnp.asarray(np.float32(t0)),
            jnp.asarray(np.float32(K)),
        )
    ).astype(np.float64)

    q_ref, t_ref = ref_oracle.ref_lm(x2d_out, x3d, q0, t0, w, K)
    q_jax, t_jax = pnp.register_gn(
        jnp.asarray(np.float32(x2d_out)), jnp.asarray(np.float32(x3d)),
        jnp.asarray(np.float32(q0)), jnp.asarray(np.float32(t0)),
        jnp.asarray(np.float32(w)), jnp.asarray(np.float32(K)),
    )
    assert quat_dist(q_ref, np.asarray(q_jax)) < 5e-3
    assert np.linalg.norm(np.asarray(t_ref) - np.asarray(t_jax)) < 5e-3


def test_weights_match_reference_formula():
    """reprojection_weights == rf_tools/LM.py:279-320 get_weights math:
    w = exp(-5 * (detection - reprojection)^2) per coordinate."""
    rng = np.random.RandomState(11)
    q, t, x3d, x2d = make_pose(rng, noise_px=1.0)
    ours = np.asarray(
        pnp.reprojection_weights(
            jnp.asarray(np.float32(x2d)), jnp.asarray(np.float32(x3d)),
            jnp.asarray(np.float32(q)), jnp.asarray(np.float32(t)),
            jnp.asarray(np.float32(K)),
        )
    )
    R = np.asarray(geometry.quat_to_matrix(jnp.asarray(np.float64(q))))
    proj = (x3d @ R.T + t) @ K.T
    proj = proj[:, :2] / proj[:, 2:3]
    expect = np.exp(-5.0 * (proj - x2d) ** 2)
    np.testing.assert_allclose(ours, expect, rtol=1e-3, atol=1e-4)


# -----------------------------------------------------------------------------
# Peak decode parity: scipy peaks_from_belief_maps + _peaks_info selection
# -----------------------------------------------------------------------------


def _ref_peaks_select(hm_chw: np.ndarray):
    """The reference decode: real peaks_from_belief_maps, then the
    _peaks_info selection loop (lib/model/utils.py:214-263) mirrored in
    numpy (the original hardcodes .cuda()). Returns (coords (C,2) float with
    -999.999 sentinel, coords_int (C,2), scores (C,))."""
    ip = ref_oracle.ref_image_proc()
    peaks = ip.peaks_from_belief_maps(
        torch.from_numpy(hm_chw), offset_due_to_upsampling=0.4395
    )
    coords, coords_int, scores = [], [], []
    for ci, peak in enumerate(peaks):
        if len(peak) == 1:
            sel = [peak[0][0], peak[0][1]]
        elif len(peak) > 1:
            # "sorted by score" in name only: key=x[1] is the sub-pixel y
            srt = sorted(peak, key=lambda x: x[1], reverse=True)
            if srt[0][2] - srt[1][2] >= 0.25:
                sel = [srt[0][0], srt[0][1]]
            else:
                sel = [-999.999, -999.999]
        else:
            sel = [-999.999, -999.999]
        coords.append(sel)
        if -999.999 in sel:
            scores.append(-1.0)
            coords_int.append([0, 0])
        else:
            xi, yi = int(sel[0]), int(sel[1])
            scores.append(float(hm_chw[ci][yi][xi]))
            coords_int.append([xi, yi])
    return np.array(coords), np.array(coords_int), np.array(scores)


def _splat(hm, c, x, y, amp, sigma=2.0):
    H, W = hm.shape[1:]
    yy, xx = np.mgrid[0:H, 0:W]
    hm[c] = np.maximum(hm[c], amp * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * sigma**2)))


def _case_heatmaps():
    """(7, 120, 120) heatmap covering every decision branch:
    c0 single clear peak; c1 two peaks big score gap (accept);
    c2 two peaks small gap (ambiguous -> sentinel); c3 empty (sentinel);
    c4 peak at the border (window clipping); c5 two peaks where the
    Y-SORT order differs from the score order (the parity-critical case);
    c6 three peaks."""
    hm = np.zeros((7, 120, 120), np.float32)
    _splat(hm, 0, 40.3, 60.7, 0.9)
    _splat(hm, 1, 20.0, 30.0, 0.95)
    _splat(hm, 1, 80.0, 90.0, 0.4)
    _splat(hm, 2, 25.0, 25.0, 0.8)
    _splat(hm, 2, 70.0, 40.0, 0.7)
    _splat(hm, 4, 1.0, 118.0, 0.85)
    # c5: lower peak (bigger y) is WEAKER — y-sort picks it first, so the
    # gap test compares (weak - strong) < 0 -> sentinel under ref semantics,
    # while score-sort would accept the strong one. 0.9 vs 0.5 gap = 0.4.
    _splat(hm, 5, 30.0, 20.0, 0.9)
    _splat(hm, 5, 60.0, 100.0, 0.5)
    _splat(hm, 6, 15.0, 15.0, 0.9)
    _splat(hm, 6, 60.0, 60.0, 0.55)
    _splat(hm, 6, 100.0, 100.0, 0.2)
    return hm


def test_peaks_parity_y_sort():
    hm = _case_heatmaps()
    ref_coords, ref_int, ref_scores = _ref_peaks_select(hm)

    hm_hwc = jnp.asarray(hm.transpose(1, 2, 0))
    zeros = jnp.zeros((120, 120, 2), jnp.float32)
    out = dec.decode_heatmaps(hm_hwc, zeros, zeros, use_reg=False, ref_sort="y")

    np.testing.assert_allclose(np.asarray(out.coords), ref_coords, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out.coords_int), ref_int)
    np.testing.assert_allclose(np.asarray(out.scores), ref_scores, atol=1e-4)
    # sanity on the branch coverage: c2 ambiguous and c3 empty are sentinels,
    # and the y-sort-vs-score-sort case (c5) is a sentinel under ref order
    assert not bool(out.valid[2]) and not bool(out.valid[3])
    assert not bool(out.valid[5])


def test_peaks_y_sort_differs_from_score_sort():
    """c5 is constructed so ref_sort='y' rejects (reference bug reproduced)
    while ref_sort='score' accepts the strong peak (the evident intent)."""
    hm = _case_heatmaps()
    hm_hwc = jnp.asarray(hm.transpose(1, 2, 0))
    zeros = jnp.zeros((120, 120, 2), jnp.float32)
    by_y = dec.decode_heatmaps(hm_hwc, zeros, zeros, use_reg=False, ref_sort="y")
    by_s = dec.decode_heatmaps(hm_hwc, zeros, zeros, use_reg=False, ref_sort="score")
    assert not bool(by_y.valid[5])
    assert bool(by_s.valid[5])
    np.testing.assert_allclose(np.asarray(by_s.coords[5]), [30.0, 20.0], atol=0.6)


def test_peaks_parity_random_fields():
    """Fuzz: random sparse gaussian fields, full decode agreement."""
    rng = np.random.RandomState(23)
    for trial in range(4):
        hm = np.zeros((7, 120, 120), np.float32)
        for c in range(7):
            for _ in range(rng.randint(0, 4)):
                _splat(
                    hm, c,
                    rng.uniform(3, 117), rng.uniform(3, 117),
                    rng.uniform(0.3, 1.0), sigma=rng.uniform(1.5, 3.0),
                )
        ref_coords, ref_int, ref_scores = _ref_peaks_select(hm)
        hm_hwc = jnp.asarray(hm.transpose(1, 2, 0))
        zeros = jnp.zeros((120, 120, 2), jnp.float32)
        out = dec.decode_heatmaps(hm_hwc, zeros, zeros, use_reg=False, ref_sort="y")
        np.testing.assert_allclose(
            np.asarray(out.coords), ref_coords, atol=5e-3,
            err_msg=f"trial {trial}",
        )
        np.testing.assert_allclose(np.asarray(out.scores), ref_scores, atol=1e-3)
