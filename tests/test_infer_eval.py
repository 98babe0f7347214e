"""Detector scan + metric harness tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtapose_tpu.config import Config, ModelConfig, TrainConfig
from sgtapose_tpu.core import geometry
from sgtapose_tpu.data import synthetic
from sgtapose_tpu.eval import metrics
from sgtapose_tpu.infer import detector as det_lib
from sgtapose_tpu.models.sgta import create_model

TINY = Config(
    model=ModelConfig(input_res=(64, 64), kernel_list=(3, 3, 3, 1, 1, 1), dla_node="conv"),
)


# -----------------------------------------------------------------------------
# metrics
# -----------------------------------------------------------------------------


def test_keypoint_metrics_perfect():
    gt = np.array([[10.0, 10.0], [50.0, 70.0], [300.0, 200.0]])
    m = metrics.keypoint_metrics(gt.copy(), gt, (640, 360))
    assert m["num_gt_inframe"] == 3
    assert m["num_found_gt_inframe"] == 3
    assert m["l2_error_mean_px"] == 0.0
    # strict `<` comparison: the zero-error bin contributes nothing at thr=0,
    # so perfect detections give (12 - 0.005 - 0.01/2)/12 ~ 0.99875, exactly
    # like the reference's trapezoid
    assert m["l2_error_auc"] == pytest.approx(0.99875, abs=1e-3)


def test_keypoint_metrics_buckets():
    gt = np.array([[10.0, 10.0], [-5.0, 10.0], [50.0, 50.0]])
    det = np.array([[11.0, 10.0], [-999.999, -999.999], [-999.999, -999.999]])
    m = metrics.keypoint_metrics(det, gt, (640, 360))
    assert m["num_gt_outframe"] == 1
    assert m["num_missing_gt_outframe"] == 1
    assert m["num_gt_inframe"] == 2
    assert m["num_found_gt_inframe"] == 1
    assert m["num_missing_gt_inframe"] == 1


def test_keypoint_metrics_syn_gap():
    """syn mode: 140px horizontal gap marks side regions out-of-frame."""
    gt = np.array([[100.0, 50.0], [320.0, 50.0]])  # x=100 < 140 -> outframe
    det = gt.copy()
    m = metrics.keypoint_metrics(det, gt, (640, 360), syn=True)
    assert m["num_gt_outframe"] == 1
    assert m["num_gt_inframe"] == 1


def _noisy_scene(rng, n_frames, noise_px=3.0, drop_every=None):
    """Fixed camera pose; per-frame noisy detections of the skeleton."""
    from sgtapose_tpu.core import geometry as geo

    K = np.asarray(synthetic.camera_K())
    q = rng.randn(4); q /= np.linalg.norm(q)
    R = np.asarray(geo.quat_to_matrix(jnp.asarray(np.float32(q))))
    t = np.array([0.05, -0.02, 1.6], np.float32)
    pos_cam = (np.asarray(synthetic.SKELETON) @ R.T + t).astype(np.float32)
    proj = pos_cam @ K.T
    proj = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)
    det = np.stack([
        proj + rng.randn(*proj.shape).astype(np.float32) * noise_px
        for _ in range(n_frames)
    ])
    if drop_every:
        for f in range(n_frames):
            det[f, f % det.shape[1]] = -999.999  # one missing kp per frame
    gt = np.repeat(proj[None], n_frames, 0)
    pos = np.repeat(pos_cam[None], n_frames, 0)
    return det, gt, pos, K


def test_multiframe_pnp_sliding(rng, tmp_path):
    """Stacking frames' pairs reduces ADD vs single-frame (the estimator's
    point), windows never span videos, artifacts written."""
    from sgtapose_tpu.eval import analysis

    det, gt, pos, K = _noisy_scene(rng, n_frames=8, noise_px=4.0,
                                   drop_every=True)
    single = analysis.analyze_sequence_results(
        det, gt, pos, K, (640, 360), rf=False
    )["pnp_metrics"]
    mf = analysis.solve_multiframe_pnp(
        det, gt, pos, K, (640, 360), multiframe=4,
        video_lengths=[4, 4], rf=False,
        output_dir=str(tmp_path), set_name="t",
    )
    # per video of 4 frames, only frame ind 3 qualifies -> 2 solves
    assert mf["num_pnp_found"] == 2
    assert mf["add_mean"] < single["add_mean"]
    import os
    assert os.path.exists(tmp_path / "t_4_pnp_results.csv")


def test_multiframe_pnp_per_frame_resolution(rng):
    """Mixed-resolution sets pass a per-frame (F,2) image_resolution; PnP
    viability (>=4 in-frame GT kps on the CURRENT frame) must use each
    frame's own resolution, not one global one."""
    from sgtapose_tpu.eval import analysis

    det, gt, pos, K = _noisy_scene(rng, n_frames=4, noise_px=2.0)
    gt = gt.copy()
    gt[:, :4, 0] = 700.0  # 4 kps beyond 640-wide frames, inside 1280-wide
    res = np.array([[640, 360], [640, 360], [1280, 720], [1280, 720]])
    # windows end at frames 1,2,3; current-frame viability:
    #   frame 1 (640w): 3 in-frame -> not viable
    #   frames 2,3 (1280w): 7 in-frame -> viable
    mixed = analysis.solve_multiframe_pnp(det, gt, pos, K, res,
                                          multiframe=2, rf=False)
    assert mixed["num_pnp_possible"] == 2, mixed
    # a single stale 640-wide resolution would call NOTHING viable
    uniform = analysis.solve_multiframe_pnp(det, gt, pos, K, (640, 360),
                                            multiframe=2, rf=False)
    assert uniform["num_pnp_possible"] == 0, uniform


def test_multiframe_pnp_real_combinations(rng, tmp_path):
    from math import comb

    from sgtapose_tpu.eval import analysis

    det, gt, pos, K = _noisy_scene(rng, n_frames=6, noise_px=4.0)
    mf = analysis.solve_multiframe_pnp_real(
        det, pos, K, multiframe=2, rf=False, n_samples=2500,
        output_dir=str(tmp_path), set_name="t",
    )
    # comb(6,2)=15 <= 2500 -> exhaustive combinations
    assert mf["num_pnp_possible"] == comb(6, 2)
    assert mf["num_pnp_found"] == comb(6, 2)
    assert 0.0 < mf["add_auc"] <= 1.0

    # > n_samples path: random subsampling caps the solve count
    det2, _, pos2, _ = _noisy_scene(rng, n_frames=30, noise_px=4.0)
    mf2 = analysis.solve_multiframe_pnp_real(
        det2, pos2, K, multiframe=3, rf=False, n_samples=50
    )
    assert mf2["num_pnp_possible"] == 50


def test_multiframe_pnp_refinement_not_worse(rng):
    from sgtapose_tpu.eval import analysis

    det, gt, pos, K = _noisy_scene(rng, n_frames=4, noise_px=3.0)
    plain = analysis.solve_multiframe_pnp(det, gt, pos, K, (640, 360),
                                          multiframe=2, rf=False)
    refined = analysis.solve_multiframe_pnp(det, gt, pos, K, (640, 360),
                                            multiframe=2, rf=True)
    assert refined["add_mean"] <= plain["add_mean"] + 1e-6


def test_pnp_metrics_auc():
    adds = np.array([0.01, 0.02, -999.99, 0.05])
    n_inframe = np.array([7, 7, 7, 7])
    m = metrics.pnp_metrics(adds, n_inframe)
    assert m["num_pnp_possible"] == 4
    assert m["num_pnp_found"] == 3
    assert 0.0 < m["add_auc"] < 1.0
    # hand-check: mean of per-frame clamped (1 - add/0.06) contributions / 4
    expect = sum(max(0.0, 1 - a / 0.06) for a in [0.01, 0.02, 0.05]) / 4
    assert m["add_auc"] == pytest.approx(expect, abs=0.01)


def test_compute_add_perfect_detection(rng):
    """Detections == GT projections -> recovered transform ~ identity -> ADD ~ 0."""
    K = np.asarray(synthetic.camera_K())
    q = rng.randn(4); q /= np.linalg.norm(q)
    R = np.asarray(geometry.quat_to_matrix(jnp.asarray(np.float32(q))))
    t = np.array([0.05, -0.02, 1.6], np.float32)
    x3d_cam = (np.asarray(synthetic.SKELETON) @ R.T + t).astype(np.float32)
    proj = x3d_cam @ K.T
    proj = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)
    adds, succ = metrics.compute_add_batch(
        proj[None], x3d_cam[None], K, rf=False
    )
    assert bool(succ[0])
    assert adds[0] < 5e-3

    # with LM refinement, never worse (min guard)
    adds_rf, _ = metrics.compute_add_batch(proj[None], x3d_cam[None], K, rf=True)
    assert adds_rf[0] <= adds[0] + 1e-6


def test_compute_add_noisy_refinement_helps(rng):
    K = np.asarray(synthetic.camera_K())
    q = rng.randn(4); q /= np.linalg.norm(q)
    R = np.asarray(geometry.quat_to_matrix(jnp.asarray(np.float32(q))))
    t = np.array([0.05, -0.02, 1.6], np.float32)
    x3d_cam = (np.asarray(synthetic.SKELETON) @ R.T + t).astype(np.float32)
    proj = x3d_cam @ K.T
    proj = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)
    noisy = proj + rng.randn(*proj.shape).astype(np.float32) * 2.0
    adds, succ = metrics.compute_add_batch(noisy[None], x3d_cam[None], K, rf=True)
    assert bool(succ[0])
    assert adds[0] < 0.05  # few-cm ADD from 2px noise


def test_count_inframe():
    projs = np.array([[[10.0, 10.0], [-1.0, 5.0], [639.0, 359.0], [700.0, 100.0]]])
    assert metrics.count_inframe_gt(projs, (640, 360))[0] == 2


# -----------------------------------------------------------------------------
# detector scan
# -----------------------------------------------------------------------------


@pytest.mark.slow
def test_detector_scan_runs():
    """Untrained model: the scan must run end-to-end with finite outputs and
    correct shapes/carry semantics."""
    model = create_model(TINY.model)
    T, n_kp = 3, 7
    projs, imgs = synthetic.make_sequence(jax.random.PRNGKey(0), T)
    images, _, _ = det_lib.preprocess_frames(imgs, TINY)
    x3d = jnp.tile(synthetic.SKELETON[None], (T, 1, 1))

    variables = model.init(
        jax.random.PRNGKey(1),
        images[:1], images[:1],
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 16, 16, 7)), jnp.zeros((1, 16, 16, 7)),
        train=False,
    )

    def apply(variables, *inputs):
        return model.apply(variables, *inputs, train=False)

    run = det_lib.make_video_detector(
        apply, variables, TINY, synthetic.camera_K(),
        raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
    )
    res = run(det_lib.VideoFrames(images=images, x3d=x3d))
    assert res.detected_kps.shape == (T, n_kp, 2)
    assert res.scores.shape == (T, n_kp)
    kps = np.asarray(res.detected_kps)
    assert np.isfinite(kps).all()
    # every keypoint either sentinel or inside a sane raw-coordinate range
    sent = kps <= det_lib.KP_SENTINEL + 1e-3
    inrange = (kps > -3000) & (kps < 3000)
    assert np.all(sent | inrange)


@pytest.mark.slow
def test_cached_detector_matches_exact_on_frame0_and_runs():
    """Feature-cache fast path: frame 0 is EXACT (both Siamese passes see
    zero priors there), later frames run with finite outputs. Also checks
    hm agreement on frame 0 via detections+scores."""
    model = create_model(TINY.model)
    T = 3
    _, imgs = synthetic.make_sequence(jax.random.PRNGKey(0), T)
    images, _, _ = det_lib.preprocess_frames(imgs, TINY)
    x3d = jnp.tile(synthetic.SKELETON[None], (T, 1, 1))
    variables = model.init(
        jax.random.PRNGKey(1),
        images[:1], images[:1],
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 16, 16, 7)), jnp.zeros((1, 16, 16, 7)),
        train=False,
    )

    def apply(variables, *inputs):
        return model.apply(variables, *inputs, train=False)

    video = det_lib.VideoFrames(images=images, x3d=x3d)
    exact = det_lib.make_video_detector(
        apply, variables, TINY, synthetic.camera_K(),
        raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
    )(video)
    cached = det_lib.make_cached_video_detector(
        model, variables, TINY, synthetic.camera_K(),
        raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
    )(video)
    np.testing.assert_allclose(
        np.asarray(cached.detected_kps[0]), np.asarray(exact.detected_kps[0]),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(cached.scores[0]), np.asarray(exact.scores[0]), atol=1e-4
    )
    assert np.isfinite(np.asarray(cached.detected_kps)).all()
    assert cached.detected_kps.shape == exact.detected_kps.shape


def test_dream_detector_runs():
    """Single-frame DREAM-mode path: untrained hourglass, shapes + coordinate
    conversion round trip."""
    import numpy as np

    from sgtapose_tpu.config import Config, ModelConfig
    from sgtapose_tpu.infer.dream_detector import make_dream_detector
    from sgtapose_tpu.models.dream_baselines import DreamHourglass

    cfg = Config(model=ModelConfig(arch="dreamhourglass", input_res=(64, 64)))
    model = DreamHourglass(7)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    def apply(v, imgs):
        return model.apply(v, imgs)

    run = make_dream_detector(apply, variables, cfg, raw_wh=(640, 360))
    raw = np.random.RandomState(0).randint(0, 255, (2, 360, 640, 3), np.uint8)
    kps, scores = run(raw)
    assert kps.shape == (2, 7, 2)
    assert scores.shape == (2, 7)
    found = kps[..., 0] > -999.0
    if found.any():
        # found keypoints must land inside the raw frame's cropped region
        assert kps[..., 0][found].min() >= 100.0  # 140px gap minus sub-pixel
        assert kps[..., 0][found].max() < 540.0


@pytest.mark.slow
def test_batched_video_detector_matches_single():
    """vmap-over-scan batched detector: each video's results equal the
    single-video runner's on identical inputs."""
    model = create_model(TINY.model)
    T, NV = 2, 2
    _, imgs = synthetic.make_sequence(jax.random.PRNGKey(0), T)
    images, _, _ = det_lib.preprocess_frames(imgs, TINY)
    x3d = jnp.tile(synthetic.SKELETON[None], (T, 1, 1))
    variables = model.init(
        jax.random.PRNGKey(1),
        images[:1], images[:1],
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 16, 16, 7)), jnp.zeros((1, 16, 16, 7)),
        train=False,
    )

    def apply(variables, *inputs):
        return model.apply(variables, *inputs, train=False)

    single = det_lib.make_video_detector(
        apply, variables, TINY, synthetic.camera_K(),
        raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
    )(det_lib.VideoFrames(images=images, x3d=x3d))

    batched = det_lib.make_batched_video_detector(
        apply, variables, TINY, synthetic.camera_K(),
        raw_hw=(synthetic.RAW_H, synthetic.RAW_W),
    )(det_lib.VideoFrames(
        images=jnp.broadcast_to(images, (NV,) + images.shape),
        x3d=jnp.broadcast_to(x3d, (NV,) + x3d.shape),
    ))
    for v in range(NV):
        np.testing.assert_allclose(
            np.asarray(batched.detected_kps[v]),
            np.asarray(single.detected_kps), atol=1e-4,
        )

    # multi-chip serving path: videos sharded across the 8-device mesh give
    # the same per-video results (zero collectives in the hot loop)
    from sgtapose_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(8)
    run_sharded = det_lib.make_sharded_video_detector(
        apply, variables, TINY, synthetic.camera_K(),
        raw_hw=(synthetic.RAW_H, synthetic.RAW_W), mesh=mesh,
    )
    sharded = run_sharded(det_lib.VideoFrames(
        images=jnp.broadcast_to(images, (8,) + images.shape),
        x3d=jnp.broadcast_to(x3d, (8,) + x3d.shape),
    ))
    for v in (0, 3, 7):
        np.testing.assert_allclose(
            np.asarray(sharded.detected_kps[v]),
            np.asarray(single.detected_kps), atol=1e-4,
        )
    with pytest.raises(ValueError, match="not divisible"):
        run_sharded(det_lib.VideoFrames(
            images=jnp.broadcast_to(images, (3,) + images.shape),
            x3d=jnp.broadcast_to(x3d, (3,) + x3d.shape),
        ))
