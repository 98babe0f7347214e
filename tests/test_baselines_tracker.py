"""DREAM baseline models, spatial softmax, tracker association."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtapose_tpu.core import geometry
from sgtapose_tpu.infer.tracker import Tracker, greedy_assignment
from sgtapose_tpu.models.dream_baselines import (
    DreamHourglass,
    ResnetSimple,
    spatial_softmax,
)


def test_dream_hourglass_shapes():
    m = DreamHourglass(7)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out["hm"].shape == (1, 16, 16, 7)


def test_resnet_simple_shapes():
    # reference-exact ResnetSimple emits input/2-res maps (4 deconvs off a
    # stride-32 trunk, ref hourglass.py:116-160)
    m = ResnetSimple(7, blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out["hm"].shape == (1, 32, 32, 7)


def test_spatial_softmax_localizes():
    hm = np.asarray(
        geometry.render_gaussian_heatmap(
            jnp.array([[40.0, 25.0]]), jnp.ones((1,)), 64, 64, radius=8, sigma=3.0
        )
    )[None, :, :, None]
    coords = spatial_softmax(jnp.asarray(hm), beta=25.0)
    np.testing.assert_allclose(np.asarray(coords[0, 0]), [40.0, 25.0], atol=0.5)


def test_greedy_assignment():
    dist = np.array([[0.1, 5.0], [5.0, 0.05]])
    m = greedy_assignment(dist, gate=1.0)
    assert (0, 0) in m and (1, 1) in m


def test_tracker_ids_persist():
    tr = Tracker(gate=1.0)
    tr.init_track()
    d0 = [
        {"ct": (10.0, 10.0), "tracking": (0.0, 0.0), "score": 0.9, "class": 1},
        {"ct": (50.0, 50.0), "tracking": (0.0, 0.0), "score": 0.8, "class": 2},
    ]
    out0 = tr.step(d0)
    ids0 = {d["class"]: d["tracking_id"] for d in out0}
    # next frame: moved slightly; tracking points back toward previous pos
    d1 = [
        {"ct": (10.5, 10.2), "tracking": (-0.5, -0.2), "score": 0.9, "class": 1},
        {"ct": (50.3, 49.8), "tracking": (-0.3, 0.2), "score": 0.8, "class": 2},
    ]
    out1 = tr.step(d1)
    ids1 = {d["class"]: d["tracking_id"] for d in out1}
    assert ids0 == ids1


def test_tracker_gates_far_detection():
    tr = Tracker(gate=1.0)
    tr.init_track()
    out0 = tr.step([{"ct": (10.0, 10.0), "tracking": (0.0, 0.0), "score": 0.9, "class": 1}])
    out1 = tr.step([{"ct": (400.0, 400.0), "tracking": (0.0, 0.0), "score": 0.9, "class": 1}])
    assert out1[0]["tracking_id"] != out0[0]["tracking_id"]


def test_track_video_e2e():
    """Scan-detector-shaped inputs through the per-video association pass
    (the --track CLI path, ref sgta_detector.py:198-202)."""
    from sgtapose_tpu.infer.tracker import track_video

    T, K = 5, 7
    rng = np.random.RandomState(0)
    base = rng.rand(K, 2) * 300 + 20
    det = np.zeros((T, K, 2))
    trk = np.zeros((T, K, 2))
    for t in range(T):
        det[t] = base + t * 0.02  # sub-gate drift (ref gate is 0.2 px)
        trk[t] = -0.02 if t else 0.0
    scores = np.full((T, K), 0.9)
    det[2, 3] = -999.999 * 4  # one dropout frame for class 3
    ids = track_video(det, scores, trk)
    assert ids.shape == (T, K)
    for k in range(K):
        col = ids[:, k]
        valid = col[col >= 0]
        if k == 3:
            assert ids[2, k] == -1
        # persistent classes keep one id across the video
        assert len(set(valid.tolist())) <= 2
    # classes never share an id within a frame
    for t in range(T):
        v = ids[t][ids[t] >= 0]
        assert len(set(v.tolist())) == len(v)


def test_greedy_assignment_researches_taken_column():
    """Two detections whose best track is the same: the second must fall
    back to its next-best in-gate track (ref tracker.py:136-145 masks the
    matched column), not go unmatched."""
    dist = np.array([[0.10, 0.50], [0.05, 0.40]])
    m = greedy_assignment(dist, gate=1.0)
    assert m == [(0, 0), (1, 1)]


def test_unmatched_track_ages_out_despite_new_tracks():
    """An unmatched pre-existing track ages (and expires at max_age) even
    when the same frame creates new tracks."""
    tr = Tracker(gate=1.0, max_age=1)
    tr.init_track()
    tr.step([
        {"ct": (10.0, 10.0), "tracking": (0.0, 0.0), "score": 0.9, "class": 1},
        {"ct": (50.0, 50.0), "tracking": (0.0, 0.0), "score": 0.9, "class": 2},
    ])
    # class-1 keeps matching; class-2 vanishes but a NEW class-3 det appears
    for _ in range(2):
        tr.step([
            {"ct": (10.0, 10.0), "tracking": (0.0, 0.0), "score": 0.9, "class": 1},
            {"ct": (99.0, 99.0), "tracking": (0.0, 0.0), "score": 0.9, "class": 3},
        ])
    assert all(t.cls != 2 for t in tr.tracks), "ghost class-2 track never aged out"
