"""On-device data pipeline + train-step tests (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtapose_tpu.config import Config, ModelConfig, TrainConfig
from sgtapose_tpu.data import pipeline, synthetic
from sgtapose_tpu.train import trainer
from sgtapose_tpu.train.loss import sgta_loss
from sgtapose_tpu.train.schedule import warmup_poly_schedule

TINY = Config(
    model=ModelConfig(input_res=(64, 64), kernel_list=(3, 3, 3, 1, 1, 1)),
    train=TrainConfig(batch_size_per_device=1),
)


@pytest.fixture(scope="module")
def raw_batch():
    return synthetic.make_raw_batch(jax.random.PRNGKey(0), 2)


def test_pipeline_shapes(raw_batch):
    fn = pipeline.make_batch_fn(TINY, synthetic.camera_K())
    batch = fn(jax.random.PRNGKey(1), raw_batch)
    H, W = TINY.model.input_res
    Ho, Wo = TINY.model.output_res
    assert batch["cur_img"].shape == (2, H, W, 3)
    assert batch["pre_hm"].shape == (2, H, W, 1)
    assert batch["pre_hm_cls"].shape == (2, Ho, Wo, 7)
    assert batch["gt_belief_maps"].shape == (2, Ho, Wo, 7)
    assert batch["kp_int"].shape == (2, 7, 2)
    assert batch["kp_int"].dtype == jnp.int32
    for v in jax.tree_util.tree_leaves(batch):
        assert np.isfinite(np.asarray(v, np.float32)).all()


def test_gt_heatmap_peaks_at_keypoints(raw_batch):
    """GT belief maps must peak exactly at the int keypoint pixels (when the
    full gaussian window fits)."""
    fn = pipeline.make_batch_fn(TINY, synthetic.camera_K(), augment=False)
    batch = fn(jax.random.PRNGKey(2), raw_batch)
    gt = np.asarray(batch["gt_belief_maps"])  # (B, Ho, Wo, 7)
    kp = np.asarray(batch["kp_int"])
    Ho, Wo = TINY.model.output_res
    checked = 0
    for b in range(gt.shape[0]):
        for k in range(7):
            x, y = kp[b, k]
            if 4 <= x < Wo - 5 and 4 <= y < Ho - 5 and gt[b, :, :, k].max() > 0:
                assert gt[b, y, x, k] == pytest.approx(1.0, abs=1e-5)
                checked += 1
    assert checked > 0


def test_reg_target_range(raw_batch):
    fn = pipeline.make_batch_fn(TINY, synthetic.camera_K(), augment=False)
    batch = fn(jax.random.PRNGKey(3), raw_batch)
    reg = np.asarray(batch["reg_target"])
    # residual float - int must be in [0, 1) for in-frame keypoints
    assert reg.min() >= -1e-5 and reg.max() < 1.0 + 1e-5


def test_schedule():
    sched = warmup_poly_schedule(1e-3, max_iters=10000, warmup_iters=100)
    assert float(sched(0)) < 1e-6 + 1e-9
    assert float(sched(100)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(5000)) == pytest.approx(1e-3 * (1 - 4999 / 10000), rel=1e-4)
    assert float(sched(10001)) == pytest.approx(0.0, abs=1e-9)


def test_step_decay_schedule_resume_replay():
    """--lr_step semantics: 0.1x at each epoch milestone, and a resumed step
    count replays the decay (ref lib/model/model.py:87-99)."""
    from sgtapose_tpu.train.schedule import step_decay_schedule

    sched = step_decay_schedule(1e-3, [10, 15], iters_per_epoch=100)
    assert float(sched(0)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(999)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(1000)) == pytest.approx(1e-4, rel=1e-5)  # epoch 10
    assert float(sched(1499)) == pytest.approx(1e-4, rel=1e-5)
    assert float(sched(1500)) == pytest.approx(1e-5, rel=1e-4)  # epoch 15
    # "resume at epoch 12" = same function of the restored step counter
    assert float(sched(1200)) == pytest.approx(1e-4, rel=1e-5)


@pytest.mark.slow
def test_train_step_decreases_loss(raw_batch):
    state = trainer.create_train_state(TINY, jax.random.PRNGKey(0), max_iters=1000)
    fn = pipeline.make_batch_fn(TINY, synthetic.camera_K())
    batch = fn(jax.random.PRNGKey(1), raw_batch)
    step = jax.jit(trainer.train_step)
    losses = []
    for i in range(5):
        state, stats = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(stats["tot"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_eval_step(raw_batch):
    state = trainer.create_train_state(TINY, jax.random.PRNGKey(0), max_iters=1000)
    fn = pipeline.make_batch_fn(TINY, synthetic.camera_K())
    batch = fn(jax.random.PRNGKey(1), raw_batch)
    stats = jax.jit(trainer.eval_step)(state, batch)
    assert np.isfinite(float(stats["tot"]))


def test_parallel_step_smoke_8dev():
    """Fast (non-slow) 8-virtual-device SPMD smoke on the tiny conv-node
    config: shard_batch + make_parallel_train_step compile and execute under
    the default quick run, so a sharding-annotation regression (e.g. under a
    JAX upgrade) is caught without the slow suite. Full numerical 8dev==1dev
    equivalence with the shipping DCN/attention ops is the slow test below."""
    from sgtapose_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(8)
    fn = pipeline.make_batch_fn(TINY, synthetic.camera_K())
    raw = synthetic.make_raw_batch(jax.random.PRNGKey(7), 8)
    batch = mesh_lib.shard_batch(fn(jax.random.PRNGKey(8), raw), mesh)
    state = trainer.create_train_state(TINY, jax.random.PRNGKey(0), max_iters=10)
    pstep = trainer.make_parallel_train_step(mesh)
    state, stats = pstep(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["tot"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_parallel_step_matches_single_device():
    """The 8-device data-parallel step computes the SAME update as a
    1-device step on the same global batch (XLA SPMD all-reduce == local
    reduction, up to f32 reduction-order noise) — with the shipping ops:
    DCN decoder nodes + flagship attention windows."""
    from sgtapose_tpu.parallel import mesh as mesh_lib

    cfg = Config(
        model=ModelConfig(
            input_res=(64, 64),
            kernel_list=(12, 6, 3, 1, 1, 1),
            dla_node="dcn",
        ),
        train=TrainConfig(batch_size_per_device=1),
    )
    fn = pipeline.make_batch_fn(cfg, synthetic.camera_K())
    raw = synthetic.make_raw_batch(jax.random.PRNGKey(5), 8)
    batch = fn(jax.random.PRNGKey(1), raw)

    def one_step(n_dev):
        mesh = mesh_lib.make_mesh(n_dev)
        assert mesh.devices.size == n_dev
        state = trainer.create_train_state(cfg, jax.random.PRNGKey(0), max_iters=100)
        sharded = mesh_lib.shard_batch(batch, mesh)
        pstep = trainer.make_parallel_train_step(mesh)
        new_state, stats = pstep(state, sharded, jax.random.PRNGKey(2))
        return new_state, stats

    s8, st8 = one_step(8)
    s1, st1 = one_step(1)
    assert np.isfinite(float(st8["tot"]))
    assert int(s8.step) == 1
    # rtol is data-dependent reduction-order noise (f32 psum + global-batch
    # BN): measured 7.5e-4 rel on some batches; the param-divergence bound
    # below is the real SPMD-equivalence assertion.
    np.testing.assert_allclose(float(st8["tot"]), float(st1["tot"]), rtol=2e-3)
    # updated params agree leaf-by-leaf
    l8 = jax.tree_util.tree_leaves(s8.params)
    l1 = jax.tree_util.tree_leaves(s1.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(l8, l1)
    )
    assert worst < 5e-4, f"max param divergence {worst}"


def test_three_frame_pipeline(raw_batch):
    """Three-frame batch construction (ppre/pre/next)."""
    from sgtapose_tpu.data.pipeline import RawSampleThree, make_batch_fn_three

    r = raw_batch
    three = RawSampleThree(
        ppre_img=r.prev_img, pre_img=r.prev_img, next_img=r.next_img,
        ppre_projs=r.prev_projs, pre_projs=r.prev_projs, next_projs=r.next_projs,
        ppre_x3d_rob=r.prev_x3d_rob, pre_x3d_rob=r.prev_x3d_rob,
        next_x3d_rob=r.next_x3d_rob,
    )
    fn = make_batch_fn_three(TINY, synthetic.camera_K())
    batch = fn(jax.random.PRNGKey(0), three)
    H, W = TINY.model.input_res
    Ho, Wo = TINY.model.output_res
    assert batch["ppre_img"].shape == (2, H, W, 3)
    assert batch["ppre_hm"].shape == (2, H, W, 1)
    assert batch["ppre_hm_cls"].shape == (2, Ho, Wo, 7)
    assert batch["cur_img"].shape == (2, H, W, 3)
    for v in jax.tree_util.tree_leaves(batch):
        assert np.isfinite(np.asarray(v, np.float32)).all()


def test_stage_timer_and_seed():
    from sgtapose_tpu.utils.profiling import StageTimer
    from sgtapose_tpu.utils.seeding import set_random_seed

    t = StageTimer()
    with t.stage("net"):
        pass
    with t.stage("net"):
        pass
    assert t.counts["net"] == 2 and "net" in t.summary()
    key = set_random_seed(317)
    assert key is not None


@pytest.mark.slow
def test_bf16_train_step(raw_batch):
    """bf16 mixed-precision step: finite loss, f32 params/stats preserved."""
    import functools

    state = trainer.create_train_state(TINY, jax.random.PRNGKey(0), max_iters=1000)
    fn = pipeline.make_batch_fn(TINY, synthetic.camera_K())
    batch = fn(jax.random.PRNGKey(1), raw_batch)
    step = jax.jit(functools.partial(trainer.train_step, bf16=True))
    state, stats = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(stats["tot"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32


def test_fp_disturb_prior():
    from sgtapose_tpu.core import geometry

    M = geometry.get_affine_transform((320.0, 180.0), 640.0, 0.0, (64, 64))
    pts = jnp.array([[320.0, 180.0]] * 7)
    hm = geometry.render_noised_prior_heatmap(
        jax.random.PRNGKey(0), pts, M, 64, 64, 640, 360,
        hm_disturb=0.1, lost_disturb=0.0, fp_disturb=1.0,
    )
    assert hm.shape == (64, 64)
    assert float(hm.max()) > 0.9


def test_depth_loader(tmp_path):
    import json

    from sgtapose_tpu.data.loaders import load_depth_keypoints

    K = np.array([[500.0, 0, 320.0], [0, 500.0, 180.0], [0, 0, 1.0]])
    R = np.eye(3)
    pos_cam = np.random.RandomState(0).rand(42, 3) + [0, 0, 2.0]
    meta = [{
        "ROBOT NAME": "panda",
        "keypoints": [{"R2C_mat": R.tolist(), "location_wrt_cam": pos_cam[0].tolist()}],
        "joints_3n_fixed_42": [{"location_wrt_cam": p.tolist()} for p in pos_cam],
    }]
    p = tmp_path / "0000_meta.json"
    p.write_text(json.dumps(meta))
    out = load_depth_keypoints(str(p), "panda", K)
    assert out["projections"].shape == (42, 2)
    assert out["positions_wrt_robot"].shape == (42, 3)
    # robot frame anchored at joint 0 with identity rotation
    np.testing.assert_allclose(out["positions_wrt_robot"][0], 0.0, atol=1e-12)


@pytest.mark.parametrize("phase,arch", [
    ("CenterTrack", "dlaseg_34"),
    ("CenterNet", "dlaseg_34"),
    ("Dream", "dreamhourglass"),
])
def test_phase_training(raw_batch, phase, arch):
    """Non-flagship training phases: one step runs with finite loss."""
    import functools
    import dataclasses

    cfg = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY.model, arch=arch, dla_node="conv")
    )
    state = trainer.create_train_state_for_phase(cfg, jax.random.PRNGKey(0), phase, max_iters=100)
    fn = pipeline.make_batch_fn(cfg, synthetic.camera_K())
    batch = fn(jax.random.PRNGKey(1), raw_batch)
    step = jax.jit(functools.partial(trainer.train_step, phase=phase))
    state, stats = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(stats["tot"]))


def test_schedule_zero_warmup_no_nan():
    """warmup_iters=0 (e.g. tiny --steps in train_demo) must mean 'no
    warmup', not a 0/0 NaN lr that silently poisons the run."""
    sched = warmup_poly_schedule(1e-3, max_iters=10, warmup_iters=0)
    for s in (0, 1, 5):
        v = float(sched(s))
        assert np.isfinite(v) and v >= 0.0
    # and genuinely NO warmup: step 0 trains at (near-)base lr, not ~0
    assert float(sched(0)) > 1e-4


def test_eval_predict_step_matches_separate_calls(raw_batch):
    """The fused val-loop step (one forward for loss + decode heads) must
    reproduce eval_step's stats and predict_step's heads exactly."""
    state = trainer.create_train_state(TINY, jax.random.PRNGKey(0), max_iters=10)
    fn = pipeline.make_batch_fn(TINY, synthetic.camera_K(), augment=False)
    batch = fn(jax.random.PRNGKey(1), raw_batch)

    stats_sep = trainer.eval_step(state, batch)
    pred_sep = trainer.predict_step(state, batch)
    stats_fused, pred_fused = trainer.eval_predict_step(state, batch)

    for k in stats_sep:
        np.testing.assert_allclose(
            np.asarray(stats_fused[k]), np.asarray(stats_sep[k]), rtol=1e-6
        )
    for k in pred_sep:
        np.testing.assert_allclose(
            np.asarray(pred_fused[k]), np.asarray(pred_sep[k]), rtol=1e-6
        )


def test_resume_schedule_state():
    """--resume_step surgery (cli/train_demo.py): the lr-schedule count
    advances to N (so the baked warmup+poly schedule replays its tail), the
    Adam moment count stays 0 (bias correction must match fresh moments),
    state.step becomes N, and the pytree STRUCTURE is unchanged (same-shape
    avals => the parent's compiled executable is reused verbatim)."""
    state = trainer.create_train_state(TINY, jax.random.PRNGKey(0), max_iters=1000)
    resumed = trainer.resume_schedule_state(state, 600)

    assert int(resumed.step) == 600
    names = [type(s).__name__ for s in resumed.opt_state]
    assert "ScaleByAdamState" in names and "ScaleByScheduleState" in names
    for s in resumed.opt_state:
        if type(s).__name__ == "ScaleByScheduleState":
            assert int(s.count) == 600
        if type(s).__name__ == "ScaleByAdamState":
            assert int(s.count) == 0
    # identical treedef + leaf shapes/dtypes -> no recompile on resume
    t0 = jax.tree_util.tree_structure((state.step, state.opt_state))
    t1 = jax.tree_util.tree_structure((resumed.step, resumed.opt_state))
    assert t0 == t1
    for a, b in zip(jax.tree_util.tree_leaves((state.step, state.opt_state)),
                    jax.tree_util.tree_leaves((resumed.step, resumed.opt_state))):
        assert a.shape == b.shape and a.dtype == b.dtype
