"""Forward parity against the LIVING reference torch model.

Instantiates the reference's DLA_PlanAWindow_l3new (ref dla.py:1458-1554,
conv decoder nodes — the DCNv2 CUDA extension is absent on CPU), randomizes
its weights and BN statistics, converts the state_dict with our converter,
and asserts forward agreement on identical inputs. This is the non-circular
version of the converter test: a wrong mapping (e.g. swapped tree1/tree2)
changes the outputs and fails here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sgtapose_tpu.config import ModelConfig  # noqa: E402
from sgtapose_tpu.models.sgta import SGTAPose  # noqa: E402
from sgtapose_tpu.utils import torch_convert as tc  # noqa: E402

import ref_oracle  # noqa: E402

RES = 256  # input H=W (ref get_topk_features_scale asserts H==W)
CLS = RES // 4  # 64: class-prior heatmap resolution


def _randomize(model, seed=317):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def _cls_prior_maps(rng, spread=8):
    """Class-prior heatmaps with one strong, well-separated bump per class.

    Peaks sit on a grid with spacing `spread` so the top-k windows of all 6
    levels are disjoint across classes: torch's duplicate-index scatter is
    last-write-wins while XLA's is unspecified, so overlapping windows would
    make parity ill-defined (both frameworks would be self-consistent but
    divergent). Real priors are near-disjoint too (one keypoint per class).
    """
    hm = rng.rand(1, 7, CLS, CLS).astype(np.float32) * 0.1
    for c in range(7):
        y = spread // 2 + spread * c
        x = spread // 2 + spread * ((c * 3) % 7)
        hm[0, c, y, x] = 5.0 + c  # unambiguous argmax
    return hm


@pytest.fixture(scope="module")
def parity_pair():
    dla = ref_oracle.ref_dla_module()
    opt = ref_oracle.make_ref_opt()
    ref_model = dla.DLA_PlanAWindow_l3new(
        34, ref_oracle.HEADS, ref_oracle.HEAD_CONVS, opt
    )
    _randomize(ref_model)
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = ModelConfig(input_res=(RES, RES), dla_node="conv")
    our_model = SGTAPose(cfg)
    import jax

    variables = our_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1, RES, RES, 3)),
        jnp.zeros((1, RES, RES, 1)), jnp.zeros((1, RES, RES, 1)),
        jnp.zeros((1, CLS, CLS, 7)), jnp.zeros((1, CLS, CLS, 7)),
        train=False,
    )
    params, stats, report = tc.convert_state_dict(
        sd, variables["params"], variables["batch_stats"],
        bgr_to_rgb=False, strict=True, dla_node="conv",
    )
    return ref_model, our_model, {"params": params, "batch_stats": stats}, report


def test_converter_full_coverage(parity_pair):
    _, _, _, report = parity_pair
    assert not report["missing"]
    assert not report["mismatched"]
    assert report["n_converted"] > 200


def test_forward_parity(parity_pair):
    ref_model, our_model, variables, _ = parity_pair
    rng = np.random.RandomState(7)
    cur = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre_hm = rng.rand(1, 1, RES, RES).astype(np.float32)
    repro_hm = rng.rand(1, 1, RES, RES).astype(np.float32)
    pre_cls = _cls_prior_maps(np.random.RandomState(8))
    repro_cls = _cls_prior_maps(np.random.RandomState(9))

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(cur),
            pre_img=torch.from_numpy(pre),
            pre_hm=torch.from_numpy(pre_hm),
            repro_hm=torch.from_numpy(repro_hm),
            pre_hm_cls=torch.from_numpy(pre_cls),
            repro_hm_cls=torch.from_numpy(repro_cls),
        )[0]

    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    ours = our_model.apply(
        variables,
        nhwc(cur), nhwc(pre), nhwc(pre_hm), nhwc(repro_hm),
        nhwc(pre_cls), nhwc(repro_cls),
        train=False,
    )

    # float32: XLA and torch accumulate convolutions differently, so agreement
    # is limited by f32 noise amplified through ~40 layers; the measured
    # divergence is ~1e-4 absolute. The exactness proof is the f64 test below.
    for head in ("hm", "reg", "tracking"):
        ref_h = ref_out[head].numpy()  # NCHW
        our_h = np.transpose(np.asarray(ours[head]), (0, 3, 1, 2))
        scale = max(np.abs(ref_h).max(), 1e-3)
        max_err = np.abs(ref_h - our_h).max()
        assert max_err < 1e-3 and max_err / scale < 5e-3, (
            f"{head}: max|Δ|={max_err:.3e} scale={scale:.3e} "
            f"(rel {max_err / scale:.3e})"
        )


def test_forward_parity_f64_exact(parity_pair):
    """In float64 the two implementations must agree to near machine
    precision — this isolates mapping/architecture errors from f32 noise."""
    import jax

    ref_model, our_model, variables, _ = parity_pair
    rng = np.random.RandomState(11)
    cur = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre_hm = rng.rand(1, 1, RES, RES).astype(np.float32)
    repro_hm = rng.rand(1, 1, RES, RES).astype(np.float32)
    pre_cls = _cls_prior_maps(np.random.RandomState(12))
    repro_cls = _cls_prior_maps(np.random.RandomState(13))

    ref64 = ref_model.double()
    with torch.no_grad():
        ref_out = ref64(
            torch.from_numpy(cur).double(),
            pre_img=torch.from_numpy(pre).double(),
            pre_hm=torch.from_numpy(pre_hm).double(),
            repro_hm=torch.from_numpy(repro_hm).double(),
            pre_hm_cls=torch.from_numpy(pre_cls).double(),
            repro_hm_cls=torch.from_numpy(repro_cls).double(),
        )[0]
    ref_model.float()  # restore for any later use of the fixture

    with jax.enable_x64(True):
        vars64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), variables)
        nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)), jnp.float64)
        ours = our_model.apply(
            vars64,
            nhwc(cur), nhwc(pre), nhwc(pre_hm), nhwc(repro_hm),
            nhwc(pre_cls), nhwc(repro_cls),
            train=False,
        )
        for head in ("hm", "reg", "tracking"):
            ref_h = ref_out[head].numpy()
            our_h = np.transpose(np.asarray(ours[head]), (0, 3, 1, 2))
            max_err = np.abs(ref_h - our_h).max()
            assert max_err < 1e-9, f"{head}: f64 max|Δ|={max_err:.3e}"


def test_cat_arch_structure_and_reference_bug():
    """DLA_PlanACAT: the reference model is BROKEN as shipped — BaseModelPlanA
    builds its heads for 64 input channels (base_model.py:62 last_channel=64)
    while the CAT decoder outputs 128 (channels_up = 2*channels,
    dla.py:1125-1133), so its forward crashes. This test (a) documents that
    crash against the real reference, (b) proves our SGTAPoseCat matches the
    reference structurally everywhere conversion is POSSIBLE (backbone +
    doubled decoder: 287 tensors map exactly; only the 3 impossible head
    kernels mismatch), and (c) shows our fixed version (heads over the
    128-ch decoder — the evident intent) runs."""
    import jax

    from sgtapose_tpu.models.variants import SGTAPoseCat

    dla = ref_oracle.ref_dla_module()
    opt = ref_oracle.make_ref_opt()
    ref_model = dla.DLA_PlanACAT(34, ref_oracle.HEADS, ref_oracle.HEAD_CONVS, opt)
    _randomize(ref_model, seed=99)
    ref_model.eval()

    # (a) the reference forward crashes on the 64-vs-128 head mismatch
    with pytest.raises(RuntimeError, match="128 channels"):
        with torch.no_grad():
            ref_model(
                torch.rand(1, 3, 64, 64),
                pre_img=torch.rand(1, 3, 64, 64),
                pre_hm=torch.rand(1, 1, 64, 64),
                repro_hm=torch.rand(1, 1, 64, 64),
            )

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    cfg = ModelConfig(arch="dlapacat_34", input_res=(RES, RES), dla_node="conv")
    our_model = SGTAPoseCat(cfg)
    variables = our_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1, RES, RES, 3)),
        jnp.zeros((1, RES, RES, 1)), jnp.zeros((1, RES, RES, 1)),
        train=False,
    )
    params, stats, report = tc.convert_state_dict(
        sd, variables["params"], variables["batch_stats"],
        bgr_to_rgb=False, strict=False, dla_node="conv", arch="dlapacat",
    )
    # (b) everything convertible converts; the only mismatches are the three
    # head input kernels the reference itself got wrong
    assert not report["missing"], report["missing"]
    bad = {m[0] for m in report["mismatched"]}
    assert bad == {
        "decoder/hm/Conv_0/kernel",
        "decoder/reg/Conv_0/kernel",
        "decoder/tracking/Conv_0/kernel",
    }, report["mismatched"]
    assert report["n_converted"] >= 280

    # (c) our fixed CAT runs with the converted backbone+decoder
    rng = np.random.RandomState(21)
    nhwc = lambda a: jnp.asarray(a)
    out = our_model.apply(
        {"params": params, "batch_stats": stats},
        nhwc(rng.rand(1, RES, RES, 3).astype(np.float32)),
        nhwc(rng.rand(1, RES, RES, 3).astype(np.float32)),
        nhwc(rng.rand(1, RES, RES, 1).astype(np.float32)),
        nhwc(rng.rand(1, RES, RES, 1).astype(np.float32)),
        train=False,
    )
    assert np.isfinite(np.asarray(out["hm"])).all()


def _global_topk_priors(rng, n_top=28, res=RES):
    """1-channel full-res priors whose top-28 flat indices are (a) strictly
    ordered by value (no torch/XLA top-k tie ambiguity) and (b) spaced so the
    idx/(H*W) fraction maps to DISTINCT cells at every trunk level down to
    res/32 (DLA_PlanA's flat-fraction renormalization, dla.py:889-896 +
    :972-987) — duplicate scatter targets would make parity ill-defined."""
    hw = res * res
    coarse = (res // 32) ** 2  # coarsest level's flat size
    stride = hw // coarse  # one fraction-block per coarse cell
    hm = rng.rand(1, 1, res, res).astype(np.float32) * 0.4
    flat = hm.reshape(-1)
    for k in range(n_top):
        idx = (2 * k) * stride + stride // 3
        flat[idx] = 5.0 - k * 0.05
    return hm


def test_forward_parity_global_arch_f64():
    """DLA_PlanA (global top-K attention, all 6 levels, plain MHA) f64-exact
    forward parity against the real reference model, including the
    flat-index-fraction token selection quirk."""
    import jax

    from sgtapose_tpu.models.variants import SGTAPoseGlobal

    dla = ref_oracle.ref_dla_module()
    opt = ref_oracle.make_ref_opt()
    ref_model = dla.DLA_PlanA(34, ref_oracle.HEADS, ref_oracle.HEAD_CONVS, opt)
    _randomize(ref_model, seed=41)
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = ModelConfig(arch="dlapa_34", input_res=(RES, RES), dla_node="conv")
    our_model = SGTAPoseGlobal(cfg)
    variables = our_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1, RES, RES, 3)),
        jnp.zeros((1, RES, RES, 1)), jnp.zeros((1, RES, RES, 1)),
        train=False,
    )
    params, stats, report = tc.convert_state_dict(
        sd, variables["params"], variables["batch_stats"],
        bgr_to_rgb=False, strict=True, dla_node="conv", arch="dlapa",
    )
    assert not report["missing"] and not report["mismatched"], report

    rng = np.random.RandomState(31)
    cur = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre_hm = _global_topk_priors(np.random.RandomState(32))
    repro_hm = _global_topk_priors(np.random.RandomState(33))

    ref64 = ref_model.double()
    with torch.no_grad():
        ref_out = ref64(
            torch.from_numpy(cur).double(),
            pre_img=torch.from_numpy(pre).double(),
            pre_hm=torch.from_numpy(pre_hm).double(),
            repro_hm=torch.from_numpy(repro_hm).double(),
        )[0]

    with jax.enable_x64(True):
        vars64 = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64),
            {"params": params, "batch_stats": stats},
        )
        nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)), jnp.float64)
        ours = our_model.apply(
            vars64, nhwc(cur), nhwc(pre), nhwc(pre_hm), nhwc(repro_hm),
            train=False,
        )
        for head in ("hm", "reg", "tracking"):
            ref_h = ref_out[head].numpy()
            our_h = np.transpose(np.asarray(ours[head]), (0, 3, 1, 2))
            max_err = np.abs(ref_h - our_h).max()
            assert max_err < 1e-9, f"{head}: f64 max|Δ|={max_err:.3e}"


def _f64_compare(ref_model, our_model, variables, torch_inputs, jax_inputs):
    """Shared f64-exact head comparison."""
    import jax

    args, kwargs = torch_inputs
    ref64 = ref_model.double()
    with torch.no_grad():
        ref_out = ref64(
            *[t.double() for t in args],
            **{k: v.double() for k, v in kwargs.items()},
        )[0]
    with jax.enable_x64(True):
        vars64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), variables)
        ours = our_model.apply(
            vars64, *[jnp.asarray(a, jnp.float64) for a in jax_inputs],
            train=False,
        )
        for head in ("hm", "reg", "tracking"):
            ref_h = ref_out[head].numpy()
            our_h = np.transpose(np.asarray(ours[head]), (0, 3, 1, 2))
            max_err = np.abs(ref_h - our_h).max()
            assert max_err < 1e-9, f"{head}: f64 max|Δ|={max_err:.3e}"


def test_forward_parity_window_dense_arch_f64():
    """DLA_PlanAWindow (dlapawd): window attention levels 0-2 + dense
    cat_layer tail 3-5, f64-exact vs the real reference model."""
    import jax

    from sgtapose_tpu.models.variants import SGTAPoseWindowDense

    dla = ref_oracle.ref_dla_module()
    opt = ref_oracle.make_ref_opt()
    ref_model = dla.DLA_PlanAWindow(34, ref_oracle.HEADS, ref_oracle.HEAD_CONVS, opt)
    _randomize(ref_model, seed=51)
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = ModelConfig(arch="dlapawd_34", input_res=(RES, RES), dla_node="conv")
    our_model = SGTAPoseWindowDense(cfg)
    variables = our_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1, RES, RES, 3)),
        jnp.zeros((1, RES, RES, 1)), jnp.zeros((1, RES, RES, 1)),
        jnp.zeros((1, CLS, CLS, 7)), jnp.zeros((1, CLS, CLS, 7)),
        train=False,
    )
    params, stats, report = tc.convert_state_dict(
        sd, variables["params"], variables["batch_stats"],
        bgr_to_rgb=False, strict=True, dla_node="conv", arch="dlapawd",
    )
    assert not report["missing"] and not report["mismatched"], report

    rng = np.random.RandomState(61)
    cur = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre_hm = rng.rand(1, 1, RES, RES).astype(np.float32)
    repro_hm = rng.rand(1, 1, RES, RES).astype(np.float32)
    pre_cls = _cls_prior_maps(np.random.RandomState(62))
    repro_cls = _cls_prior_maps(np.random.RandomState(63))

    nhwc = lambda a: np.transpose(a, (0, 2, 3, 1))
    _f64_compare(
        ref_model, our_model, {"params": params, "batch_stats": stats},
        (
            (torch.from_numpy(cur),),
            dict(
                pre_img=torch.from_numpy(pre),
                pre_hm=torch.from_numpy(pre_hm),
                repro_hm=torch.from_numpy(repro_hm),
                pre_hm_cls=torch.from_numpy(pre_cls),
                repro_hm_cls=torch.from_numpy(repro_cls),
            ),
        ),
        (nhwc(cur), nhwc(pre), nhwc(pre_hm), nhwc(repro_hm),
         nhwc(pre_cls), nhwc(repro_cls)),
    )


@pytest.mark.parametrize("mode", ["shared_repro", "wo_shared"])
def test_forward_parity_ablation_arch_f64(mode):
    """DLA_PlanAAblation: dense cat_layer fusion, trunk sharing per mode,
    f64-exact vs the real reference model. Runs at 128 (not RES=256): the
    ablation archs take no per-class top-k priors, so the level-5
    cell-disjointness constraint that pins the other archs to 256 does not
    apply — and the smaller compile roughly quarters this test's cost."""
    import dataclasses

    import jax

    from sgtapose_tpu.models.variants import SGTAPoseAblation

    RES = 128  # shadows the module RES for this test only

    dla = ref_oracle.ref_dla_module()
    opt = ref_oracle.make_ref_opt(phase=f"ablation_{mode}")
    ref_model = dla.DLA_PlanAAblation(34, ref_oracle.HEADS, ref_oracle.HEAD_CONVS, opt)
    _randomize(ref_model, seed=71)
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = ModelConfig(
        arch="dlaabla_34", input_res=(RES, RES), dla_node="conv",
        ablation_mode=mode,
    )
    our_model = SGTAPoseAblation(cfg)
    variables = our_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1, RES, RES, 3)),
        jnp.zeros((1, RES, RES, 1)), jnp.zeros((1, RES, RES, 1)),
        train=False,
    )
    conv_arch = "dlaabla_wo_shared" if mode == "wo_shared" else "dlaabla"
    params, stats, report = tc.convert_state_dict(
        sd, variables["params"], variables["batch_stats"],
        bgr_to_rgb=False, strict=True, dla_node="conv", arch=conv_arch,
    )
    assert not report["missing"] and not report["mismatched"], report

    rng = np.random.RandomState(81)
    cur = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre = rng.rand(1, 3, RES, RES).astype(np.float32)
    pre_hm = rng.rand(1, 1, RES, RES).astype(np.float32)
    repro_hm = rng.rand(1, 1, RES, RES).astype(np.float32)

    nhwc = lambda a: np.transpose(a, (0, 2, 3, 1))
    _f64_compare(
        ref_model, our_model, {"params": params, "batch_stats": stats},
        (
            (torch.from_numpy(cur),),
            dict(
                pre_img=torch.from_numpy(pre),
                pre_hm=torch.from_numpy(pre_hm),
                repro_hm=torch.from_numpy(repro_hm),
            ),
        ),
        (nhwc(cur), nhwc(pre), nhwc(pre_hm), nhwc(repro_hm)),
    )
