"""Model shape/init tests: flagship forward, attention machinery, DCN."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtapose_tpu.config import ModelConfig
from sgtapose_tpu.models import attention as attn_lib
from sgtapose_tpu.models.deform_conv import DeformConv2d
from sgtapose_tpu.models.sgta import SGTAPose, create_model

# tiny config: 64x64 input -> 16x16 output, small windows
TINY = ModelConfig(
    input_res=(64, 64),
    kernel_list=(3, 3, 3, 1, 1, 1),
)


def tiny_inputs(B=1):
    H, W = TINY.input_res
    Ho, Wo = TINY.output_res
    C = TINY.num_classes
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    return dict(
        cur_img=jax.random.normal(ks[0], (B, H, W, 3)),
        pre_img=jax.random.normal(ks[1], (B, H, W, 3)),
        pre_hm=jax.random.uniform(ks[2], (B, H, W, 1)),
        repro_hm=jax.random.uniform(ks[3], (B, H, W, 1)),
        pre_hm_cls=jax.random.uniform(ks[4], (B, Ho, Wo, C)),
        repro_hm_cls=jax.random.uniform(ks[5], (B, Ho, Wo, C)),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    model = SGTAPose(TINY)
    variables = model.init(jax.random.PRNGKey(1), **tiny_inputs(), train=False)
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    out = model.apply(variables, **tiny_inputs(), train=False)
    Ho, Wo = TINY.output_res
    assert out["hm"].shape == (1, Ho, Wo, 7)
    assert out["reg"].shape == (1, Ho, Wo, 2)
    assert out["tracking"].shape == (1, Ho, Wo, 2)
    assert np.isfinite(np.asarray(out["hm"])).all()


def test_hm_bias_init(model_and_vars):
    """hm head final bias must be prior_bias=-4.6 -> sigmoid ~ 0.01."""
    _, variables = model_and_vars
    hm_out = model_and_vars[0].apply(variables, **tiny_inputs(), train=False)["hm"]
    mean_sig = float(jax.nn.sigmoid(hm_out).mean())
    assert mean_sig < 0.1, f"expected near-zero initial heatmap, got {mean_sig}"


def test_weight_tied_transformer(model_and_vars):
    """The 3-layer encoder must hold exactly ONE layer's parameters."""
    _, variables = model_and_vars
    t0 = variables["params"]["transformer_0"]
    assert set(t0.keys()) == {"layer"}, t0.keys()


def test_batch_invariance(model_and_vars):
    """Sample 0 of a batch-2 forward == batch-1 forward (no cross-batch leaks
    through the Siamese batch-stacking or the gather/scatter)."""
    model, variables = model_and_vars
    i1 = tiny_inputs(B=2)
    out2 = model.apply(variables, **i1, train=False)
    i0 = {k: v[:1] for k, v in i1.items()}
    out1 = model.apply(variables, **i0, train=False)
    np.testing.assert_allclose(
        np.asarray(out2["hm"][0]), np.asarray(out1["hm"][0]), atol=2e-4
    )


def test_int8_quantized_forward(model_and_vars):
    """int8 serving mode (models/layers.py): same param tree (the quantizable
    Conv subclass keeps nn.Conv's auto-naming), small output deviation, and
    the context flag restores cleanly."""
    from sgtapose_tpu.models import layers

    model, variables = model_and_vars
    inp = tiny_inputs()
    out_f = model.apply(variables, **inp, train=False)
    qapply = layers.quantized_apply(
        lambda v, **kw: model.apply(v, **kw, train=False)
    )
    assert layers.quant_mode() is None  # flag restored after wrapping
    out_q = qapply(variables, **inp)
    assert layers.quant_mode() is None
    for k in out_f:
        d = np.abs(np.asarray(out_f[k]) - np.asarray(out_q[k]))
        assert d.max() < 0.05, (k, d.max())  # int8 quantization error bound
        assert d.max() > 0.0, "quantized path did not engage"
    with pytest.raises(ValueError):
        layers.quantized("fp4").__enter__()


def test_int8_static_scales(model_and_vars):
    """Calibrated static-scale serving: layers.calibrate records one max per
    quantizable conv site in call order, and the static-scale forward tracks
    the float forward within int8 error."""
    from sgtapose_tpu.models import layers

    model, variables = model_and_vars
    inp = tiny_inputs()
    args = (
        inp["cur_img"], inp["pre_img"], inp["pre_hm"], inp["repro_hm"],
        inp["pre_hm_cls"], inp["repro_hm_cls"],
    )
    scales = layers.calibrate(
        lambda *a: model.apply(variables, *a, train=False), [args]
    )
    assert len(scales) > 20 and all(s > 0 for s in scales)
    out_f = model.apply(variables, *args, train=False)
    out_q = layers.quantized_apply(
        lambda v, *a: model.apply(v, *a, train=False), "int8", scales=scales
    )(variables, *args)
    for k in out_f:
        d = np.abs(np.asarray(out_f[k]) - np.asarray(out_q[k]))
        assert 0.0 < d.max() < 0.05, (k, d.max())

    # min_ch gate: an impossible threshold quantizes nothing (exact float
    # reproduction), and a mid threshold still consumes the SAME scale list
    # (one per plain site) while quantizing fewer sites -> smaller error
    out_g = layers.quantized_apply(
        lambda v, *a: model.apply(v, *a, train=False), "int8",
        scales=scales, min_ch=10**6,
    )(variables, *args)
    for k in out_f:
        np.testing.assert_array_equal(np.asarray(out_f[k]), np.asarray(out_g[k]))
    out_m = layers.quantized_apply(
        lambda v, *a: model.apply(v, *a, train=False), "int8",
        scales=scales, min_ch=64,
    )(variables, *args)
    for k in out_f:
        d_mid = np.abs(np.asarray(out_f[k]) - np.asarray(out_m[k])).max()
        d_vs_all = np.abs(np.asarray(out_q[k]) - np.asarray(out_m[k])).max()
        # engaged (differs from float) but a genuinely different subset
        # (differs from the quantize-everything output) within int8 error
        assert 0.0 < d_mid < 0.05 and d_vs_all > 0.0, (k, d_mid, d_vs_all)


def test_int8_train_fake_quant_gradients():
    """QAT mode "int8_train": fake-quant forward tracks the real-int8 forward,
    and gradients flow (straight-through) — finite and nonzero."""
    import flax.linen as nn
    from sgtapose_tpu.models import layers

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return layers.Conv(8, kernel_size=(3, 3), padding=1)(x)

    m = M()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    v = m.init(jax.random.PRNGKey(1), x)

    def loss(params, mode):
        fn = layers.quantized_apply(m.apply, mode)
        return jnp.sum(fn({"params": params}, x) ** 2)

    l_serve = loss(v["params"], "int8")
    l_fake = loss(v["params"], "int8_train")
    # same quantization noise up to accumulator rounding
    assert abs(float(l_serve) - float(l_fake)) < 1e-3 * max(1.0, float(l_serve))
    g = jax.grad(lambda p: loss(p, "int8_train"))(v["params"])
    gn = float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    )
    assert np.isfinite(gn) and gn > 0.0


def test_topk_class_indices():
    hm = jnp.zeros((1, 8, 10, 2))
    hm = hm.at[0, 3, 4, 0].set(1.0)  # class 0 peak at (x=4, y=3)
    hm = hm.at[0, 6, 7, 1].set(1.0)  # class 1 peak at (x=7, y=6)
    xy = attn_lib.topk_class_indices(hm, 1)
    assert xy.shape == (1, 2, 2)
    np.testing.assert_array_equal(np.asarray(xy[0, 0]), [4, 3])
    np.testing.assert_array_equal(np.asarray(xy[0, 1]), [7, 6])


def test_window_gather_scatter_roundtrip():
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    xy = jnp.array([[[5.0, 6.0], [12.0, 3.0]]] * 2)  # (2, 2, 2)
    ids = attn_lib.window_feat_ids(xy, 1.0, 3, 16, 16)
    assert ids.shape == (2, 2 * 9)
    vals = attn_lib.gather_window_features(feats, ids)
    assert vals.shape == (2, 18, 4)
    # scatter back the gathered values -> unchanged map
    out = attn_lib.scatter_window_features(feats, ids, vals)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-6)


def test_window_ids_clamped():
    xy = jnp.array([[[0.0, 0.0]]])  # corner: window clamps at border
    ids = attn_lib.window_feat_ids(xy, 1.0, 3, 16, 16)
    assert int(ids.min()) >= 0
    assert int(ids.max()) < 16 * 16


def test_deform_conv_init_matches_plain_conv():
    """Zero-init offsets + 0.5 masks: DCN at init == plain 3x3 conv * 0.5."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    m = DeformConv2d(6)
    variables = m.init(jax.random.PRNGKey(3), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 8, 8, 6)

    # oracle: plain 3x3 conv with the same kernel, halved (mask=sigmoid(0)=0.5)
    kern = variables["params"]["kernel"]["kernel"].reshape(3, 3, 4, 6)
    bias = variables["params"]["kernel"]["bias"]
    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) * 0.5 + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_create_model_factory():
    assert isinstance(create_model(TINY), SGTAPose)


def test_deform_sample_custom_vjp_matches_autodiff():
    """The hand-written DCN backward (segment_sum feature grad + analytic
    bilinear offset/mask grads) must agree with autodiff of the identical
    forward math (f32 and bf16 cotangent paths)."""
    import jax

    from sgtapose_tpu.models import deform_conv as dc

    def ref_forward(feat, offsets, masks):
        B, H, W, C = feat.shape
        corners, weights, _, _ = dc._sample_pieces(feat, offsets, masks)
        out = sum(v * w for (v, _, _), w in zip(corners, weights))
        return (out * masks[..., None]).reshape(B, H, W, 9 * C)

    rng = np.random.RandomState(5)
    B, H, W, C = 2, 6, 6, 4
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    offsets = jnp.asarray(rng.randn(B, H, W, 18).astype(np.float32)) * 1.3
    masks = jnp.asarray(rng.rand(B, H, W, 9).astype(np.float32))

    def loss_custom(f, o, m):
        return jnp.sum(jnp.sin(dc.deform_sample_batch(f, o, m)))

    def loss_ref(f, o, m):
        return jnp.sum(jnp.sin(ref_forward(f, o, m)))

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(feat, offsets, masks)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(feat, offsets, masks)
    for gc, gr, name in zip(g_custom, g_ref, ("feat", "offsets", "masks")):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(gr), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )

    # bf16 path: runs and stays finite with matching dtypes
    fb, ob, mb = (x.astype(jnp.bfloat16) for x in (feat, offsets, masks))
    gb = jax.grad(lambda f: jnp.sum(dc.deform_sample_batch(f, ob, mb).astype(jnp.float32)))(fb)
    assert gb.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(gb, np.float32)).all()


def test_deform_sample_chunked_matches_unchunked():
    """The slab-chunked memory path (lax.scan over output rows) is the same
    op: identical forward values and identical gradients, including chunk
    counts that don't divide H (largest-divisor fallback) and chunks > H."""
    import jax

    from sgtapose_tpu.models import deform_conv as dc

    rng = np.random.RandomState(11)
    B, H, W, C = 2, 6, 5, 4
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    offsets = jnp.asarray(rng.randn(B, H, W, 18).astype(np.float32)) * 1.7
    masks = jnp.asarray(rng.rand(B, H, W, 9).astype(np.float32))

    ref = dc.deform_sample_batch(feat, offsets, masks)
    g_ref = jax.grad(
        lambda f, o, m: jnp.sum(jnp.sin(dc.deform_sample_batch(f, o, m))),
        argnums=(0, 1, 2),
    )(feat, offsets, masks)

    for chunks in (2, 3, 4, 64):  # 4 -> divisor fallback to 3; 64 -> 6
        out = dc.deform_sample_batch_chunked(chunks, feat, offsets, masks)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6,
            err_msg=f"forward chunks={chunks}",
        )
        g = jax.grad(
            lambda f, o, m: jnp.sum(
                jnp.sin(dc.deform_sample_batch_chunked(chunks, f, o, m))
            ),
            argnums=(0, 1, 2),
        )(feat, offsets, masks)
        for gc, gr, name in zip(g, g_ref, ("feat", "offsets", "masks")):
            np.testing.assert_allclose(
                np.asarray(gc), np.asarray(gr), rtol=1e-5, atol=1e-6,
                err_msg=f"{name} chunks={chunks}",
            )


def test_deform_conv_chunked_module_and_remat():
    """DeformConv2d(chunks=N) and nn.remat'd DeformNode produce the same
    outputs/params as the plain module (the knobs change memory, not math)."""
    import jax
    import flax.linen as nn

    from sgtapose_tpu.models import deform_conv as dc
    from sgtapose_tpu.models.dla import DeformNode

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 6).astype(np.float32))

    plain = dc.DeformConv2d(10)
    chunked = dc.DeformConv2d(10, chunks=4)
    v = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(chunked.apply(v, x)), np.asarray(plain.apply(v, x)),
        rtol=1e-6, atol=1e-6,
    )

    node = DeformNode(10)
    node_r = DeformNode(10, dcn_chunks=2, dcn_remat=True)
    vn = node.init(jax.random.PRNGKey(1), x)
    # identical param tree (remat is transparent to variable paths)
    assert jax.tree_util.tree_structure(
        node_r.init(jax.random.PRNGKey(1), x)
    ) == jax.tree_util.tree_structure(vn)
    np.testing.assert_allclose(
        np.asarray(node_r.apply(vn, x, train=False)),
        np.asarray(node.apply(vn, x, train=False)),
        rtol=1e-6, atol=1e-6,
    )
    # gradient flows through the remat'd chunked node
    def loss(params, mod):
        out = mod.apply({"params": params, "batch_stats": vn["batch_stats"]},
                        x, train=False)
        return jnp.sum(out ** 2)

    g_plain = jax.grad(loss)(vn["params"], node)
    g_remat = jax.grad(loss)(vn["params"], node_r)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g_plain, g_remat,
    )


@pytest.mark.parametrize("robot,n_kp", [("kuka", 9), ("ur5e", 8)])
def test_other_robots_forward(robot, n_kp):
    """Kuka (9 kps) / UR5e (8 kps) configs build and forward (ref
    get_keypoint_names opts_parallel.py:439-475; heads sized per robot)."""
    import jax

    from sgtapose_tpu.config import KEYPOINT_NAMES, ModelConfig
    from sgtapose_tpu.models.sgta import create_model

    assert len(KEYPOINT_NAMES[robot]) == n_kp
    cfg = ModelConfig(
        input_res=(64, 64), kernel_list=(3, 3, 3, 1, 1, 1),
        dla_node="conv", num_classes=n_kp,
    )
    m = create_model(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    hm = jnp.zeros((1, 64, 64, 1))
    cls = jnp.zeros((1, 16, 16, n_kp))
    v = m.init(jax.random.PRNGKey(0), img, img, hm, hm, cls, cls, train=False)
    out = m.apply(v, img, img, hm, hm, cls, cls, train=False)
    assert out["hm"].shape == (1, 16, 16, n_kp)
