"""Checkpoint converter: every flagship param leaf must map to a reference
state_dict name with the right shape transform."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtapose_tpu.config import ModelConfig
from sgtapose_tpu.models.sgta import SGTAPose
from sgtapose_tpu.utils import torch_convert as tc


@pytest.fixture(scope="module")
def flagship_vars():
    cfg = ModelConfig(input_res=(64, 64), kernel_list=(3, 3, 3, 1, 1, 1))
    m = SGTAPose(cfg)
    return m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 16, 16, 7)), jnp.zeros((1, 16, 16, 7)),
        train=False,
    )


def _inverse_shape(our_path, shape, tf):
    """torch-side shape for a given flax leaf shape under transform tf."""
    if tf is tc._conv:
        kh, kw, i, o = shape
        return (o, i, kh, kw)
    if tf is tc._linear:
        i, o = shape
        return (o, i)
    if tf is tc._dcn_main:
        _, _, ni, o = shape
        return (o, ni // 9, 3, 3)
    if tf is tc._up:
        k, _, _, c = shape
        return (c, 1, k, k)
    return tuple(shape)


def build_fake_state_dict(params, batch_stats, rng):
    mapping = tc._flag_map()
    sd = {}
    for tree in (params, batch_stats):
        for path, leaf in tc._tree_paths(tree):
            if path in mapping:
                ref, tf = mapping[path]
            else:
                head, leafname = path.rsplit("/", 1)
                suffix = tc._BN_PARAM.get(leafname) or tc._BN_STATS.get(leafname)
                assert head in mapping and suffix, f"unmapped path: {path}"
                ref, tf = mapping[head][0] + "." + suffix, None
            shape = _inverse_shape(path, leaf.shape, tf)
            sd[ref] = rng.randn(*shape).astype(np.float32) if shape else np.float32(rng.randn())
    return sd


def test_full_coverage_and_shapes(flagship_vars, rng):
    params = flagship_vars["params"]
    stats = flagship_vars["batch_stats"]
    sd = build_fake_state_dict(params, stats, rng)
    new_params, new_stats, report = tc.convert_state_dict(
        sd, params, stats, strict=True
    )
    assert not report["missing"]
    assert not report["mismatched"]
    # every leaf shape preserved
    for (p1, a), (p2, b) in zip(
        tc._tree_paths(params), tc._tree_paths(new_params)
    ):
        assert p1 == p2 and tuple(np.shape(b)) == tuple(a.shape), p1


def test_conv_transform_numerics(flagship_vars, rng):
    params = flagship_vars["params"]
    stats = flagship_vars["batch_stats"]
    sd = build_fake_state_dict(params, stats, rng)
    new_params, _, _ = tc.convert_state_dict(sd, params, stats, strict=True, bgr_to_rgb=False)
    # conv: torch (O,I,kh,kw) -> flax (kh,kw,I,O)
    w_t = sd["base.level0.0.weight"]
    w_f = new_params["base"]["level0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(w_f, np.transpose(w_t, (2, 3, 1, 0)))
    # linear: torch (O,I) -> (I,O)
    l_t = sd["cat_layer.0.0.weight"]
    l_f = new_params["cat_layer_0"]["fc1"]["kernel"]
    np.testing.assert_allclose(l_f, l_t.T)
    # DCN main: tap-major flatten
    d_t = sd["ida_up.node_1.conv.weight"]  # (O,I,3,3)
    d_f = new_params["ida_up"]["node_1"]["conv"]["kernel"]["kernel"]
    o, i = d_t.shape[0], d_t.shape[1]
    for tap in range(9):
        kh, kw = tap // 3, tap % 3
        np.testing.assert_allclose(
            d_f[0, 0, tap * i : (tap + 1) * i, :], d_t[:, :, kh, kw].T
        )


def test_bgr_flip(flagship_vars, rng):
    params = flagship_vars["params"]
    stats = flagship_vars["batch_stats"]
    sd = build_fake_state_dict(params, stats, rng)
    p_rgb, _, _ = tc.convert_state_dict(sd, params, stats, bgr_to_rgb=True)
    p_bgr, _, _ = tc.convert_state_dict(sd, params, stats, bgr_to_rgb=False)
    a = p_rgb["pre_img_stem"]["Conv_0"]["kernel"]
    b = p_bgr["pre_img_stem"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(a, b[:, :, ::-1, :])


def test_module_prefix_stripped(flagship_vars, rng):
    params = flagship_vars["params"]
    stats = flagship_vars["batch_stats"]
    sd = build_fake_state_dict(params, stats, rng)
    sd_pref = {"module." + k: v for k, v in sd.items()}
    _, _, report = tc.convert_state_dict(sd_pref, params, stats, strict=True)
    assert not report["missing"]


def test_export_roundtrip_dcn(flagship_vars):
    """export_state_dict is the exact inverse of convert_state_dict on every
    flagship leaf (dcn decoder nodes): ours -> torch dict -> ours recovers
    the trees bit-exactly. With the ref->ours forward-parity test this proves
    the ours->torch direction too."""
    params, stats = flagship_vars["params"], flagship_vars["batch_stats"]
    sd = tc.export_state_dict(params, stats, dla_node="dcn", bgr_to_rgb=True)
    # weight-tied copies present for reference-loader compatibility
    assert any(".layers.1." in k for k in sd)
    p2, s2, report = tc.convert_state_dict(
        sd, params, stats, bgr_to_rgb=True, strict=True, dla_node="dcn",
    )
    assert not report["missing"] and not report["mismatched"]
    for tree_a, tree_b in ((params, p2), (stats, s2)):
        for (pa, la), (pb, lb) in zip(
            tc._tree_paths(tree_a), tc._tree_paths(tree_b)
        ):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=pa)


def test_export_loads_into_reference_model():
    """The exported dict loads into the real torch reference model with no
    unexpected keys; missing keys are exactly the known-dead reference params
    (base_layer/repro stems, ImageNet fc, dead tree projections, wh head)."""
    torch = pytest.importorskip("torch")
    import ref_oracle

    dla = ref_oracle.ref_dla_module()
    opt = ref_oracle.make_ref_opt()
    ref_model = dla.DLA_PlanAWindow_l3new(
        34, ref_oracle.HEADS, ref_oracle.HEAD_CONVS, opt
    )

    # flagship kernel_list: the attention pos_embed shape must match the
    # reference model's (n = 7 * K * window^2 per level)
    cfg = ModelConfig(input_res=(64, 64), dla_node="conv")
    m = SGTAPose(cfg)
    variables = m.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 16, 16, 7)), jnp.zeros((1, 16, 16, 7)),
        train=False,
    )
    sd = tc.export_state_dict(
        variables["params"], variables["batch_stats"], dla_node="conv",
    )
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    result = ref_model.load_state_dict(sd_t, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys[:10]
    allowed_missing = (
        "base.base_layer", "base.repro_hm_layer", "base.fc", "wh.",
    )
    for k in result.missing_keys:
        if "num_batches_tracked" in k:
            continue
        if re_dead_projection(k):
            continue
        assert k.startswith(allowed_missing), f"unexpectedly missing: {k}"


def re_dead_projection(k: str) -> bool:
    """Dead levels>1 tree projection params (see converter module docstring)."""
    import re

    return (".project." in k.replace("tree1.project", "")
            and bool(re.search(r"level[2-5]", k)))


def test_imagenet_dla34_trunk_init(flagship_vars):
    """convert_imagenet_dla34 ingests a REAL bare DLA-34 state_dict (built
    from the reference DLA class with the conditioning stems disabled — the
    exact key set of the dla34-ba72cf86.pth ImageNet release) and initializes
    our `base/` trunk from it, leaving everything else at fresh init
    (ref dla.py:339-363 load_pretrained_model semantics)."""
    import ref_oracle
    import torch

    dla = ref_oracle.ref_dla_module()
    opt = ref_oracle.make_ref_opt(pre_img=False, pre_hm=False, ct_modify=False)
    torch.manual_seed(3)
    ref_trunk = dla.DLA([1, 1, 1, 2, 2, 1], [16, 32, 64, 128, 256, 512],
                        block=dla.BasicBlock, opt=opt)
    sd = {k: v.detach().numpy() for k, v in ref_trunk.state_dict().items()}
    assert any(k.startswith("base_layer") for k in sd)
    assert not any(k.startswith("pre_img_layer") for k in sd)

    params = flagship_vars["params"]
    stats = flagship_vars["batch_stats"]
    new_p, new_s, report = tc.convert_imagenet_dla34(sd, params, stats,
                                                     strict=True)
    assert not report["missing"] and not report["mismatched"], report
    assert not report["unused_ref_keys"], report["unused_ref_keys"][:10]
    assert report["n_converted"] > 100  # the whole trunk, not a sliver

    # spot-check numerics: level0 conv kernel is the transposed ref tensor
    np.testing.assert_array_equal(
        new_p["base"]["level0"]["Conv_0"]["kernel"],
        tc._conv(sd["level0.0.weight"]),
    )
    # trunk BN stats came from the state dict
    np.testing.assert_array_equal(
        new_s["base"]["level1"]["BatchNorm_0"]["mean"],
        sd["level1.1.running_mean"],
    )
    # stems + heads + attention stay at fresh init (reference parity:
    # pre_img_layer is NOT ImageNet-initialized)
    np.testing.assert_array_equal(
        new_p["pre_img_stem"]["Conv_0"]["kernel"],
        np.asarray(params["pre_img_stem"]["Conv_0"]["kernel"]),
    )
    np.testing.assert_array_equal(
        new_p["hm"]["Conv_0"]["kernel"], np.asarray(params["hm"]["Conv_0"]["kernel"])
    )

    # map_stem=True additionally copies base_layer -> pre_img_stem (RGB,
    # no channel flip)
    new_p2, _, _ = tc.convert_imagenet_dla34(sd, params, stats, map_stem=True)
    np.testing.assert_array_equal(
        new_p2["pre_img_stem"]["Conv_0"]["kernel"],
        tc._conv(sd["base_layer.0.weight"]),
    )


def test_imagenet_dla34_export_roundtrip(flagship_vars):
    """export_imagenet_dla34 -> convert_imagenet_dla34 is the identity on
    the trunk: exporting our randomly-initialized `base/` subtree as a bare
    ImageNet-format state_dict and re-importing it into a zeroed tree
    restores the trunk exactly (and only the trunk). This is the path the
    --init_backbone trunk-transfer A/B rides (scripts/export_trunk_dla34.py)."""
    params = flagship_vars["params"]
    stats = flagship_vars["batch_stats"]
    sd = tc.export_imagenet_dla34(params, stats)
    # exact release-format key style: level0.0.weight / level2.tree1.bn1.*
    assert "level0.0.weight" in sd and "level2.tree1.bn1.running_mean" in sd
    assert not any(k.startswith(("pre_img", "base.")) for k in sd)

    zeroed_p = jax.tree_util.tree_map(jnp.zeros_like, params)
    zeroed_s = jax.tree_util.tree_map(jnp.zeros_like, stats)
    new_p, new_s, report = tc.convert_imagenet_dla34(sd, zeroed_p, zeroed_s,
                                                     strict=True)
    assert not report["missing"] and not report["mismatched"], report
    assert not report["unused_ref_keys"], report["unused_ref_keys"][:10]

    jax.tree_util.tree_map(
        np.testing.assert_array_equal, new_p["base"], params["base"]
    )
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, new_s["base"], stats["base"]
    )
    # non-trunk modules stay at the target tree's values (zeros here)
    assert float(jnp.abs(new_p["pre_img_stem"]["Conv_0"]["kernel"]).max()) == 0


def test_convert_cli_roundtrip(tmp_path, rng):
    """cli/convert end-to-end: reference-format .pth -> orbax -> back to
    .pth, including the wo_shared ablation arch whose second trunk (base1)
    the plain dlaabla mapping would miss."""
    import torch

    from sgtapose_tpu.cli import convert as convert_cli

    # flagship: synthesize a coverage-complete reference state dict at the
    # template shapes (the CLI inits its template at 64x64; shapes are
    # res-independent)
    args = convert_cli.parse_args(["--torch_ckpt", "x", "--out", "y"])
    state = convert_cli._template_state(args)
    sd = build_fake_state_dict(state.params, state.batch_stats, rng)
    pth = str(tmp_path / "ref.pth")
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save({"epoch": 20, "state_dict": sd_t}, pth)

    out = str(tmp_path / "ckpt")
    convert_cli.main(["--torch_ckpt", pth, "--out", out,
                      "--report_out", str(tmp_path / "report.json")])
    assert os.path.isdir(out)

    back = str(tmp_path / "back.pth")
    convert_cli.main(["--ckpt", out, "--out_pth", back])
    sd2 = torch.load(back, weights_only=False)["state_dict"]
    # round trip is exact on every mapped tensor (the export also emits the
    # weight-tied transformer copies layers.1/2 — compare them to layers.0)
    import re as _re

    for k, v in sd2.items():
        k0 = _re.sub(r"(transformer\.\d\.layers\.)[12]\.", r"\g<1>0.", k)
        np.testing.assert_allclose(np.asarray(v), sd[k0], atol=0, rtol=0,
                                   err_msg=k)

    # wo_shared: the template must expose base1 + cur_img_stem params so the
    # reference's second trunk maps (and strict mode verifies coverage)
    args2 = convert_cli.parse_args(
        ["--torch_ckpt", "x", "--out", "y", "--arch", "dlaabla_34",
         "--ablation_mode", "wo_shared"]
    )
    state2 = convert_cli._template_state(args2)
    flat = {p for p, _ in tc._tree_paths(state2.params)}
    assert any(p.startswith("base1/") for p in flat), "wo_shared trunk missing"
    mapping = tc._flag_map("dcn", "dlaabla_wo_shared")
    assert "base1/level0/Conv_0/kernel" in mapping
