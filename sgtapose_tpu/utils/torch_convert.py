"""torch -> JAX checkpoint converter for the flagship arch.

Maps the reference's `dlapawdl3new_34` state_dict (saved as {epoch,
state_dict, optimizer} — ref lib/model/model.py:105-114, with DataParallel
'module.' prefixes stripped like load_model :43-103) onto our Flax param /
batch_stats trees, so reference-trained weights (e.g. the released
pretrained_model/ckpt/model_20.pth) run in this framework.

Layout transforms:
  conv     torch (O, I, kh, kw)  -> flax (kh, kw, I, O)
  linear   torch (O, I)          -> flax (I, O)
  DCN main torch (O, I, 3, 3)    -> our 1x1 contraction (1, 1, 9*I, O),
           tap-major row-major over the 3x3 window (matches
           models/deform_conv.py's sample stacking)
  depthwise ConvTranspose2d (C, 1, k, k) -> (k, k, 1, C)
  BN       weight/bias/running_mean/running_var -> scale/bias + mean/var
  first conv of 3-channel stems: input-channel flip (the reference trains on
           cv2 BGR frames; our loader feeds RGB)

Weight tying: the reference's TransformerEncoder serializes layers.0/1/2 with
identical tensors (_get_clones reuses one instance, ref dla.py:788-789); we
read layers.0.

Known intentionally-unmapped reference params: base.base_layer.*,
base.repro_hm_layer.* (unused by the l3new forward, ref dla.py:1506-1507),
base.levelN.project/downsample of levels>1 trees (dead — see models/dla.py
Tree docstring), base.fc (ImageNet classifier head), wh head (skipped by
BaseModelPlanA).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w):
    return np.transpose(w)


def _dcn_main(w):
    o, i, kh, kw = w.shape
    return np.transpose(w, (2, 3, 1, 0)).reshape(1, 1, kh * kw * i, o)


def _up(w):
    # ConvTranspose2d expressed as an lhs-dilated regular conv needs the
    # kernel spatially flipped (rot180): transposed conv correlates with the
    # flipped kernel. The bilinear init is symmetric, so this only shows up
    # with trained (asymmetric) weights — caught by test_parity_torch.
    return np.transpose(w, (2, 3, 1, 0))[::-1, ::-1].copy()


def _basic_block(ref: str):
    """our BasicBlock subpaths -> ref conv1/bn1/conv2/bn2 names."""
    return {
        "ConvBnAct_0/Conv_0/kernel": (f"{ref}.conv1.weight", _conv),
        "ConvBnAct_0/BatchNorm_0": (f"{ref}.bn1", None),
        "Conv_0/kernel": (f"{ref}.conv2.weight", _conv),
        "BatchNorm_0": (f"{ref}.bn2", None),
    }


def _add_leaf_tree(m, our: str, ref: str, has_project: bool):
    """Map one levels-1 subtree: blocks + root + optional project."""
    for sub, (rname, tf) in _basic_block(f"{ref}.tree1").items():
        m[f"{our}/tree1/{sub}"] = (rname, tf)
    for sub, (rname, tf) in _basic_block(f"{ref}.tree2").items():
        m[f"{our}/tree2/{sub}"] = (rname, tf)
    m[f"{our}/root/Conv_0/kernel"] = (f"{ref}.root.conv.weight", _conv)
    m[f"{our}/root/BatchNorm_0"] = (f"{ref}.root.bn", None)
    if has_project:
        m[f"{our}/project_conv/kernel"] = (f"{ref}.project.0.weight", _conv)
        m[f"{our}/project_bn"] = (f"{ref}.project.1", None)


def _add_dla_trunk(m, our_base: str, ref_base: str):
    """One DLA-34 trunk: conv levels 0-1 + trees 2-5. ref_base='' maps a BARE
    state_dict (the ImageNet dla34 release format, keys level0.0.weight...)."""
    pre = ref_base + "." if ref_base else ""
    for lvl in (0, 1):
        m[f"{our_base}/level{lvl}/Conv_0/kernel"] = (
            f"{pre}level{lvl}.0.weight", _conv)
        m[f"{our_base}/level{lvl}/BatchNorm_0"] = (
            f"{pre}level{lvl}.1", None)
    _add_leaf_tree(m, f"{our_base}/level2", f"{pre}level2", True)
    _add_leaf_tree(m, f"{our_base}/level5", f"{pre}level5", True)
    for lvl in (3, 4):
        _add_leaf_tree(m, f"{our_base}/level{lvl}/tree1",
                       f"{pre}level{lvl}.tree1", True)
        _add_leaf_tree(m, f"{our_base}/level{lvl}/tree2",
                       f"{pre}level{lvl}.tree2", False)


def _flag_map(
    dla_node: str = "dcn", arch: str = "dlapawdl3new"
) -> Dict[str, Tuple[str, Optional[callable]]]:
    """our param path -> (ref name/prefix, transform). BN entries map the
    module prefix; scale/bias/mean/var resolve inside convert().

    dla_node selects the decoder-node naming: "dcn" maps the reference's
    DeformConv (conv_offset_mask + DCN main + actf BN, ref dla.py:538-550);
    "conv" maps the reference's Conv node (Sequential(1x1 conv, BN, ReLU) under
    `.conv.0/.conv.1`, ref dla.py:498-507) used when --dla_node conv.

    arch selects the head-of-tree naming:
      dlapawdl3new — flagship (transformer_{0..2} + cat_layer_{0..5})
      dlapacat     — concat baseline (no attention modules; decoder names are
                     identical, only widths differ — shape-checked downstream);
                     our module prefixes everything under `decoder/`
      dlapa        — global-attention variant (transformer_{0..5} WITHOUT
                     pos_embed + cat_layer_{0..5}, decoder under `decoder/`)
      dlapawd      — window variant with dense tail (attn_{0..2} window
                     attention + cat_layer_{3..5} dense, decoder/)
      dlaabla      — ablation archs (dense cat_layer_{0..5}, decoder/;
                     ablation_mode="wo_shared" adds base1 + cur_img_stem)
    """
    m: Dict[str, Tuple[str, Optional[callable]]] = {}
    dec = "" if arch == "dlapawdl3new" else "decoder/"

    # stems (both frames route through pre_img/pre_hm layers, ref dla.py:1506)
    m["pre_img_stem/Conv_0/kernel"] = ("base.pre_img_layer.0.weight", _conv)
    m["pre_img_stem/BatchNorm_0"] = ("base.pre_img_layer.1", None)
    m["pre_hm_stem/Conv_0/kernel"] = ("base.pre_hm_layer.0.weight", _conv)
    m["pre_hm_stem/BatchNorm_0"] = ("base.pre_hm_layer.1", None)
    _add_dla_trunk(m, "base", "base")
    if arch == "dlaabla_wo_shared":
        # separate current-frame trunk (ref dla.py:1175-1177 base1); its img
        # stem is base1's pre_img_layer (the cur pass calls base1(pre_img=x))
        m["cur_img_stem/Conv_0/kernel"] = ("base1.pre_img_layer.0.weight", _conv)
        m["cur_img_stem/BatchNorm_0"] = ("base1.pre_img_layer.1", None)
        _add_dla_trunk(m, "base1", "base1")

    # decoder ida modules
    def add_deform(our: str, ref: str):
        if dla_node == "conv":
            m[f"{our}/conv/kernel"] = (f"{ref}.conv.0.weight", _conv)
            m[f"{our}/BatchNorm_0"] = (f"{ref}.conv.1", None)
            return
        m[f"{our}/conv/conv_offset_mask/kernel"] = (
            f"{ref}.conv.conv_offset_mask.weight", _conv)
        m[f"{our}/conv/conv_offset_mask/bias"] = (
            f"{ref}.conv.conv_offset_mask.bias", None)
        m[f"{our}/conv/kernel/kernel"] = (f"{ref}.conv.weight", _dcn_main)
        m[f"{our}/conv/kernel/bias"] = (f"{ref}.conv.bias", None)
        m[f"{our}/BatchNorm_0"] = (f"{ref}.actf.0", None)

    ida_shapes = {"ida_0": (1,), "ida_1": (1, 2), "ida_2": (1, 2, 3)}
    for ida, js in ida_shapes.items():
        for j in js:
            add_deform(f"{dec}dla_up/{ida}/proj_{j}", f"dla_up.{ida}.proj_{j}")
            add_deform(f"{dec}dla_up/{ida}/node_{j}", f"dla_up.{ida}.node_{j}")
            m[f"{dec}dla_up/{ida}/up_{j}/kernel"] = (f"dla_up.{ida}.up_{j}.weight", _up)
    for j in (1, 2):
        add_deform(f"{dec}ida_up/proj_{j}", f"ida_up.proj_{j}")
        add_deform(f"{dec}ida_up/node_{j}", f"ida_up.node_{j}")
        m[f"{dec}ida_up/up_{j}/kernel"] = (f"ida_up.up_{j}.weight", _up)

    # heads (Sequential(conv3x3, ReLU, conv1x1) -> indices 0, 2)
    for head in ("hm", "reg", "tracking"):
        m[f"{dec}{head}/Conv_0/kernel"] = (f"{head}.0.weight", _conv)
        m[f"{dec}{head}/Conv_0/bias"] = (f"{head}.0.bias", None)
        m[f"{dec}{head}/Conv_1/kernel"] = (f"{head}.2.weight", _conv)
        m[f"{dec}{head}/Conv_1/bias"] = (f"{head}.2.bias", None)

    def add_transformer(i: int, our: str, pos_embed: bool):
        # weight-tied: read layers.0 (ref _get_clones reuses one instance)
        ref = f"transformer.{i}.layers.0"
        for proj in ("w_q", "w_k", "w_v"):
            m[f"{our}/cross_attn/{proj}/kernel"] = (
                f"{ref}.cross_attn.{proj}.weight", _linear)
        m[f"{our}/cross_attn/fc/kernel"] = (f"{ref}.cross_attn.fc.weight", _linear)
        m[f"{our}/cross_attn/fc/bias"] = (f"{ref}.cross_attn.fc.bias", None)
        if pos_embed:
            m[f"{our}/cross_attn/pos_embed"] = (f"{ref}.cross_attn.pos_embed", None)
        for ln, rn in (("norm1", "norm1"), ("norm3", "norm3")):
            m[f"{our}/{ln}/scale"] = (f"{ref}.{rn}.weight", None)
            m[f"{our}/{ln}/bias"] = (f"{ref}.{rn}.bias", None)
        for lin in ("linear1", "linear2"):
            m[f"{our}/{lin}/kernel"] = (f"{ref}.{lin}.weight", _linear)
            m[f"{our}/{lin}/bias"] = (f"{ref}.{lin}.bias", None)

    def add_cat_layer(i: int, our: str):
        m[f"{our}/fc1/kernel"] = (f"cat_layer.{i}.0.weight", _linear)
        m[f"{our}/fc1/bias"] = (f"cat_layer.{i}.0.bias", None)
        m[f"{our}/fc2/kernel"] = (f"cat_layer.{i}.2.weight", _linear)
        m[f"{our}/fc2/bias"] = (f"cat_layer.{i}.2.bias", None)

    if arch == "dlapacat":
        return m
    if arch == "dlapawdl3new":
        for i in range(3):
            add_transformer(i, f"transformer_{i}/layer", pos_embed=True)
        for i in range(6):
            add_cat_layer(i, f"cat_layer_{i}")
        return m
    if arch == "dlapa":
        for i in range(6):
            add_transformer(i, f"transformer_{i}/layer", pos_embed=False)
            add_cat_layer(i, f"cat_layer_{i}")
        return m
    if arch == "dlapawd":
        for i in range(3):
            add_transformer(i, f"attn_{i}/transformer/layer", pos_embed=True)
            add_cat_layer(i, f"attn_{i}/cat_layer")
        for i in range(3, 6):
            add_cat_layer(i, f"cat_layer_{i}/mlp")
        return m
    if arch in ("dlaabla", "dlaabla_wo_shared"):
        for i in range(6):
            add_cat_layer(i, f"cat_layer_{i}/mlp")
        return m
    raise ValueError(f"no converter mapping for arch: {arch}")


_BN_PARAM = {"scale": "weight", "bias": "bias"}
_BN_STATS = {"mean": "running_mean", "var": "running_var"}


def _tree_paths(tree, prefix=()):
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        yield "/".join(str(k.key) for k in path), leaf



def _convert_with_mapping(
    sd, mapping, params, batch_stats, bgr_flip_paths, strict, unused_filter
):
    """Shared conversion core for both converters: mapping/BN-suffix lookup,
    BGR first-conv flip, shape check, nested-tree rebuild, and the
    missing/mismatched/unused report (raises when strict)."""
    used = set()
    missing, mismatched = [], []

    def lookup(our_path: str, expect_shape):
        if our_path in mapping:
            ref, tf = mapping[our_path]
        else:
            head, leaf = our_path.rsplit("/", 1)
            if head in mapping and leaf in {**_BN_PARAM, **_BN_STATS}:
                suffix = _BN_PARAM.get(leaf) or _BN_STATS.get(leaf)
                ref, tf = mapping[head][0] + "." + suffix, None
            else:
                return None
        if ref not in sd:
            missing.append((our_path, ref))
            return None
        w = sd[ref]
        if tf is not None:
            w = tf(w)
        if our_path in bgr_flip_paths:
            w = w[:, :, ::-1, :]
        if tuple(w.shape) != tuple(expect_shape):
            mismatched.append((our_path, ref, w.shape, tuple(expect_shape)))
            return None
        used.add(ref)
        return w

    def convert_tree(tree):
        out = {}
        for path, leaf in _tree_paths(tree):
            w = lookup(path, leaf.shape)
            node = out
            keys = path.split("/")
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = (
                np.asarray(w, np.float32) if w is not None else np.asarray(leaf)
            )
        return out

    new_params = convert_tree(params)
    new_stats = convert_tree(batch_stats)
    unused = sorted(k for k in sd if k not in used and unused_filter(k))
    report = {
        "missing": missing,
        "mismatched": mismatched,
        "unused_ref_keys": unused,
        "n_converted": len(used),
    }
    if strict and (missing or mismatched):
        raise ValueError(f"conversion incomplete: {report}")
    return new_params, new_stats, report


def convert_state_dict(
    state_dict: Dict[str, np.ndarray],
    params,
    batch_stats,
    bgr_to_rgb: bool = True,
    strict: bool = True,
    dla_node: str = "dcn",
    arch: str = "dlapawdl3new",
):
    """Returns (new_params, new_batch_stats, report). Shapes are validated
    against the provided trees (like load_model's shape-mismatch skip, but
    strict by default)."""
    import jax

    sd = {re.sub(r"^module\.", "", k): np.asarray(v) for k, v in state_dict.items()}
    mapping = _flag_map(dla_node, arch)
    # every 3-channel image stem flips (cur_img_stem exists on the wo_shared
    # ablation's separate current-frame trunk); matches export_state_dict so
    # the round-trip is exact for all archs
    bgr_paths = (
        {"pre_img_stem/Conv_0/kernel", "cur_img_stem/Conv_0/kernel"}
        if bgr_to_rgb else set()
    )

    def unused_filter(k):
        return (
            not k.startswith((
                "base.base_layer", "base.repro_hm_layer", "base.fc",
                "base1.base_layer", "base1.repro_hm_layer", "base1.fc",
                "base1.pre_hm_layer",  # cur pass runs without a prior heatmap
            ))
            and ".project." not in k.replace("tree1.project", "")  # dead lvl projections
            and not re.search(r"transformer\.\d\.layers\.[12]\.", k)  # tied copies
            and not k.startswith("wh")
            and "num_batches_tracked" not in k
        )

    return _convert_with_mapping(
        sd, mapping, params, batch_stats, bgr_paths, strict, unused_filter
    )


def convert_imagenet_dla34(
    state_dict: Dict[str, np.ndarray],
    params,
    batch_stats,
    map_stem: bool = False,
    strict: bool = True,
):
    """Ingest a BARE ImageNet DLA-34 state_dict (the dla34-ba72cf86.pth
    release format: base_layer.*, level0..level5.*, fc.*) into our `base/`
    trunk, leaving every other module at its fresh init.

    This is the reference's training-of-record initialization: dla34(
    pretrained=True) -> load_pretrained_model loads the ImageNet weights with
    strict=False (ref lib/model/networks/dla.py:339-363), which initializes
    level0-5 (live) and base_layer (DEAD for the l3new forward — both frame
    passes route through pre_img_layer, ref dla.py:1506-1507, so the
    reference's pre_img stem stays randomly initialized). map_stem=True goes
    one step further than the reference and also copies base_layer into our
    active pre_img_stem (documented deviation — the ImageNet stem is a
    strictly better prior for an image stem than random init).

    ImageNet DLA weights are RGB-trained (standard PIL loaders), and our
    loader feeds RGB — no channel flip.

    Returns (new_params, new_batch_stats, report).
    """
    sd = {re.sub(r"^module\.", "", k): np.asarray(v) for k, v in state_dict.items()}
    m: Dict[str, Tuple[str, Optional[callable]]] = {}
    _add_dla_trunk(m, "base", "")
    if map_stem:
        m["pre_img_stem/Conv_0/kernel"] = ("base_layer.0.weight", _conv)
        m["pre_img_stem/BatchNorm_0"] = ("base_layer.1", None)

    def unused_filter(k):
        return (
            not k.startswith(("fc.", "base_layer."))
            and ".project." not in k.replace("tree1.project", "")
            and ".downsample." not in k
            and "num_batches_tracked" not in k
        )

    return _convert_with_mapping(
        sd, m, params, batch_stats, set(), strict, unused_filter
    )


# -----------------------------------------------------------------------------
# JAX -> torch EXPORT (inverse of convert_state_dict)
# -----------------------------------------------------------------------------

_INVERSE = {}


def _inv_conv(w):
    return np.transpose(w, (3, 2, 0, 1))


def _inv_linear(w):
    return np.transpose(w)


def _inv_dcn_main(w):
    # (1, 1, 9*I, O) -> (O, I, 3, 3), tap-major row-major
    _, _, ki, o = w.shape
    i = ki // 9
    return np.transpose(w.reshape(3, 3, i, o), (3, 2, 0, 1))


def _inv_up(w):
    return np.transpose(w[::-1, ::-1], (3, 2, 0, 1)).copy()


_INVERSE[_conv] = _inv_conv
_INVERSE[_linear] = _inv_linear
_INVERSE[_dcn_main] = _inv_dcn_main
_INVERSE[_up] = _inv_up


def export_state_dict(
    params,
    batch_stats,
    dla_node: str = "dcn",
    arch: str = "dlapawdl3new",
    bgr_to_rgb: bool = True,
) -> Dict[str, np.ndarray]:
    """Export our Flax trees to a reference-format torch state_dict (the
    inverse of convert_state_dict): trained JAX checkpoints become loadable
    by the reference's `load_model` (ref lib/model/model.py:43-103) / usable
    by torch deployments.

    The reference's weight-tied transformer serializes three identical layer
    copies (`_get_clones` reuses one instance, ref dla.py:788-789) — the
    export emits layers.0/1/2 as copies. Dead reference params (base_layer,
    repro_hm_layer, ImageNet fc, dead tree projections, wh head) are not
    emitted; the reference loader initializes them and warns, exactly like
    loading a partially-matching checkpoint. With bgr_to_rgb=True the
    3-channel image-stem convs are flipped back to the reference's cv2 BGR
    channel order.
    """
    mapping = _flag_map(dla_node, arch)
    flat = {p: np.asarray(v) for p, v in _tree_paths(params)}
    flat.update({p: np.asarray(v) for p, v in _tree_paths(batch_stats)})

    sd: Dict[str, np.ndarray] = {}
    for our_path, w in flat.items():
        if our_path in mapping:
            ref, tf = mapping[our_path]
        else:
            head, leaf = our_path.rsplit("/", 1)
            if head in mapping and leaf in {**_BN_PARAM, **_BN_STATS}:
                suffix = _BN_PARAM.get(leaf) or _BN_STATS.get(leaf)
                ref, tf = mapping[head][0] + "." + suffix, None
            else:
                continue  # our-only param (none exist today; future-proof)
        if bgr_to_rgb and our_path in (
            "pre_img_stem/Conv_0/kernel", "cur_img_stem/Conv_0/kernel"
        ):
            w = w[:, :, ::-1, :]
        sd[ref] = (w if tf is None else _INVERSE[tf](w)).astype(np.float32)

    # weight-tied transformer copies (layers.1/2 identical to layers.0)
    for name in [k for k in sd if ".layers.0." in k]:
        for copy_i in (1, 2):
            sd[name.replace(".layers.0.", f".layers.{copy_i}.")] = sd[name]
    return sd


def export_imagenet_dla34(params, batch_stats) -> Dict[str, np.ndarray]:
    """Export our `base/` trunk (params + BN stats) as a BARE ImageNet-format
    DLA-34 state_dict (the dla34-ba72cf86.pth release layout that
    `load_pretrained_model` consumes, ref lib/model/networks/dla.py:339-363)
    — the exact inverse of convert_imagenet_dla34. No BGR flip: ImageNet DLA
    release weights are RGB, as is our trunk.

    Use case: this environment ships no ImageNet weights, so the
    `--init_backbone` path is functionally validated by trunk transfer —
    export a trained trunk here, warm-start a fresh run from the .pth
    (scripts/export_trunk_dla34.py + scripts/train_r4_ab.sh)."""
    mapping: Dict[str, Tuple[str, Optional[callable]]] = {}
    _add_dla_trunk(mapping, "base", "")
    flat = {p: np.asarray(v) for p, v in _tree_paths(params)}
    flat.update({p: np.asarray(v) for p, v in _tree_paths(batch_stats)})

    sd: Dict[str, np.ndarray] = {}
    for our_path, w in flat.items():
        if our_path in mapping:
            ref, tf = mapping[our_path]
        else:
            head, leaf = our_path.rsplit("/", 1)
            if head in mapping and leaf in {**_BN_PARAM, **_BN_STATS}:
                suffix = _BN_PARAM.get(leaf) or _BN_STATS.get(leaf)
                ref, tf = mapping[head][0] + "." + suffix, None
            else:
                continue  # non-trunk param
        sd[ref] = (w if tf is None else _INVERSE[tf](w)).astype(np.float32)
    assert sd, "no trunk tensors matched — unexpected param-tree structure"
    return sd


def save_torch_checkpoint(path: str, sd: Dict[str, np.ndarray], epoch: int = 0):
    """Write a reference-format {epoch, state_dict} .pth."""
    import torch

    torch.save(
        {"epoch": epoch,
         "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}},
        path,
    )


# -----------------------------------------------------------------------------
# DREAM baseline converters (ref lib/model/networks/hourglass.py)
# -----------------------------------------------------------------------------


def _deconv_w(w):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> our lhs-dilated conv
    kernel (kh, kw, in, out), spatially flipped (rot180)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _dream_hourglass_map(
    deconv_decoder: bool = False, full_output: bool = False
) -> Dict[str, Tuple[str, Optional[callable]]]:
    """our DreamHourglass param path -> (ref hourglass.py state_dict name,
    transform). Torch Sequential indices follow the reference's add_module
    names (VGG feature indices for the encoder, hourglass.py:274-299;
    0/4/5/6-style indices in the decoder, :383-440)."""
    m: Dict[str, Tuple[str, Optional[callable]]] = {}
    enc = [
        ("layer_0_1_down", [0, 2]),
        ("layer_0_2_down", [5, 7]),
        ("layer_0_3_down", [10, 12, 14, 16]),
        ("layer_0_4_down", [19, 21, 23, 25]),
        ("layer_0_5_down", [28, 30, 32, 34]),
    ]
    for name, idxs in enc:
        for i, idx in enumerate(idxs):
            m[f"{name}/conv{i}/kernel"] = (f"{name}.{idx}.weight", _conv)
            m[f"{name}/conv{i}/bias"] = (f"{name}.{idx}.bias", None)
    if deconv_decoder:
        for name, has_conv in (
            ("deconv_0_4", True), ("deconv_0_3", True),
            ("deconv_0_2", True), ("deconv_0_1", False),
        ):
            m[f"{name}_deconv/kernel"] = (f"{name}.0.weight", _deconv_w)
            m[f"{name}_deconv/bias"] = (f"{name}.0.bias", None)
            if has_conv:
                m[f"{name}_conv/kernel"] = (f"{name}.2.weight", _conv)
                m[f"{name}_conv/bias"] = (f"{name}.2.bias", None)
    else:
        for name in ("upsample_0_4", "upsample_0_3"):
            m[f"{name}_conv1/kernel"] = (f"{name}.4.weight", _conv)
            m[f"{name}_conv1/bias"] = (f"{name}.4.bias", None)
            m[f"{name}_conv2/kernel"] = (f"{name}.6.weight", _conv)
            m[f"{name}_conv2/bias"] = (f"{name}.6.bias", None)
        if full_output:
            for name in ("upsample_0_2", "upsample_0_1"):
                m[f"{name}_conv1/kernel"] = (f"{name}.2.weight", _conv)
                m[f"{name}_conv1/bias"] = (f"{name}.2.bias", None)
                m[f"{name}_conv2/kernel"] = (f"{name}.4.weight", _conv)
                m[f"{name}_conv2/bias"] = (f"{name}.4.bias", None)
    for our, idx in (("heads_0_conv1", 0), ("heads_0_conv2", 2),
                     ("heads_0_out", 4)):
        m[f"{our}/kernel"] = (f"heads_0.{idx}.weight", _conv)
        m[f"{our}/bias"] = (f"heads_0.{idx}.bias", None)
    return m


def _resnet_simple_map(
    full: bool = False, blocks=(3, 4, 23, 3)
) -> Dict[str, Tuple[str, Optional[callable]]]:
    """our ResnetSimple param path -> ref state_dict name (torchvision
    resnet101 trunk names + the upsample Sequential, hourglass.py:97-237)."""
    m: Dict[str, Tuple[str, Optional[callable]]] = {
        "conv1/kernel": ("conv1.weight", _conv),
        "bn1": ("bn1", None),
    }
    for L, n in enumerate(blocks, start=1):
        for b in range(n):
            pre, ref = f"layer{L}_{b}", f"layer{L}.{b}"
            for c in (1, 2, 3):
                m[f"{pre}/conv{c}/kernel"] = (f"{ref}.conv{c}.weight", _conv)
                m[f"{pre}/bn{c}"] = (f"{ref}.bn{c}", None)
            if b == 0:
                m[f"{pre}/downsample_conv/kernel"] = (
                    f"{ref}.downsample.0.weight", _conv)
                m[f"{pre}/downsample_bn"] = (f"{ref}.downsample.1", None)
    for i in range(4):
        t = i * 3
        m[f"up{i}_deconv/kernel"] = (f"upsample.{t}.weight", _deconv_w)
        m[f"up{i}_deconv/bias"] = (f"upsample.{t}.bias", None)
        m[f"up{i}_bn"] = (f"upsample.{t + 1}", None)
    if full:
        m["up4_deconv/kernel"] = ("upsample2.0.weight", _deconv_w)
        m["up4_deconv/bias"] = ("upsample2.0.bias", None)
        m["up4_bn"] = ("upsample2.1", None)
        m["head/kernel"] = ("upsample2.3.weight", _conv)
        m["head/bias"] = ("upsample2.3.bias", None)
    else:
        m["head/kernel"] = ("upsample.12.weight", _conv)
        m["head/bias"] = ("upsample.12.bias", None)
    return m


def convert_dream_state_dict(
    state_dict: Dict[str, np.ndarray],
    params,
    batch_stats,
    arch: str = "dreamhourglass",
    deconv_decoder: bool = False,
    full_output: bool = False,
    blocks=(3, 4, 23, 3),
    bgr_to_rgb: bool = False,
    strict: bool = True,
):
    """Convert a reference DREAM-baseline checkpoint (DreamHourglass /
    ResnetSimple, ref hourglass.py) onto our Flax trees. Same contract as
    convert_state_dict. bgr_to_rgb flips the first conv's input channels for
    checkpoints trained on cv2 BGR frames (this reference's own trainer,
    datasets.py `_get_input`); the DREAM release trains on PIL RGB, so the
    default is False."""
    sd = {re.sub(r"^module\.", "", k): np.asarray(v) for k, v in state_dict.items()}
    if arch == "dreamhourglass":
        mapping = _dream_hourglass_map(deconv_decoder, full_output)
        first_conv = "layer_0_1_down/conv0/kernel"
    elif arch == "resnetsimple":
        mapping = _resnet_simple_map(full_output, blocks)
        first_conv = "conv1/kernel"
    else:
        raise ValueError(f"unknown DREAM arch: {arch}")

    return _convert_with_mapping(
        sd, mapping, params, batch_stats,
        {first_conv} if bgr_to_rgb else set(), strict,
        lambda k: "num_batches_tracked" not in k,
    )


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pth ({epoch, state_dict, optimizer} or bare dict)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {
        k: (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in sd.items()
    }
