"""Import shims for the LIVING reference at /root/reference/sgtapose.

torch 2.13 (CPU), einops, cv2, scipy and the reference's actual native solver
(rf_tools/libtestso_final.so) are all present in this image, so parity can be
asserted against the real code instead of re-derived formulas.

Obstacles handled here:
  * `import sgtapose` (the reference package __init__) pulls in ruamel.yaml /
    pyrr / transforms3d, which are NOT installed. But the model stack
    (lib/model/...) only uses `sgtapose.image_proc.peaks_from_belief_maps`
    (lib/model/utils.py:214), and image_proc.py itself is dependency-clean.
    So we register a minimal fake `sgtapose` module whose `image_proc`
    attribute is the REAL image_proc.py loaded standalone by file path.
  * rf_tools/LM.py hardcodes a dead absolute .so path (rf_tools/LM.py:10),
    so the native LM is loaded here directly via ctypes with the exact
    register_GN_C marshaling (rf_tools/LM.py:256-266).
"""

from __future__ import annotations

import ctypes
import importlib.util
import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference/sgtapose"
REF_SO = os.path.join(REF_ROOT, "rf_tools", "libtestso_final.so")

os.environ.setdefault("MPLBACKEND", "Agg")


def _load_standalone(modname: str, path: str):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def ensure_ref_importable():
    """Make `from lib.model.networks.dla import ...` work against the
    reference tree, with a fake `sgtapose` exposing the real image_proc."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "torchvision" not in sys.modules:
        # torchvision isn't installed; image_proc imports it at module level
        # but peaks_from_belief_maps (the only function we call) never uses
        # it. Empty-module stubs let the real file load.
        tv = types.ModuleType("torchvision")
        tv.__path__ = []  # mark as package so submodule imports resolve
        tv_t = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv_m = types.ModuleType("torchvision.models")
        tv.transforms = tv_t
        tv.models = tv_m
        tv_t.functional = tv_f
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.transforms.functional"] = tv_f
        sys.modules["torchvision.models"] = tv_m
    if "sgtapose" not in sys.modules or not hasattr(
        sys.modules["sgtapose"], "image_proc"
    ):
        image_proc = _load_standalone(
            "_ref_image_proc", os.path.join(REF_ROOT, "image_proc.py")
        )
        fake = types.ModuleType("sgtapose")
        fake.__doc__ = "shim: reference image_proc only (see tests/ref_oracle.py)"
        fake.image_proc = image_proc
        sys.modules["sgtapose"] = fake
    return sys.modules["sgtapose"]


def ref_image_proc():
    return ensure_ref_importable().image_proc


def ref_dla_module():
    ensure_ref_importable()
    from lib.model.networks import dla  # noqa: E402

    return dla


def ref_model_utils():
    ensure_ref_importable()
    from lib.model import utils  # noqa: E402

    return utils


_so = None


def ref_lm_so() -> ctypes.CDLL:
    global _so
    if _so is None:
        _so = ctypes.CDLL(REF_SO)
    return _so


def ref_lm(x2d: np.ndarray, x3d: np.ndarray, quat_init: np.ndarray,
           trans_init: np.ndarray, weights: np.ndarray, K: np.ndarray):
    """Call the reference's real C++/Eigen LM exactly like register_GN_C
    (rf_tools/LM.py:256-266): value[7] = [q(4, wxyz per `fun`), t(3)],
    weights flattened (N,2) + trailing (1e8, 1e8) constraint pair.
    Returns (quat(4,), trans(3,))."""
    so = ref_lm_so()
    n = int(x2d.shape[0])
    value = (ctypes.c_double * 7)(*np.concatenate(
        [np.asarray(quat_init, np.float64).ravel(),
         np.asarray(trans_init, np.float64).ravel()]))
    x2d_c = (ctypes.c_double * (n * 2))(*np.asarray(x2d, np.float64).ravel())
    x3d_c = (ctypes.c_double * (n * 3))(*np.asarray(x3d, np.float64).ravel())
    w_full = np.concatenate(
        [np.asarray(weights, np.float64).reshape(n, 2),
         np.full((1, 2), 1e8)]).ravel()
    w_c = (ctypes.c_double * (n * 2 + 2))(*w_full)
    cam_c = (ctypes.c_double * 9)(*np.asarray(K, np.float64).ravel())
    ans = (ctypes.c_double * 7)(*([0.0] * 7))
    so.LM(value, x2d_c, x3d_c, w_c, cam_c, ans, n)
    out = np.array(list(ans))
    return out[:4], out[4:]


def make_ref_opt(**overrides):
    """Minimal opt namespace for instantiating reference models on CPU
    (conv decoder nodes; no pretrained download — load_model non-empty)."""
    base = dict(
        head_kernel=3,
        prior_bias=-4.6,
        dla_node="conv",
        load_model="x",  # != '' -> skips the ImageNet pretrained download
        pre_img=True,
        pre_hm=True,
        ct_modify=True,  # repro_hm_layer exists in checkpoints (unused by fwd)
        num_classes=7,
        pos_embed=True,
        model_output_list=False,
        k_list_1=1, k_list_2=1, k_list_3=1, k_list_4=1, k_list_5=1, k_list_6=1,
        ks1=12, ks2=6, ks3=3, ks4=1, ks5=1, ks6=1,
    )
    base.update(overrides)
    return types.SimpleNamespace(**base)


HEADS = {"hm": 7, "reg": 2, "wh": 2, "tracking": 2}
HEAD_CONVS = {k: [256] for k in HEADS}


# -----------------------------------------------------------------------------
# Full reference-detector import (for honest baseline timing + parity):
# shims for the deps absent in this image. All shims are inert stand-ins for
# modules whose symbols the detector run path never touches (pyrr/transforms3d
# are only used by get_pnp_keypoints/transform helpers, not by
# is_pnp/solve_pnp), except ruamel.yaml which we back with a JSON loader (the
# reference data files are valid JSON).
# -----------------------------------------------------------------------------


class _JsonYAML:
    """Stand-in for ruamel.yaml.YAML(typ='safe') covering the reference's
    usage (load of JSON-formatted meta files, rf_tools/LM.py-style)."""

    def __init__(self, typ="safe"):
        self.typ = typ

    def load(self, stream):
        import json as _json

        data = stream.read() if hasattr(stream, "read") else stream
        return _json.loads(data)


def _stub_module(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def ensure_ref_detector_importable():
    """Make `from lib.sgta_detector import SGTADetector` work against the
    reference tree with the real utilities/geometric_vision/image_proc as
    the `sgtapose` package."""
    ensure_ref_importable()

    _stub_module("ruamel")
    _stub_module("ruamel.yaml", YAML=_JsonYAML)
    sys.modules["ruamel"].yaml = sys.modules["ruamel.yaml"]

    class _Quat:
        """pyrr.Quaternion stand-in implementing the subset the reference's
        geometric_vision uses (convert_rvec_to_quaternion + matrix33 at
        geometric_vision.py:16-28, :262-264). Convention check: the
        composition from_axis_rotation(rvec) -> .matrix33 -> transform @
        column-vectors must reproduce cv2.Rodrigues' rotation (otherwise the
        reference's repro prior — the core of the method — would misproject;
        test_parity_dataset verifies next_est == GT next projections at
        disturb=0 end-to-end)."""

        def __init__(self, xyzw):
            self._q = np.asarray(xyzw, np.float64)

        @staticmethod
        def from_axis_rotation(axis, theta):
            axis = np.asarray(axis, np.float64)
            axis = axis / np.linalg.norm(axis)
            s = np.sin(theta / 2.0)
            return _Quat([axis[0] * s, axis[1] * s, axis[2] * s,
                          np.cos(theta / 2.0)])

        def normalize(self):
            self._q = self._q / np.linalg.norm(self._q)
            return self

        @property
        def matrix33(self):
            x, y, z, w = self._q
            return np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])

        def __iter__(self):  # list(quaternion) -> [x, y, z, w]
            return iter(self._q.tolist())

        def __getitem__(self, i):
            return self._q[i]

    _stub_module("pyrr", Quaternion=_Quat)
    tfs = _stub_module("transforms3d")
    tfs.quaternions = _stub_module("transforms3d.quaternions")

    class _Bar:  # progress.bar.Bar stand-in
        def __init__(self, *a, **k):
            self.suffix = ""

        def next(self):
            pass

        def finish(self):
            pass

    _stub_module("progress")
    _stub_module("progress.bar", Bar=_Bar)

    fake = sys.modules["sgtapose"]
    if not hasattr(fake, "utilities"):
        fake.utilities = _load_standalone(
            "_ref_utilities", os.path.join(REF_ROOT, "utilities.py")
        )
    if not hasattr(fake, "geometric_vision"):
        fake.geometric_vision = _load_standalone(
            "_ref_geometric_vision", os.path.join(REF_ROOT, "geometric_vision.py")
        )
    from lib.sgta_detector import SGTADetector  # noqa: E402

    return SGTADetector


def install_torchvision_models():
    """Give the torchvision stub REAL torch implementations of the two models
    the reference's hourglass.py instantiates (resnet101 at :102, vgg19
    .features at :270), structurally identical to torchvision's (same module
    tree and state_dict names) so reference DREAM-baseline checkpoints load
    and convert. pretrained weights are unavailable offline; both accept and
    ignore the pretrained flag (random init, like `pretrained=False`)."""
    ensure_ref_importable()
    import torch
    import torch.nn as nn

    tv_m = sys.modules["torchvision.models"]
    if hasattr(tv_m, "resnet101"):
        return tv_m

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], stride=2)
            self.layer3 = self._make_layer(256, layers[2], stride=2)
            self.layer4 = self._make_layer(512, layers[3], stride=2)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4),
                )
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            for _ in range(1, blocks):
                layers.append(Bottleneck(self.inplanes, planes))
            return nn.Sequential(*layers)

    def resnet101(pretrained=False, **kw):
        return ResNet([3, 4, 23, 3])

    VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            in_c = 3
            for v in VGG19_CFG:
                if v == "M":
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                    layers.append(nn.ReLU(inplace=True))
                    in_c = v
            self.features = nn.Sequential(*layers)

    def vgg19(pretrained=False, **kw):
        return VGG()

    tv_m.resnet101 = resnet101
    tv_m.vgg19 = vgg19
    return tv_m


def ref_hourglass_module():
    """Import the reference's hourglass.py (DreamHourglass / ResnetSimple)
    with the real-math torchvision model stubs installed."""
    install_torchvision_models()
    from lib.model.networks import hourglass  # noqa: E402

    return hourglass


def ref_datasets_module():
    """Load the reference's datasets.py (CenterTrackSeqDataset etc.) with the
    real utilities/geometric_vision backing the fake `sgtapose` package.
    albumentations isn't installed; datasets.py imports it at module level but
    the seq datasets never use it, so an empty stub suffices."""
    ensure_ref_detector_importable()
    _stub_module("albumentations")
    fake = sys.modules["sgtapose"]
    if not hasattr(fake, "datasets"):
        fake.datasets = _load_standalone(
            "_ref_datasets", os.path.join(REF_ROOT, "datasets.py")
        )
    return fake.datasets


def make_detector_opt(input_res=480, **overrides):
    """opt namespace covering every field the reference detector + tracker
    touch on the synthetic run path (defaults per lib/opts_parallel.py)."""
    import torch as _torch

    base = make_ref_opt()
    d = dict(
        vars(base),
        gpus=[-1],
        device=_torch.device("cpu"),
        arch="dlapawdl3new_34",
        heads=HEADS,
        head_conv=dict(HEAD_CONVS),
        num_classes=7,
        test_focal_length=-1,
        no_pause=True,
        phase="PlanA_win",
        infer_dataset="",
        save_dir="/tmp/ref_bench_out",
        robot="panda_synthetic",
        is_real_ros=False,
        fix_res=True,
        fix_short=-1,
        flip_test=False,
        input_h=input_res,
        input_w=input_res,
        down_ratio=4,
        pad=31,
        test_scales=[1.0],
        pre_hm=True,
        zero_pre_hm=False,
        hm_disturb=0.0,
        lost_disturb=0.0,
        out_thresh=0.1,
        pre_thresh=0.1,
        vis_thresh=0.3,
        new_thresh=0.3,
        max_age=-1,
        hungarian=False,
        public_det=False,
        tracking=True,
        debug=0,
        debug_dir="/tmp/ref_bench_out",
        demo="",
        depth_scale=1.0,
        dream_mode="vgg",
        dream_deconv_decoder=False,
        is_ct=True,
        non_block_test=False,
        qualitative=False,
        save_video=False,
        show_track_color=False,
        reset_hm=False,
        reuse_hm=False,
        zero_tracking=False,
        ltrb=False,
        ltrb_amodal=False,
    )
    d.update(overrides)
    return types.SimpleNamespace(**d)
