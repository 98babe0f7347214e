"""Forward parity for the DREAM baseline architectures against the LIVING
reference hourglass.py (DreamHourglass VGG19 encoder with both decoder
options, ResnetSimple resnet101+deconv — ref hourglass.py:97-576).

The reference modules are instantiated with real-math torchvision model
stand-ins (ref_oracle.install_torchvision_models — identical module trees and
state_dict names to torchvision's resnet101/vgg19, random init), randomized,
converted with utils/torch_convert.convert_dream_state_dict, and compared in
float64 (mapping/architecture errors vs f32 noise isolation, same method as
test_parity_torch).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sgtapose_tpu.models import dream_baselines as db  # noqa: E402
from sgtapose_tpu.utils import torch_convert as tc  # noqa: E402

import ref_oracle  # noqa: E402

RES = 64
KP = 7


def _randomize(model, seed=317):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


def _compare_f64(ref_model, our_model, variables, res=RES, atol=1e-9):
    rng = np.random.RandomState(7)
    x = rng.rand(1, 3, res, res).astype(np.float32)
    ref_model.eval()
    ref64 = ref_model.double()
    with torch.no_grad():
        ref_out = ref64(torch.from_numpy(x).double())[0]["hm"].numpy()
    with jax.enable_x64(True):
        vars64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), variables)
        ours = our_model.apply(
            vars64,
            jnp.asarray(np.transpose(x, (0, 2, 3, 1)), jnp.float64),
            train=False,
        )["hm"]
    our_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert our_nchw.shape == ref_out.shape, (our_nchw.shape, ref_out.shape)
    max_err = np.abs(ref_out - our_nchw).max()
    assert max_err < atol, f"f64 max|delta|={max_err:.3e}"


def _convert(ref_model, our_model, res=RES, **kw):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = our_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)), train=False
    )
    stats = variables.get("batch_stats", {})
    params, new_stats, report = tc.convert_dream_state_dict(
        sd, variables["params"], stats, strict=True, **kw
    )
    assert not report["unused_ref_keys"], report["unused_ref_keys"][:10]
    out = {"params": params}
    if stats:
        out["batch_stats"] = new_stats
    return out, report


@pytest.mark.parametrize("deconv", [False, True])
def test_dream_hourglass_parity(deconv):
    hg = ref_oracle.ref_hourglass_module()
    torch.manual_seed(1)
    ref_model = hg.DreamHourglass(
        n_keypoints=KP, n_image_input_channels=3, deconv_decoder=deconv
    )
    _randomize(ref_model)
    our_model = db.DreamHourglass(KP, deconv_decoder=deconv)
    variables, report = _convert(
        ref_model, our_model, arch="dreamhourglass", deconv_decoder=deconv
    )
    assert report["n_converted"] > 30
    _compare_f64(ref_model, our_model, variables)


def test_dream_hourglass_full_output_parity():
    hg = ref_oracle.ref_hourglass_module()
    torch.manual_seed(2)
    ref_model = hg.DreamHourglass(
        n_keypoints=KP, n_image_input_channels=3, full_output=True
    )
    _randomize(ref_model)
    our_model = db.DreamHourglass(KP, full_output=True)
    variables, _ = _convert(
        ref_model, our_model, arch="dreamhourglass", full_output=True
    )
    _compare_f64(ref_model, our_model, variables)


@pytest.mark.slow
@pytest.mark.parametrize("full", [False, True])
def test_resnet_simple_parity(full):
    hg = ref_oracle.ref_hourglass_module()
    torch.manual_seed(3)
    ref_model = hg.ResnetSimple(n_keypoints=KP, pretrained=False, full=full)
    _randomize(ref_model)
    our_model = db.ResnetSimple(KP, full=full)
    variables, report = _convert(
        ref_model, our_model, arch="resnetsimple", full_output=full
    )
    assert report["n_converted"] > 300  # resnet101 trunk fully mapped
    _compare_f64(ref_model, our_model, variables)
