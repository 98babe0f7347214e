"""Model variant zoo: 3-frame model, concat baseline, factory names."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtapose_tpu.config import ModelConfig
from sgtapose_tpu.models.sgta import create_model
from sgtapose_tpu.models.variants import SGTAPoseCat, SGTAPoseThree

TINY = ModelConfig(input_res=(64, 64), kernel_list=(3, 3, 3, 1, 1, 1), dla_node="conv")


def _imgs(B=1):
    k = jax.random.PRNGKey(0)
    return (
        jax.random.normal(k, (B, 64, 64, 3)),
        jnp.zeros((B, 64, 64, 1)),
        jax.random.uniform(jax.random.fold_in(k, 1), (B, 16, 16, 7)),
    )


def test_three_frame_forward():
    img, hm, cls = _imgs()
    m = SGTAPoseThree(TINY)
    args = (img, img, img, hm, hm, hm, cls, cls, cls)
    v = m.init(jax.random.PRNGKey(1), *args, train=False)
    out = m.apply(v, *args, train=False)
    assert out["hm"].shape == (1, 16, 16, 7)
    assert np.isfinite(np.asarray(out["hm"])).all()
    # unshared: two attention stacks per level
    assert "attn1_0" in v["params"] and "attn2_0" in v["params"]


def test_three_frame_shared_ca():
    img, hm, cls = _imgs()
    m = SGTAPoseThree(TINY, shared_ca=True)
    args = (img, img, img, hm, hm, hm, cls, cls, cls)
    v = m.init(jax.random.PRNGKey(1), *args, train=False)
    # shared: only one attention stack per level
    assert "attn1_0" in v["params"] and "attn2_0" not in v["params"]


def test_cat_baseline_forward():
    img, hm, cls = _imgs()
    m = SGTAPoseCat(TINY)
    v = m.init(jax.random.PRNGKey(1), img, img, hm, hm, train=False)
    out = m.apply(v, img, img, hm, hm, train=False)
    assert out["hm"].shape == (1, 16, 16, 7)


@pytest.mark.parametrize(
    "arch",
    ["dlapawdl3new_34", "dlapawd3_34", "dlapacat_34", "dreamhourglass",
     "resnetsimple", "dlaseg_34"],
)
def test_factory(arch):
    cfg = ModelConfig(arch=arch, input_res=(64, 64), kernel_list=(3, 3, 3, 1, 1, 1))
    assert create_model(cfg) is not None
