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
    p = v["params"]
    # unshared: two parallel attention stacks per attn level (ref
    # pprev_transformer + prev_transformer, dla.py:1386-1393)
    assert "prev_transformer_0" in p and "pprev_transformer_0" in p
    # dense levels 3-5 use the 3C->6C->C cat_layer
    assert "cat_layer_5" in p
    fc1 = p["cat_layer_5"]["fc1"]["kernel"]
    assert fc1.shape == (512 * 3, 512 * 6), fc1.shape


def test_three_frame_shared_ca():
    img, hm, cls = _imgs()
    m = SGTAPoseThree(TINY, shared_ca=True)
    args = (img, img, img, hm, hm, hm, cls, cls, cls)
    v = m.init(jax.random.PRNGKey(1), *args, train=False)
    # shared: only the prev stack exists; it serves both keys
    p = v["params"]
    assert "prev_transformer_0" in p and "pprev_transformer_0" not in p


def test_cat_baseline_forward():
    img, hm, cls = _imgs()
    m = SGTAPoseCat(TINY)
    v = m.init(jax.random.PRNGKey(1), img, img, hm, hm, train=False)
    out = m.apply(v, img, img, hm, hm, train=False)
    assert out["hm"].shape == (1, 16, 16, 7)


@pytest.mark.parametrize(
    "arch",
    ["dlapawdl3new_34", "dlapawd3_34", "dlapacat_34", "dreamhourglass",
     "resnetsimple", "dlaseg_34", "dlapa_34", "dlapawd_34", "dlaabla_34"],
)
def test_factory(arch):
    cfg = ModelConfig(arch=arch, input_res=(64, 64), kernel_list=(3, 3, 3, 1, 1, 1))
    assert create_model(cfg) is not None


def test_factory_rejects_unknown():
    """The factory must fail loudly instead of silently routing an
    unimplemented name to the flagship (round-1 bug)."""
    with pytest.raises(ValueError):
        create_model(ModelConfig(arch="dlapawx_34"))
    with pytest.raises(ValueError):
        create_model(ModelConfig(arch="hourglass_104"))


def test_global_attention_forward():
    """DLA_PlanA equivalent: full-res 1-ch priors drive global top-K tokens."""
    from sgtapose_tpu.models.variants import SGTAPoseGlobal

    img, hm, cls = _imgs()
    m = SGTAPoseGlobal(TINY)
    v = m.init(jax.random.PRNGKey(1), img, img, hm, hm, cls, cls, train=False)
    out = m.apply(v, img, img, hm, hm, cls, cls, train=False)
    assert out["hm"].shape == (1, 16, 16, 7)
    assert np.isfinite(np.asarray(out["hm"])).all()
    # all 6 levels have (weight-tied) transformers, none with pos_embed
    p = v["params"]
    for i in range(6):
        t = p[f"transformer_{i}"]["layer"]["cross_attn"]
        assert "pos_embed" not in t, f"level {i} must be plain MHCA"


def test_window_dense_forward():
    """DLA_PlanAWindow equivalent: attn levels 0-2, dense cat_layer 3-5."""
    from sgtapose_tpu.models.variants import SGTAPoseWindowDense

    img, hm, cls = _imgs()
    m = SGTAPoseWindowDense(TINY)
    v = m.init(jax.random.PRNGKey(1), img, img, hm, hm, cls, cls, train=False)
    out = m.apply(v, img, img, hm, hm, cls, cls, train=False)
    assert out["hm"].shape == (1, 16, 16, 7)
    p = v["params"]
    assert "attn_0" in p and "attn_2" in p and "attn_3" not in p
    assert "cat_layer_3" in p and "cat_layer_5" in p


@pytest.mark.parametrize("mode", ["wo_shared", "shared", "shared_repro"])
def test_ablation_forward(mode):
    import dataclasses

    from sgtapose_tpu.models.variants import SGTAPoseAblation

    img, hm, cls = _imgs()
    cfg = dataclasses.replace(TINY, ablation_mode=mode)
    m = SGTAPoseAblation(cfg)
    v = m.init(jax.random.PRNGKey(1), img, img, hm, hm, train=False)
    out = m.apply(v, img, img, hm, hm, train=False)
    assert out["hm"].shape == (1, 16, 16, 7)
    if mode == "wo_shared":
        assert "base1" in v["params"]  # separate current-frame trunk
    else:
        assert "base1" not in v["params"]


def test_global_trains_one_step():
    """dlapa takes a gradient step without NaNs (PlanA_win phase wiring).

    Runs in a SUBPROCESS: this is the suite's largest single XLA:CPU compile
    (global attention, full grad), and inside the ~200-test process it
    crashes the interpreter (SIGSEGV once, SIGABRT once, at exactly this
    compile; 3/3 full-suite runs, 2026-08-21) while passing solo and in
    every subset combination tried — native-library state accumulated by the
    long prefix, not this test's math, and jax.clear_caches() between
    modules does not avoid it. The subprocess keeps the exact assertion,
    shares the persistent compile cache, and leaves the suite immune to the
    prefix."""
    import subprocess
    import sys

    script = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(".cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from sgtapose_tpu.config import ModelConfig
from sgtapose_tpu.models.variants import SGTAPoseGlobal

TINY = ModelConfig(input_res=(64, 64), kernel_list=(3, 3, 3, 1, 1, 1), dla_node="conv")
k = jax.random.PRNGKey(0)
img = jax.random.normal(k, (1, 64, 64, 3))
hm = jnp.zeros((1, 64, 64, 1))
cls = jax.random.uniform(jax.random.fold_in(k, 1), (1, 16, 16, 7))
m = SGTAPoseGlobal(TINY)
v = m.init(jax.random.PRNGKey(1), img, img, hm, hm, cls, cls, train=False)

def loss_fn(params):
    out = m.apply(
        {"params": params, "batch_stats": v["batch_stats"]},
        img, img, hm, hm, cls, cls, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
    )[0]
    return jnp.mean(out["hm"] ** 2)

g = jax.jit(jax.grad(loss_fn))(v["params"])
leaves = jax.tree_util.tree_leaves(g)
assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
print("GLOBAL_GRAD_OK")
"""
    import os

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    proc = subprocess.run(
        [sys.executable, "-c", script], cwd=repo,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-3000:])
    assert "GLOBAL_GRAD_OK" in proc.stdout, proc.stdout[-500:]
