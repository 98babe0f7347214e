"""Pallas fused biased-attention kernel: forward/backward parity vs the XLA
path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgtapose_tpu.ops.attention_kernel import fused_biased_attention


def ref_attn(q, k, v, bias):
    d = q.shape[-1]
    e = jnp.einsum("bhid,bhjd->bhij", q, k) / jnp.sqrt(jnp.float32(d)) + bias
    p = jax.nn.softmax(e, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p, v)


@pytest.fixture(scope="module")
def qkvb():
    B, h, n, d = 2, 4, 100, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return (
        jax.random.normal(ks[0], (B, h, n, d)),
        jax.random.normal(ks[1], (B, h, n, d)),
        jax.random.normal(ks[2], (B, h, n, d)),
        jax.random.normal(ks[3], (h, n, n)) * 0.1,
    )


def test_forward_matches_xla(qkvb):
    q, k, v, bias = qkvb
    out = fused_biased_attention(q, k, v, bias, True)
    expect = ref_attn(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=2e-4)


def test_gradients_match_xla(qkvb):
    q, k, v, bias = qkvb

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_biased_attention(q, k, v, bias, True) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(ref_attn(q, k, v, bias) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_module_fused_matches_unfused():
    """MultiHeadCrossAttention with use_fused must reproduce the XLA path."""
    from sgtapose_tpu.models.attention import MultiHeadCrossAttention

    n, d_inp = 63, 16
    q = jax.random.normal(jax.random.PRNGKey(1), (2, n, d_inp))
    kv = jax.random.normal(jax.random.PRNGKey(2), (2, n, d_inp))

    m_plain = MultiHeadCrossAttention(8, d_inp, 32, n, True)
    variables = m_plain.init(jax.random.PRNGKey(3), q, kv, kv)
    # perturb pos_embed so the bias actually matters
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(4), x.shape), variables
    )
    out_plain = m_plain.apply(variables, q, kv, kv)

    m_fused = MultiHeadCrossAttention(
        8, d_inp, 32, n, True, use_fused=True, fused_interpret=True
    )
    out_fused = m_fused.apply(variables, q, kv, kv)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), atol=5e-4
    )
