"""Temporal top-k windowed cross-attention (the SGTAPose paper's core).

Re-design of ref lib/model/networks/dla.py:676-1018 for TPU:
  * `topk_class_indices`: per-class top-K argmax of the prior cls heatmaps
    -> static-shape (x, y) coordinates (ref get_topk_index :898-913)
  * `gather_window_features`: kernel^2-point window gather around each top-k
    coordinate, scaled into the feature level's resolution, clamped at the
    border (ref get_topk_features_scale :915-968) — expressed as one
    take_along_axis gather, static shapes
  * `MultiHeadCrossAttention`: einops-free MHA with a LEARNED relative
    position bias pos_embed (heads, n, n) added to the logits
    (ref MHCA_ein :848-887)
  * `TransformerEncoderLayer`: cross-attn + FFN(1024) + LayerNorms, with the
    reference's quirky residual (dropout applied to the residual *query*, not
    the attention output — ref :734-743)
  * `TransformerEncoder`: `num_layers` applications of the SAME layer module —
    the reference's `_get_clones` reuses one module instance, producing
    weight-tied layers (ref :788-803); calling one Flax submodule N times
    reproduces exactly that
  * `scatter_window_features`: write attended features back through the
    2-layer `cat_layer` MLP (ref substitute_topk_features_scale :1006-1018)

All shapes are static: n_tokens = num_classes * K * kernel_window^2.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def topk_class_indices(hm_cls: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-class top-k peak coordinates.

    hm_cls: (B, H, W, C) prior class heatmaps (120x120 in the flagship).
    Returns (B, C*k, 2) float32 (x, y), class-major ordering like the
    reference's view(B, C*K) flattening.
    """
    B, H, W, C = hm_cls.shape
    flat = hm_cls.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    _, idx = jax.lax.top_k(flat, k)  # (B, C, k)
    idx = idx.reshape(B, C * k)
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1)


def topk_flat_fractions(hm: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k flat indices of a prior heatmap, normalized to [0, 1) fractions
    of H*W (ref get_topk_pairs dla.py:889-896, used by DLA_PlanA). The
    fraction is re-scaled into each feature level's flat index space by the
    caller — the reference's quirky flat-index renormalization (NOT an (x,y)
    coordinate scale) is reproduced exactly, including the float32 rounding
    of `topk_idx / (H*W)` then truncation at `frac * Hf*Wf`.

    hm: (B, H, W, C) (C=1 for the 480^2 priors). Returns (B, C*k) float32.
    """
    B, H, W, C = hm.shape
    flat = hm.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    _, idx = jax.lax.top_k(flat, k)  # (B, C, k)
    frac = idx.astype(jnp.float32) / jnp.float32(H * W)
    return frac.reshape(B, C * k)


def flat_ids_from_fractions(frac: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(B, M) fractions -> (B, M) int32 flat ids at this level's resolution
    (ref get_topk_features dla.py:972-987: `(topk * H * W).long()`)."""
    return (frac * jnp.float32(height * width)).astype(jnp.int32)


def window_feat_ids(
    topk_xy: jnp.ndarray, scale: float, kernel: int, height: int, width: int
) -> jnp.ndarray:
    """Flattened pixel ids of the kernel-window neighborhoods.

    topk_xy: (B, K, 2) coordinates in cls-heatmap space; scaled by `scale`
    into this feature level's resolution, then offset by the window, clamped
    to the border, and flattened to y*W + x (ref get_topk_features_scale).
    Returns (B, K * n_win) int32 where n_win = (2*(kernel//2)+1)^2.
    """
    r = kernel // 2
    coords1d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    n1 = coords1d.shape[0]
    # row-major (i, j) offsets like the reference's meshgrid+flatten
    off_a = jnp.repeat(coords1d, n1)
    off_b = jnp.tile(coords1d, n1)
    offsets = jnp.stack([off_a, off_b], axis=-1)  # (n_win, 2)

    coords = topk_xy[:, :, None, :] * scale + offsets[None, None, :, :]
    # per-axis border clamp. The reference asserts H == W and clamps both
    # axes to H-1 (get_topk_features_scale dla.py:937-941); for square maps
    # this is identical, and non-square maps (which the reference refuses
    # outright) gather correctly instead of bleeding across rows.
    x = jnp.clip(coords[..., 0], 0.0, float(width - 1))
    y = jnp.clip(coords[..., 1], 0.0, float(height - 1))
    feat_id = y * width + x
    B = topk_xy.shape[0]
    return feat_id.reshape(B, -1).astype(jnp.int32)


def gather_window_features(feats: jnp.ndarray, feat_ids: jnp.ndarray) -> jnp.ndarray:
    """feats: (B, H, W, C); feat_ids: (B, M) -> (B, M, C)."""
    B, H, W, C = feats.shape
    flat = feats.reshape(B, H * W, C)
    return jnp.take_along_axis(flat, feat_ids[:, :, None], axis=1)


def scatter_window_features(
    feats: jnp.ndarray, feat_ids: jnp.ndarray, values: jnp.ndarray
) -> jnp.ndarray:
    """Write values (B, M, C) back into feats (B, H, W, C) at feat_ids (B, M).

    Duplicate ids (overlapping clamped windows) resolve nondeterministically,
    matching the reference's advanced-indexing assignment semantics.
    """
    B, H, W, C = feats.shape
    flat = feats.reshape(B, H * W, C)
    values = values.astype(feats.dtype)

    def scatter_one(f, ids, v):
        return f.at[ids].set(v)

    flat = jax.vmap(scatter_one)(flat, feat_ids, values)
    return flat.reshape(B, H, W, C)


class MultiHeadCrossAttention(nn.Module):
    """MHA with learned (heads, n, n) position bias (ref MHCA_ein dla.py:848-887).

    use_fused selects the Pallas flash-style kernel
    (ops/attention_kernel.py): identical math, no HBM logits tensor in either
    the forward or backward pass.
    """

    n_heads: int
    inp_dim: int
    hid_dim: int
    n_tokens: int
    pos_embed: bool = True
    use_fused: bool = False
    fused_interpret: bool = False  # interpret-mode (CPU tests)

    @nn.compact
    def __call__(self, query, key, value):
        B, N, _ = query.shape
        h = self.n_heads
        d = self.hid_dim // h
        q = nn.Dense(self.hid_dim, use_bias=False, name="w_q")(query)
        k = nn.Dense(self.hid_dim, use_bias=False, name="w_k")(key)
        v = nn.Dense(self.hid_dim, use_bias=False, name="w_v")(value)
        q = q.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        if self.pos_embed:
            bias = self.param(
                "pos_embed",
                nn.initializers.zeros,
                (h, self.n_tokens, self.n_tokens),
            )
        else:
            bias = None

        if self.use_fused:
            from sgtapose_tpu.ops.attention_kernel import fused_biased_attention

            if bias is None:
                bias = jnp.zeros((h, N, N), q.dtype)
            out = fused_biased_attention(
                q, k, v, bias.astype(q.dtype), self.fused_interpret
            )
        else:
            scale = jnp.sqrt(jnp.float32(d))
            energy = jnp.einsum("bhid,bhjd->bhij", q, k) / scale
            if bias is not None:
                energy = energy + bias
            attn = jax.nn.softmax(energy, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.hid_dim)
        return nn.Dense(self.inp_dim, name="fc")(out)


class TransformerEncoderLayer(nn.Module):
    """Cross-attn + FFN block (ref TransformerEncoderLayer dla.py:702-743)."""

    d_inp: int
    d_model: int
    n_tokens: int
    d_ffn: int = 1024
    dropout: float = 0.1
    n_heads: int = 8
    pos_embed: bool = True
    use_fused: bool = False
    fused_interpret: bool = False

    @nn.compact
    def __call__(self, query, key, value, train: bool = False):
        attn = MultiHeadCrossAttention(
            self.n_heads,
            self.d_inp,
            self.d_model * self.n_heads,
            self.n_tokens,
            self.pos_embed,
            use_fused=self.use_fused,
            fused_interpret=self.fused_interpret,
            name="cross_attn",
        )(query, key, value)
        # reference quirk: dropout on the residual query, not the attn output
        resid = nn.Dropout(self.dropout, deterministic=not train)(query)
        # epsilon matches torch nn.LayerNorm (1e-5) for checkpoint parity
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(attn + resid)
        # FFN
        y = nn.Dense(self.d_ffn, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.d_inp, name="linear2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + y)


class TransformerEncoder(nn.Module):
    """num_layers applications of ONE shared layer (weight-tied, by design:
    the reference's _get_clones reuses the same module instance)."""

    d_inp: int
    d_model: int
    n_tokens: int
    num_layers: int = 3
    n_heads: int = 8
    pos_embed: bool = True
    use_fused: bool = False
    fused_interpret: bool = False

    @nn.compact
    def __call__(self, query, key, value, train: bool = False):
        layer = TransformerEncoderLayer(
            self.d_inp,
            self.d_model,
            self.n_tokens,
            n_heads=self.n_heads,
            pos_embed=self.pos_embed,
            use_fused=self.use_fused,
            fused_interpret=self.fused_interpret,
            name="layer",
        )
        out = query
        for _ in range(self.num_layers):
            out = layer(out, key, value, train)
        return out


class CatLayer(nn.Module):
    """2-layer MLP merging attended + current features before write-back
    (ref cat_layer dla.py:1499-1502: Linear(2C->4C), ReLU, Linear(4C->C)).
    The 3-frame variant uses Linear(3C->6C), ReLU, Linear(6C->C)
    (ref dla.py:1394-1397) — pass hidden explicitly there."""

    features: int  # C of this level
    hidden: int | None = None  # default 4*features

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden or self.features * 4, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.features, name="fc2")(x)
