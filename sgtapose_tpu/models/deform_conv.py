"""Modulated deformable convolution (DCNv2) for TPU.

The reference uses an external CUDA extension (github.com/lbin/DCNv2, cloned at
install time — ref README.md:21-28, wrapped by DeformConv at dla.py:538-550)
as every node/projection unit of the DLA upsampling decoder.

TPU-native re-design: a 3x3 offset+mask conv produces 27 channels
(18 offsets + 9 modulation masks); all 9 kernel taps are sampled bilinearly
at (p + tap + offset) with FOUR batched corner gathers over the whole
(tap x pixel) index set — one take_along_axis per bilinear corner, not one
gather per (tap, corner) — then scaled by sigmoid(mask) and contracted with
the kernel weights in one (9*C_in -> C_out) matmul on the MXU.

Why not a Pallas kernel: Mosaic's dynamic gather only lowers within a single
128-lane tile on this toolchain (see ops/attention_kernel.py docstring for
the probe results), so XLA's native gather + MXU contraction is already the
TPU-correct formulation. The op-count shape matters far more: a per-tap
unrolled variant (36 small gathers/layer) produced thousands of tiny fusions
and dominated the training step; this 4-gather form is the fix.

Layout: NHWC. Offset channel convention matches DCNv2: for tap k, channels
(2k, 2k+1) are (dy, dx) and mask channel is k — tap order row-major over the
3x3 window.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _sample_pieces(feat, offsets, masks):
    """Shared forward/backward plumbing: corner values, weights, indices."""
    B, H, W, C = feat.shape
    gy = jnp.arange(H, dtype=jnp.float32)[:, None, None]  # (H,1,1)
    gx = jnp.arange(W, dtype=jnp.float32)[None, :, None]  # (1,W,1)
    ky = (jnp.arange(9, dtype=jnp.float32) // 3 - 1.0)[None, None, :]  # (1,1,9)
    kx = (jnp.arange(9, dtype=jnp.float32) % 3 - 1.0)[None, None, :]

    off = offsets.reshape(B, H, W, 9, 2)
    y = gy[None] + ky[None] + off[..., 0]  # (B,H,W,9)
    x = gx[None] + kx[None] + off[..., 1]

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = feat.reshape(B, H * W, C)
    n_idx = H * W * 9

    corners = []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take_along_axis(
            flat, idx.reshape(B, n_idx)[:, :, None], axis=1
        ).reshape(B, H, W, 9, C)
        vals = jnp.where(valid[..., None], vals, 0.0)
        corners.append((vals, idx, valid))

    # Coordinate math stays f32 (bf16's 8-bit mantissa would cost ~0.5px at
    # 120-pixel coordinates), but the bilinear WEIGHTS (values in [0,1]) are
    # cast to the feature dtype so the big (B, H*W*9, C) products/temps stay
    # bf16 under mixed precision — without this the f32 promotion doubles
    # activation memory and OOMs batch-8 480p training on a 16G chip.
    wdt = feat.dtype
    weights = (
        ((1 - fy) * (1 - fx))[..., None].astype(wdt),
        ((1 - fy) * fx)[..., None].astype(wdt),
        (fy * (1 - fx))[..., None].astype(wdt),
        (fy * fx)[..., None].astype(wdt),
    )
    return corners, weights, fy, fx


@jax.custom_vjp
def deform_sample_batch(
    feat: jnp.ndarray, offsets: jnp.ndarray, masks: jnp.ndarray
) -> jnp.ndarray:
    """Batched 9-tap modulated deformable sampling.

    feat: (B, H, W, C); offsets: (B, H, W, 18) as (dy, dx) per tap;
    masks: (B, H, W, 9) already sigmoided. Returns (B, H, W, 9*C).

    Custom VJP: XLA's autodiff-generated backward for the corner gathers got
    fused into a pathological scatter form inside the full training module
    (~7 ms per scatter vs 0.03 ms for the identical scatter standalone —
    measured on v5e). The hand-written backward computes the feature gradient
    with ONE segment_sum over all four corners and the offset/mask gradients
    from the analytic bilinear derivatives (standard DCNv2 backward formulas).
    """
    B, H, W, C = feat.shape
    corners, weights, _, _ = _sample_pieces(feat, offsets, masks)
    out = sum(vals * w for (vals, _, _), w in zip(corners, weights))
    out = out * masks[..., None]
    return out.reshape(B, H, W, 9 * C)


def _dsb_fwd(feat, offsets, masks):
    return deform_sample_batch(feat, offsets, masks), (feat, offsets, masks)


def _dsb_bwd(res, g):
    feat, offsets, masks = res
    B, H, W, C = feat.shape
    corners, weights, fy, fx = _sample_pieces(feat, offsets, masks)
    (v00, i00, m00), (v01, i01, m01), (v10, i10, m10), (v11, i11, m11) = corners
    w00, w01, w10, w11 = weights

    g9 = g.reshape(B, H, W, 9, C)
    samp = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    dmask = jnp.sum(samp * g9, axis=-1)  # (B,H,W,9)
    dsamp = g9 * masks[..., None]  # (B,H,W,9,C)

    # feature gradient: one segment_sum over (batch, corner, tap, pixel)
    n_idx = H * W * 9
    batch_base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]

    def flat_ids(idx, valid):
        ids = idx.reshape(B, n_idx) + batch_base
        # invalid taps scatter into a dump row (B*H*W), dropped afterwards
        return jnp.where(valid.reshape(B, n_idx), ids, B * H * W)

    ids = jnp.concatenate(
        [flat_ids(i00, m00), flat_ids(i01, m01), flat_ids(i10, m10), flat_ids(i11, m11)],
        axis=1,
    ).reshape(-1)
    updates = jnp.concatenate(
        [
            (dsamp * w00).reshape(B, n_idx, C),
            (dsamp * w01).reshape(B, n_idx, C),
            (dsamp * w10).reshape(B, n_idx, C),
            (dsamp * w11).reshape(B, n_idx, C),
        ],
        axis=1,
    ).reshape(-1, C)
    dfeat = jax.ops.segment_sum(updates, ids, num_segments=B * H * W + 1)
    dfeat = dfeat[: B * H * W].reshape(B, H, W, C)

    # offset gradients: analytic bilinear derivatives (fractional parts cast
    # to the feature dtype so the (B,H,W,9,C) temps stay bf16 under mixed
    # precision — same memory rationale as the forward weights)
    fy_ = fy[..., None].astype(feat.dtype)
    fx_ = fx[..., None].astype(feat.dtype)
    dval_dy = (v10 - v00) * (1 - fx_) + (v11 - v01) * fx_
    dval_dx = (v01 - v00) * (1 - fy_) + (v11 - v10) * fy_
    dy = jnp.sum(dsamp * dval_dy, axis=-1)  # (B,H,W,9)
    dx = jnp.sum(dsamp * dval_dx, axis=-1)
    doffsets = jnp.stack([dy, dx], axis=-1).reshape(B, H, W, 18)

    # cotangent dtypes must match the primals (bf16 training path)
    return (
        dfeat.astype(feat.dtype),
        doffsets.astype(offsets.dtype),
        dmask.astype(masks.dtype),
    )


deform_sample_batch.defvjp(_dsb_fwd, _dsb_bwd)


# Back-compat single-image API (tests, reference docs)
def bilinear_sample_nhwc(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (H, W, C) at float coords y, x of shape (H_out, W_out).
    Zero padding outside. Returns (H_out, W_out, C)."""
    H, W = feat.shape[0], feat.shape[1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat = feat.reshape(H * W, -1)
        v = flat[yc * W + xc]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


class DeformConv2d(nn.Module):
    """DCNv2: 3x3 modulated deformable conv, stride 1, pad 1, 1 group.

    Matches the lbin/DCNv2 module the reference wraps: the offset/mask conv is
    zero-initialized so the initial op is a plain 3x3 conv with 0.5 masks.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        offset_mask = nn.Conv(
            27,
            kernel_size=(3, 3),
            padding=1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset_mask",
        )(x)
        offsets = offset_mask[..., :18]
        masks = jax.nn.sigmoid(offset_mask[..., 18:27])

        flat = deform_sample_batch(x, offsets, masks)  # (B,H,W,9*C)

        # kernel contraction on the MXU: (9*C_in) -> features
        out = nn.Conv(
            self.features,
            kernel_size=(1, 1),
            use_bias=self.use_bias,
            name="kernel",
        )(flat)
        return out
