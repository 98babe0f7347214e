"""Modulated deformable convolution (DCNv2) for TPU.

The reference uses an external CUDA extension (github.com/lbin/DCNv2, cloned at
install time — ref README.md:21-28, wrapped by DeformConv at dla.py:538-550)
as every node/projection unit of the DLA upsampling decoder.

TPU-native re-design: a 3x3 offset+mask conv produces 27 channels
(18 offsets + 9 modulation masks); each of the 9 kernel taps bilinearly
samples the input at (p + tap + offset) and is scaled by sigmoid(mask); the
gathered (9*C_in) features per pixel then hit one big matmul with the kernel
weights — that final contraction runs on the MXU. The bilinear gather is pure
XLA (dynamic gather over the flattened spatial dim); a fused Pallas kernel is
the planned fast path (see sgtapose_tpu/ops).

Layout: NHWC. Offset channel convention matches DCNv2: for tap k, channels
(2k, 2k+1) are (dy, dx) and mask channel is k — tap order row-major over the
3x3 window.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


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


def deform_sample(
    feat: jnp.ndarray, offsets: jnp.ndarray, masks: jnp.ndarray
) -> jnp.ndarray:
    """Gather the 9 modulated deformable taps.

    feat: (H, W, C); offsets: (H, W, 18) as (dy, dx) per tap; masks: (H, W, 9)
    already sigmoided. Returns (H, W, 9, C).
    """
    H, W = feat.shape[0], feat.shape[1]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]
    taps = []
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        y = gy + ky + offsets[..., 2 * k]
        x = gx + kx + offsets[..., 2 * k + 1]
        v = bilinear_sample_nhwc(feat, y, x)
        taps.append(v * masks[..., k : k + 1])
    return jnp.stack(taps, axis=2)


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

        sampled = jax.vmap(deform_sample)(x, offsets, masks)  # (B,H,W,9,C)
        B, H, W = sampled.shape[0], sampled.shape[1], sampled.shape[2]
        flat = sampled.reshape(B, H, W, -1)  # (B,H,W,9*C)

        # kernel contraction on the MXU: (9*C_in) -> features
        out = nn.Conv(
            self.features,
            kernel_size=(1, 1),
            use_bias=self.use_bias,
            name="kernel",
        )(flat)
        return out
