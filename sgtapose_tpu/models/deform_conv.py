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

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from sgtapose_tpu.models.layers import Conv


def _sample_pieces(feat, offsets, masks, row0=0.0):
    """Shared forward/backward plumbing: corner values, weights, indices.

    `offsets` may cover only a horizontal slab of the output grid (the
    chunked path): its row axis is `Hs` rows starting at global row `row0`
    (a traced scalar under `lax.scan`). Gather indices are global into the
    FULL `feat`, so slab results concatenate to exactly the unchunked op.
    """
    B, H, W, C = feat.shape
    Hs = offsets.shape[1]
    gy = (row0 + jnp.arange(Hs, dtype=jnp.float32))[:, None, None]  # (Hs,1,1)
    gx = jnp.arange(W, dtype=jnp.float32)[None, :, None]  # (1,W,1)
    ky = (jnp.arange(9, dtype=jnp.float32) // 3 - 1.0)[None, None, :]  # (1,1,9)
    kx = (jnp.arange(9, dtype=jnp.float32) % 3 - 1.0)[None, None, :]

    off = offsets.reshape(B, Hs, W, 9, 2)
    y = gy[None] + ky[None] + off[..., 0]  # (B,Hs,W,9)
    x = gx[None] + kx[None] + off[..., 1]

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = feat.reshape(B, H * W, C)
    n_idx = Hs * W * 9

    corners = []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = y0i + dy
        xi = x0i + dx
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)).astype(jnp.float32)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        # Zero-padding semantics are enforced by folding `valid` into the
        # (B,Hs,W,9,1) bilinear weights below, NOT by where-masking the gathered
        # values: a select on the (B,Hs,W,9,C) gather output costs a second
        # full-size buffer per corner (506 MB padded at B=16 level-0) and was
        # the dominant temp in the B=16 OOM report. promise_in_bounds skips
        # take_along_axis's own OOB fill-select (indices are clipped above).
        vals = jnp.take_along_axis(
            flat,
            idx.reshape(B, n_idx)[:, :, None],
            axis=1,
            mode="promise_in_bounds",
        ).reshape(B, Hs, W, 9, C)
        corners.append((vals, idx, valid))

    # Coordinate math stays f32 (bf16's 8-bit mantissa would cost ~0.5px at
    # 120-pixel coordinates), but the bilinear WEIGHTS (values in [0,1]) are
    # cast to the feature dtype so the big (B, H*W*9, C) products/temps stay
    # bf16 under mixed precision — without this the f32 promotion doubles
    # activation memory and OOMs batch-8 480p training on a 16G chip.
    wdt = feat.dtype
    val00, val01, val10, val11 = (v for _, _, v in corners)
    weights = (
        ((1 - fy) * (1 - fx) * val00)[..., None].astype(wdt),
        ((1 - fy) * fx * val01)[..., None].astype(wdt),
        (fy * (1 - fx) * val10)[..., None].astype(wdt),
        (fy * fx * val11)[..., None].astype(wdt),
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


def _bwd_core(feat, offsets, masks, g9, dfeat_acc, row0=0.0):
    """Backward math for one slab (or the whole grid when row0=0, Hs=H).

    g9: (B,Hs,W,9,C) cotangent of the masked samples; dfeat_acc: running
    (B*H*W, C) feature-gradient accumulator (segment_sum adds into it).
    Returns (dfeat_acc, doffsets_slab, dmask_slab).
    """
    B, H, W, C = feat.shape
    Hs = offsets.shape[1]
    corners, weights, fy, fx = _sample_pieces(feat, offsets, masks, row0)
    (v00, i00, val00), (v01, i01, val01), (v10, i10, val10), (v11, i11, val11) = corners
    w00, w01, w10, w11 = weights

    samp = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    dmask = jnp.sum(samp * g9, axis=-1)  # (B,Hs,W,9)
    dsamp = g9 * masks[..., None]  # (B,Hs,W,9,C)

    # feature gradient: one segment_sum per corner, accumulated. Invalid taps
    # carry weight 0 (validity is folded into the weights), so scattering
    # their zero updates into the clipped index is a no-op — no dump row, and
    # no 4x(B,H*W*9,C) concatenated updates buffer (2 GB padded at B=16;
    # that concat was half of the B=16 backward peak).
    n_idx = Hs * W * 9
    batch_base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
    for idx, w in ((i00, w00), (i01, w01), (i10, w10), (i11, w11)):
        ids = (idx.reshape(B, n_idx) + batch_base).reshape(-1)
        dfeat_acc = dfeat_acc + jax.ops.segment_sum(
            (dsamp * w).reshape(-1, C), ids, num_segments=B * H * W
        )

    # offset gradients: analytic bilinear derivatives with validity folded
    # into the small per-corner coefficients — identical to zeroing the
    # gathered corner values first (zero-padding semantics), without the
    # full-size selects. Coefficients cast to the feature dtype so the
    # (B,Hs,W,9,C) temps stay bf16 under mixed precision.
    wdt = feat.dtype

    def coef(c, valid):
        return (c * valid)[..., None].astype(wdt)

    dval_dy = (
        v00 * coef(-(1 - fx), val00)
        + v01 * coef(-fx, val01)
        + v10 * coef(1 - fx, val10)
        + v11 * coef(fx, val11)
    )
    dval_dx = (
        v00 * coef(-(1 - fy), val00)
        + v01 * coef(1 - fy, val01)
        + v10 * coef(-fy, val10)
        + v11 * coef(fy, val11)
    )
    dy = jnp.sum(dsamp * dval_dy, axis=-1)  # (B,Hs,W,9)
    dx = jnp.sum(dsamp * dval_dx, axis=-1)
    doffsets = jnp.stack([dy, dx], axis=-1).reshape(B, Hs, W, 18)
    return dfeat_acc, doffsets, dmask


def _dsb_bwd(res, g):
    feat, offsets, masks = res
    B, H, W, C = feat.shape
    g9 = g.reshape(B, H, W, 9, C)
    dfeat = jnp.zeros((B * H * W, C), dtype=feat.dtype)
    dfeat, doffsets, dmask = _bwd_core(feat, offsets, masks, g9, dfeat)
    # cotangent dtypes must match the primals (bf16 training path)
    return (
        dfeat.reshape(B, H, W, C).astype(feat.dtype),
        doffsets.astype(offsets.dtype),
        dmask.astype(masks.dtype),
    )


deform_sample_batch.defvjp(_dsb_fwd, _dsb_bwd)


def _pick_chunks(H: int, chunks: int) -> int:
    """Largest divisor of H that is <= chunks (so slabs tile H exactly)."""
    for s in range(min(chunks, H), 0, -1):
        if H % s == 0:
            return s
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def deform_sample_batch_chunked(chunks: int, feat, offsets, masks):
    """`deform_sample_batch` computed in `chunks` horizontal output slabs.

    Numerically identical op (global gather indices, same per-tap math; only
    the iteration order over output rows changes), but the (B,Hs,W,9,C)
    gather/product temps shrink by the chunk factor: a `lax.scan` over row
    slabs keeps one slab's corner gathers live at a time instead of the full
    (B,H,W,9,C) set that OOMs B=16 480p training (20x 270 MB level-0 temps —
    see docs/PERF.md round-3). The slight cost: the scan serializes slabs,
    so use only where memory (not FLOPs) binds — large-batch training.
    """
    return _dsc_impl(chunks, feat, offsets, masks)


def _dsc_impl(chunks, feat, offsets, masks):
    B, H, W, C = feat.shape
    S = _pick_chunks(H, chunks)
    if S == 1:
        return deform_sample_batch(feat, offsets, masks)
    Hs = H // S
    offs = jnp.moveaxis(offsets.reshape(B, S, Hs, W, 18), 1, 0)  # (S,B,Hs,W,18)
    msks = jnp.moveaxis(masks.reshape(B, S, Hs, W, 9), 1, 0)
    row0s = jnp.arange(S, dtype=jnp.float32) * Hs

    def body(_, xs):
        off_s, msk_s, r0 = xs
        corners, weights, _, _ = _sample_pieces(feat, off_s, msk_s, r0)
        out = sum(v * w for (v, _, _), w in zip(corners, weights))
        return None, (out * msk_s[..., None]).reshape(B, Hs, W, 9 * C)

    _, outs = jax.lax.scan(body, None, (offs, msks, row0s))
    return jnp.moveaxis(outs, 0, 1).reshape(B, H, W, 9 * C)


def _dsc_fwd(chunks, feat, offsets, masks):
    return _dsc_impl(chunks, feat, offsets, masks), (feat, offsets, masks)


def _dsc_bwd(chunks, res, g):
    feat, offsets, masks = res
    B, H, W, C = feat.shape
    S = _pick_chunks(H, chunks)
    if S == 1:
        return _dsb_bwd(res, g)
    Hs = H // S
    offs = jnp.moveaxis(offsets.reshape(B, S, Hs, W, 18), 1, 0)
    msks = jnp.moveaxis(masks.reshape(B, S, Hs, W, 9), 1, 0)
    row0s = jnp.arange(S, dtype=jnp.float32) * Hs
    g9 = jnp.moveaxis(g.reshape(B, S, Hs, W, 9, C), 1, 0)

    def body(dfeat_acc, xs):
        off_s, msk_s, r0, g_s = xs
        dfeat_acc, doff_s, dmsk_s = _bwd_core(feat, off_s, msk_s, g_s, dfeat_acc, r0)
        return dfeat_acc, (doff_s, dmsk_s)

    dfeat0 = jnp.zeros((B * H * W, C), dtype=feat.dtype)
    dfeat, (doffs, dmsks) = jax.lax.scan(body, dfeat0, (offs, msks, row0s, g9))
    doffsets = jnp.moveaxis(doffs, 0, 1).reshape(B, H, W, 18)
    dmask = jnp.moveaxis(dmsks, 0, 1).reshape(B, H, W, 9)
    return (
        dfeat.reshape(B, H, W, C).astype(feat.dtype),
        doffsets.astype(offsets.dtype),
        dmask.astype(masks.dtype),
    )


deform_sample_batch_chunked.defvjp(_dsc_fwd, _dsc_bwd)


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
    # memory knob for large-batch training: compute the deformable sampling
    # in `chunks` horizontal slabs (lax.scan) so the (B,H,W,9,C) gather temps
    # shrink by the chunk factor. 1 = single-pass (default, fastest).
    chunks: int = 1

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

        if self.chunks > 1:
            flat = deform_sample_batch_chunked(self.chunks, x, offsets, masks)
        else:
            flat = deform_sample_batch(x, offsets, masks)  # (B,H,W,9*C)

        # kernel contraction on the MXU: (9*C_in) -> features
        # (quantizable: the big matmul; the offset/mask conv above stays
        # full-precision — offsets are geometry, not features)
        out = Conv(
            self.features,
            kernel_size=(1, 1),
            use_bias=self.use_bias,
            name="kernel",
        )(flat)
        return out
