"""On-device peak finding + sub-pixel decode.

The reference's largest per-frame inference bottleneck is a GPU->CPU bounce:
heatmaps come back to the host, scipy blurs them, python loops find local
maxima and window-average each peak (ref sgtapose/image_proc.py:1032-1143
peaks_from_belief_maps; lib/model/utils.py:207-284 _peaks_info;
lib/model/decode.py:184-234 dream_generic_decode). Here the whole pipeline is
one jitted, vmapped XLA program with static shapes.

Reference semantics reproduced:
  * gaussian blur sigma=3 (scipy gaussian_filter default truncate=4.0 ->
    radius 12, 'reflect' boundary == jnp.pad mode='symmetric')
  * 4-neighbor local-max with zero-padded shifts, threshold 0.01 on the
    BLURRED map
  * 5x5 weighted average around each peak on the ORIGINAL map (out-of-bounds
    taps excluded), + 0.4395 offset_due_to_upsampling
  * per-class decision rule: 1 peak -> keep; >=2 peaks -> keep the best only
    if its ORIGINAL-map score beats the runner-up by >= 0.25, else report the
    -999.999 sentinel; 0 peaks -> sentinel
  * sub-pixel final coordinate = int(peak) + reg gathered at that pixel
    (dream_generic_decode's cts_wreg)

Documented deviation (now switchable): the reference sorts competing peaks by
their sub-pixel y coordinate (`key=lambda x: x[1]` — index 1 is y_avg; upstream
DREAM sorts by score, and the comment says "Try to use the belief map scores").
The default `ref_sort="score"` sorts by score, the evident intent;
`ref_sort="y"` reproduces the reference's exact (buggy) y-descending order for
checkpoint-parity evaluation (lib/model/utils.py:226-229).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

SENTINEL = -999.999


class DecodedKeypoints(NamedTuple):
    coords: jnp.ndarray  # (C, 2) float sub-pixel (x, y); sentinel if missing
    coords_int: jnp.ndarray  # (C, 2) int32 peak pixel (0,0 if missing)
    scores: jnp.ndarray  # (C,) original-map peak score; -1 if missing
    tracking: jnp.ndarray  # (C, 2) tracking offsets at the peaks
    valid: jnp.ndarray  # (C,) bool


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(hm: jnp.ndarray, sigma: float = 3.0, truncate: float = 4.0) -> jnp.ndarray:
    """Separable gaussian blur of (H, W, C), scipy.ndimage-compatible
    (reflect/symmetric boundary)."""
    radius = int(truncate * sigma + 0.5)
    k = _gaussian_kernel1d(sigma, radius)
    H, W, C = hm.shape
    x = jnp.pad(hm, ((radius, radius), (0, 0), (0, 0)), mode="symmetric")
    x = jnp.moveaxis(x, -1, 0)  # (C, H+2r, W)
    kv = k[:, None, None, None]  # (kh, kw=1, in=1, out=1)
    x = jax.lax.conv_general_dilated(
        x[..., None],
        kv,
        (1, 1),
        [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jnp.moveaxis(x[..., 0], 0, -1)  # (H, W, C)
    x = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode="symmetric")
    x = jnp.moveaxis(x, -1, 0)
    kh = k[None, :, None, None]
    x = jax.lax.conv_general_dilated(
        x[..., None],
        kh,
        (1, 1),
        [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.moveaxis(x[..., 0], 0, -1)


def _local_max_mask(blurred: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """4-neighbor local maxima of (H, W, C); neighbors beyond the border are
    zero (the reference compares against zero-filled shifted copies)."""
    z = jnp.zeros_like(blurred[:1])
    up = jnp.concatenate([z, blurred[:-1]], axis=0)  # map shifted down
    down = jnp.concatenate([blurred[1:], z], axis=0)
    zc = jnp.zeros_like(blurred[:, :1])
    left = jnp.concatenate([zc, blurred[:, :-1]], axis=1)
    right = jnp.concatenate([blurred[:, 1:], zc], axis=1)
    return (
        (blurred >= up)
        & (blurred >= down)
        & (blurred >= left)
        & (blurred >= right)
        & (blurred > thresh)
    )


def _subpixel_refine(map_ori: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray, offset: float):
    """5x5 weighted average around integer peak (px, py) on the original map.
    map_ori: (H, W); px, py: () int32. Returns (x, y) float."""
    H, W = map_ori.shape
    ran = 2
    d = jnp.arange(-ran, ran + 1)
    dy = d[:, None]
    dx = d[None, :]
    yy = py + dy  # (5,5)
    xx = px + dx
    inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
    yc = jnp.clip(yy, 0, H - 1)
    xc = jnp.clip(xx, 0, W - 1)
    w = map_ori[yc, xc] * inb.astype(map_ori.dtype)
    total = jnp.sum(w)
    x_avg = jnp.sum(w * xx.astype(jnp.float32)) / jnp.where(total > 0, total, 1.0)
    y_avg = jnp.sum(w * yy.astype(jnp.float32)) / jnp.where(total > 0, total, 1.0)
    # all-zero weights -> fall back to the integer peak (reference's except)
    x_avg = jnp.where(total > 0, x_avg, px.astype(jnp.float32))
    y_avg = jnp.where(total > 0, y_avg, py.astype(jnp.float32))
    return x_avg + offset, y_avg + offset


def _logquad_delta(f_m, f_0, f_p):
    """1-D sub-pixel offset by log-parabola fit through (peak-1, peak, peak+1).
    Exact for a sampled gaussian (the GT belief maps ARE gaussians, and the
    sigma=3 pre-blur keeps them gaussian), unlike the windowed average whose
    truncation bias DREAM patches with the empirical +0.4395 offset."""
    eps = 1e-12
    lm, l0, lp = (jnp.log(jnp.maximum(v, eps)) for v in (f_m, f_0, f_p))
    denom = 2.0 * l0 - lm - lp
    delta = jnp.where(jnp.abs(denom) > eps, (lp - lm) / (2.0 * denom), 0.0)
    return jnp.clip(delta, -0.5, 0.5)


def _logquad_refine(blurred_c: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Separable log-parabola sub-pixel peak on one class's BLURRED map.
    blurred_c: (H, W); px, py: () int32 integer peak. Returns (x, y) float."""
    H, W = blurred_c.shape
    xm = jnp.clip(px - 1, 0, W - 1)
    xp = jnp.clip(px + 1, 0, W - 1)
    ym = jnp.clip(py - 1, 0, H - 1)
    yp = jnp.clip(py + 1, 0, H - 1)
    dx = _logquad_delta(blurred_c[py, xm], blurred_c[py, px], blurred_c[py, xp])
    dy = _logquad_delta(blurred_c[ym, px], blurred_c[py, px], blurred_c[yp, px])
    # border peaks (clamped neighbor == center) fall back to the integer peak
    dx = jnp.where((px > 0) & (px < W - 1), dx, 0.0)
    dy = jnp.where((py > 0) & (py < H - 1), dy, 0.0)
    return px.astype(jnp.float32) + dx, py.astype(jnp.float32) + dy


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_peaks", "peak_thresh", "ambiguity_gap", "peak_offset", "sigma",
        "use_reg", "ref_sort", "coord_mode",
    ),
)
def decode_heatmaps(
    hm: jnp.ndarray,
    reg: jnp.ndarray,
    tracking: jnp.ndarray,
    max_peaks: int = 8,
    peak_thresh: float = 0.01,
    ambiguity_gap: float = 0.25,
    peak_offset: float = 0.4395,
    sigma: float = 3.0,
    use_reg: bool = True,
    ref_sort: str = "score",
    coord_mode: str = "reg",
) -> DecodedKeypoints:
    """Decode one frame's outputs. hm: (H, W, C) AFTER sigmoid;
    reg/tracking: (H, W, 2). use_reg=False returns the weighted-average
    sub-pixel peak directly (the DREAM baseline decode, which has no reg
    head — ref image_proc.py:1032-1143 used standalone).
    ref_sort: "score" (intent) or "y" (reference parity; see module doc).
    coord_mode — final sub-pixel coordinate estimator (measured A/B in
    docs/PERF.md; all peak SELECTION logic is identical across modes):
      "reg"     int(refined) + reg head (reference cts_wreg parity; default)
      "avg"     the 5x5 weighted average + 0.4395 (DREAM decode)
      "logquad" log-parabola fit on the blurred map (exact for gaussians)
      "mean"    average of "reg" and "logquad"
    """
    H, W, C = hm.shape
    blurred = gaussian_blur(hm, sigma)
    mask = _local_max_mask(blurred, peak_thresh)

    # top-k candidate peaks per class by blurred value
    flat_blur = jnp.where(mask, blurred, -jnp.inf).transpose(2, 0, 1).reshape(C, H * W)
    cand_val, cand_idx = jax.lax.top_k(flat_blur, max_peaks)  # (C, P)
    cand_valid = jnp.isfinite(cand_val)
    n_peaks = jnp.sum(cand_valid, axis=1)  # (C,)

    px = (cand_idx % W).astype(jnp.int32)
    py = (cand_idx // W).astype(jnp.int32)

    # original-map scores at candidate peaks
    hm_cf = hm.transpose(2, 0, 1)  # (C, H, W)
    scores = jnp.take_along_axis(
        hm_cf.reshape(C, H * W), cand_idx, axis=1
    )  # (C, P)
    scores = jnp.where(cand_valid, scores, -jnp.inf)

    # sub-pixel refine every candidate (cheap: P<=8 per class); needed up
    # front because ref_sort="y" orders by the REFINED y coordinate
    sxs, sys_ = jax.vmap(
        jax.vmap(_subpixel_refine, in_axes=(None, 0, 0, None)),
        in_axes=(0, 0, 0, None),
    )(hm_cf, px, py, peak_offset)  # (C, P) each

    if ref_sort == "y":
        # reference: sorted(peak, key=lambda x: x[1], reverse=True) — peaks
        # ordered by sub-pixel y descending; the >=0.25 score gap is then
        # checked between the first two in THAT order. Static-shape caveat:
        # the reference y-sorts ALL local maxima above peak_thresh, we rank
        # within the top `max_peaks` candidates by blurred value — parity
        # holds whenever a class has <= max_peaks maxima (raise
        # InferConfig.max_peaks for pathologically multi-modal heatmaps)
        sort_key = jnp.where(cand_valid, sys_, -jnp.inf)
    else:
        sort_key = scores
    order = jnp.argsort(-sort_key, axis=1)
    best = order[:, 0]
    take = lambda a, i: jnp.take_along_axis(a, i[:, None], axis=1)[:, 0]
    best_score = take(scores, best)
    if max_peaks > 1:
        second_score = take(scores, order[:, 1])
        unambiguous = best_score - second_score >= ambiguity_gap
    else:
        # a 1-peak budget can never observe a competitor
        unambiguous = jnp.ones_like(best_score, dtype=bool)

    accept = (n_peaks == 1) | ((n_peaks > 1) & unambiguous)

    sx = take(sxs, best)
    sy = take(sys_, best)
    # integer coords the reference gathers reg at: int() of the refined value
    ix = jnp.trunc(sx).astype(jnp.int32)
    iy = jnp.trunc(sy).astype(jnp.int32)
    ix = jnp.where(accept, jnp.clip(ix, 0, W - 1), 0)
    iy = jnp.where(accept, jnp.clip(iy, 0, H - 1), 0)

    out_score = jnp.where(accept, jnp.take_along_axis(
        hm_cf.reshape(C, H * W), (iy * W + ix)[:, None], axis=1)[:, 0], -1.0)

    reg_at = reg[iy, ix]  # (C, 2)
    trk_at = tracking[iy, ix]
    if coord_mode not in ("reg", "avg", "logquad", "mean"):
        raise ValueError(f"unknown coord_mode {coord_mode!r}")
    if not use_reg:
        # no reg head (DREAM baselines): reg-dependent modes fall back to the
        # DREAM windowed average; the heatmap-only "logquad" stays available
        coord_mode = "logquad" if coord_mode == "logquad" else "avg"
    if coord_mode in ("logquad", "mean"):
        blurred_cf = blurred.transpose(2, 0, 1)  # (C, H, W)
        bx = take(px, best)
        by = take(py, best)
        qx, qy = jax.vmap(_logquad_refine)(blurred_cf, bx, by)  # (C,) each
    if coord_mode == "avg":
        coords = jnp.stack([sx, sy], axis=1)
    elif coord_mode == "logquad":
        coords = jnp.stack([qx, qy], axis=1)
    else:
        reg_coords = jnp.stack(
            [ix.astype(jnp.float32) + reg_at[:, 0], iy.astype(jnp.float32) + reg_at[:, 1]],
            axis=1,
        )
        # coord_mode validated above: "mean" or "reg" here
        coords = (0.5 * (reg_coords + jnp.stack([qx, qy], axis=1))
                  if coord_mode == "mean" else reg_coords)
    coords = jnp.where(accept[:, None], coords, SENTINEL)
    coords_int = jnp.stack([ix, iy], axis=1)
    return DecodedKeypoints(
        coords=coords,
        coords_int=coords_int,
        scores=out_score,
        tracking=trk_at,
        valid=accept,
    )


def decode_heatmaps_batch(hm, reg, tracking, **kwargs) -> DecodedKeypoints:
    """Batched decode: vmap over the array args, decode settings (max_peaks,
    ref_sort, coord_mode, thresholds, ...) pass through to decode_heatmaps."""
    fn = functools.partial(decode_heatmaps, **kwargs)
    return jax.vmap(fn, in_axes=(0, 0, 0), out_axes=0)(hm, reg, tracking)
