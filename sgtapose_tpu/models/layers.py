"""Quantization-aware conv layer: a drop-in `nn.Conv` whose convolution can
execute as s8 x s8 -> s32 on the MXU (TPU v5e int8 throughput is 2x bf16),
selected at trace time by a context flag.

Design constraints (why this shape):
  * The param tree must stay byte-identical to `nn.Conv` so reference-converted
    and previously trained checkpoints load unchanged. We subclass `nn.Conv`
    under the SAME class name (Flax auto-names modules by class name, so
    `Conv_0`, `Conv_1`, ... are preserved) and override only the
    `conv_general_dilated` execution hook Flax exposes — param creation, bias
    add, padding canonicalization all remain Flax's.
  * Quantization is an inference-serving mode, not a training change: the
    stored weights stay bf16/f32 and are quantized inside the traced program
    (XLA hoists the loop-invariant weight quantization out of the detector's
    `lax.scan` over frames).
  * Mode selection is a Python-level context read at TRACE time: wrap the
    model's apply in `with quantized("int8"):` (see `quantized_apply`) so any
    (re)trace of that callable bakes the int8 path.

Numerics: symmetric per-output-channel weight scales (max-abs / 127) and a
dynamic symmetric per-tensor activation scale, accumulating in int32 and
rescaling to the input dtype. The reference has no quantized path — this is a
TPU-serving extension beyond parity (measured in docs/PERF.md).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

_MODE: dict = {"mode": None, "scales": None, "i": 0, "record": None,
               "min_ch": 0}


def quant_mode() -> Optional[str]:
    return _MODE["mode"]


@contextmanager
def quantized(mode: str = "int8", scales=None, min_ch: int = 0):
    """Enable quantized conv execution for code traced inside this context.

    "int8": real s8 x s8 -> s32 execution (serving; not differentiable).
      With `scales` (per-site activation max-abs list from `calibrate`), the
      activation scale is a TRACE-TIME CONSTANT — no per-conv max reduction,
      XLA fuses the quantize into the producer. Without scales, the scale is
      computed dynamically per tensor (slower: one extra full reduce per conv,
      measured 0.87x bf16 at 480p; static scales are the production mode).
    "int8_train": fake-quant — float conv on straight-through-quantized
      operands, same numerics as "int8" up to accumulator rounding, fully
      differentiable (QAT fine-tunes against serving-time quantization noise).
    "int8_calib": float execution that RECORDS each conv's activation max-abs
      (run the apply EAGERLY — un-jitted — so sites execute in call order);
      read the result from the returned list via `calibrate`.

    min_ch: quantize a site only when min(in_ch, out_ch) >= min_ch — small-
      channel convs are HBM-bandwidth-bound, where the extra quantize/
      dequantize elementwise passes cost more than the int8 MXU saving.
      Scale bookkeeping is threshold-INDEPENDENT: calibration records (and
      serving consumes) one scale per plain-conv site regardless of min_ch,
      so one calibration serves any threshold.
    """
    if mode not in ("int8", "int8_train", "int8_calib"):
        raise ValueError(f"unknown quantization mode {mode!r}")
    prev = dict(_MODE)
    _MODE.update(
        mode=mode, scales=scales, i=0, min_ch=min_ch,
        record=[] if mode == "int8_calib" else None,
    )
    try:
        yield _MODE
    finally:
        _MODE.update(prev)


def quantized_apply(apply_fn: Callable, mode: str = "int8", scales=None,
                    min_ch: int = 0) -> Callable:
    """Wrap an apply function so every trace of it runs under `quantized`.

    The per-site counter resets on every call, so a jitted wrapper whose body
    calls the model once consumes scales[0..n_sites-1] in call order — the
    same order `calibrate` recorded them."""

    def wrapped(*args, **kwargs):
        with quantized(mode, scales=scales, min_ch=min_ch):
            return apply_fn(*args, **kwargs)

    return wrapped


def calibrate(apply_fn: Callable, inputs_list) -> list:
    """Run `apply_fn(*inputs)` EAGERLY for each inputs tuple under
    "int8_calib", returning the per-site running-max activation |x| in call
    order — pass the list to quantized_apply(..., scales=...) for static-scale
    int8 serving. apply_fn must be the same callable (same conv call order)
    that will be served."""
    import numpy as _np

    maxes: list = []
    for inputs in inputs_list:
        with quantized("int8_calib") as st:
            apply_fn(*inputs)
            rec = st["record"]
        if not maxes:
            maxes = list(rec)
        else:
            if len(rec) != len(maxes):
                raise ValueError(
                    f"calibration call hit {len(rec)} conv sites, expected "
                    f"{len(maxes)} — apply_fn is not call-order stable"
                )
            maxes = [max(a, b) for a, b in zip(maxes, rec)]
    return [float(_np.asarray(m)) for m in maxes]


def _quantize_operands(lhs, rhs, dimension_numbers, a_max=None):
    """Shared int8 quantization math: per-out-channel weight scales, per-tensor
    activation scale (a_max: calibrated constant; None: dynamic max-reduce).
    Returns the quantized-VALUE tensors still in float32 (caller picks
    execution: cast to int8 for serving, rescale in float for fake-quant/QAT),
    the float operands, both scales, and the output-rescale closure."""
    rhs_spec = dimension_numbers.rhs_spec  # (out_c, in_c, *spatial)
    out_axis = rhs_spec[0]
    w = rhs.astype(jnp.float32)
    reduce_axes = tuple(a for a in range(w.ndim) if a != out_axis)
    w_scale = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True) / 127.0
    w_scale = jnp.maximum(lax.stop_gradient(w_scale), 1e-12)
    w_q = jnp.round(w / w_scale)

    x = lhs.astype(jnp.float32)
    if a_max is not None:
        a_scale = jnp.float32(max(a_max, 1e-12) / 127.0)
    else:
        a_scale = lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
        )
    x_q = jnp.clip(jnp.round(x / a_scale), -127, 127)

    out_spec = dimension_numbers.out_spec  # (batch, feature, *spatial)
    feat_axis = out_spec[1]

    def rescale(y):
        shape = [1] * y.ndim
        shape[feat_axis] = y.shape[feat_axis]
        return y * (w_scale.reshape(-1) * a_scale).reshape(shape)

    return x_q, w_q, x, w, a_scale, w_scale, rescale


def _int8_conv(lhs, rhs, strides, padding, *, lhs_dilation, rhs_dilation,
               dimension_numbers, feature_group_count, precision,
               fake: bool = False, a_max=None):
    """s8 x s8 -> s32 convolution.

    lhs: activations (promoted dtype, e.g. bf16); rhs: kernel.
    a_max: calibrated activation max-abs (python float) — makes the
    activation scale a trace-time constant; None computes it dynamically.
    fake=True (mode "int8_train"): float conv on straight-through-quantized
    operands — same quantization noise, differentiable for QAT.
    Falls back to the float conv for transposed (lhs-dilated) or grouped
    forms, which are bandwidth-bound and not worth quantizing.
    """
    if feature_group_count != 1 or any(d != 1 for d in lhs_dilation):
        return lax.conv_general_dilated(
            lhs, rhs, strides, padding, lhs_dilation=lhs_dilation,
            rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count, precision=precision)

    out_dtype = lhs.dtype
    x_q, w_q, x, w, a_scale, w_scale, rescale = _quantize_operands(
        lhs, rhs, dimension_numbers, a_max=a_max)

    if fake:
        # straight-through: forward sees the dequantized values, backward
        # flows as if no rounding happened
        x_fq = x + lax.stop_gradient(x_q * a_scale - x)
        w_fq = w + lax.stop_gradient(w_q * w_scale - w)
        y = lax.conv_general_dilated(
            x_fq, w_fq, strides, padding, lhs_dilation=lhs_dilation,
            rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count)
        return y.astype(out_dtype)

    y = lax.conv_general_dilated(
        x_q.astype(jnp.int8), w_q.astype(jnp.int8), strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    return rescale(y.astype(jnp.float32)).astype(out_dtype)


def _dispatching_conv(lhs, rhs, strides, padding, **kw):
    mode = _MODE["mode"]
    # quantization-eligible = plain (non-grouped, non-transposed) conv; the
    # calib recorder and the scale consumer MUST use the same predicate so
    # calibrated scales line up site-for-site with serving
    eligible = kw["feature_group_count"] == 1 and not any(
        d != 1 for d in kw["lhs_dilation"]
    )
    if mode == "int8_calib" and eligible:
        # record this site's activation max (caller runs eagerly, so this is
        # a concrete value appended in call order), execute in float.
        # EVERY plain site is recorded, independent of min_ch (see quantized)
        _MODE["record"].append(jnp.max(jnp.abs(lhs.astype(jnp.float32))))
        return lax.conv_general_dilated(lhs, rhs, strides, padding, **kw)
    if mode in ("int8", "int8_train") and eligible:
        # min_ch gate: skip bandwidth-bound small-channel sites (the
        # quantize/dequantize passes outweigh the int8 MXU saving there)
        rhs_spec = kw["dimension_numbers"].rhs_spec
        big = min(rhs.shape[rhs_spec[0]], rhs.shape[rhs_spec[1]]
                  ) >= _MODE["min_ch"]
        a_max = None
        if mode == "int8" and _MODE["scales"] is not None:
            # consume one scale per plain site even when gated, so one
            # calibration serves any min_ch
            a_max = float(_MODE["scales"][_MODE["i"]])
            _MODE["i"] += 1
        if big:
            return _int8_conv(lhs, rhs, strides, padding, a_max=a_max,
                              fake=(mode == "int8_train"), **kw)
    return lax.conv_general_dilated(lhs, rhs, strides, padding, **kw)


class Conv(nn.Conv):
    """`nn.Conv` whose execution switches to int8 under `quantized()`.

    Identical param tree and auto-naming to `nn.Conv` (same class name).
    Sites that must stay full precision (offset/head output convs) simply
    keep using `nn.Conv`.
    """

    conv_general_dilated: Optional[Callable[..., Any]] = _dispatching_conv
