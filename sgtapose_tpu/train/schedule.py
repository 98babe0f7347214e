"""LR schedule: 3000-iter linear warmup + poly(1.0) decay to max_iters
(ref lib/trainer_parallel.py:219-231 adapt_lr)."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_poly_schedule(
    base_lr: float,
    max_iters: int,
    warmup_iters: int = 3000,
    warmup_ratio: float = 1e-6,
    power: float = 1.0,
):
    """Returns an optax-compatible schedule fn step -> lr.

    Reference semantics: during the first `warmup_iters` steps of epoch 1,
    lr = base * (1 - (1 - step/warmup)(1 - warmup_ratio)); afterwards
    lr = base * (1 - (step - 1)/max_iters) ** power.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # warmup_iters == 0 means "no warmup": take the poly branch from
        # step 0 (the ramp would otherwise 0/0-NaN at step 0, and even a
        # guarded ramp would spend step 0 at base_lr*warmup_ratio)
        k = (1.0 - step / max(warmup_iters, 1)) * (1.0 - warmup_ratio)
        warm = base_lr * (1.0 - k)
        poly = base_lr * jnp.maximum(
            1.0 - (step - 1.0) / max_iters, 0.0
        ) ** power
        if warmup_iters <= 0:
            return poly
        return jnp.where(step <= warmup_iters, warm, poly)

    return schedule
