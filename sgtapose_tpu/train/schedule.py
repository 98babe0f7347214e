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


def step_decay_schedule(
    base_lr: float,
    lr_step_epochs,
    iters_per_epoch: int,
    gamma: float = 0.1,
):
    """CenterTrack-style epoch step decay: lr = base * gamma^(#milestones
    passed). The reference applies this both at the epoch boundary and when
    RESUMING a run (ref lib/model/model.py:87-99 re-derives start_lr as
    `opt.lr * 0.1` per lr_step <= start_epoch; flag at lib/opts_parallel.py
    --lr_step). Here the schedule is a pure function of the optimizer step,
    so a resumed TrainState (which carries its step) replays the decay
    automatically — same semantics, no stateful restore needed.
    """
    milestones = sorted(int(e) for e in lr_step_epochs)

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / max(iters_per_epoch, 1)
        n = jnp.zeros((), jnp.float32)
        for m in milestones:
            n = n + (epoch >= m).astype(jnp.float32)
        return base_lr * gamma ** n

    return schedule
