"""Determinism helpers (ref sgtapose/utilities.py:168-179 set_random_seed:
python/numpy/torch seeds + cudnn.deterministic).

JAX is functional: determinism comes from explicit PRNG keys. This seeds the
host-side RNGs used by the data loader shuffle and any numpy-based tooling,
and returns the root jax key."""

from __future__ import annotations

import os
import random

import numpy as np


def set_random_seed(seed: int = 317):
    random.seed(seed)
    np.random.seed(seed)
    # NOTE: hash randomization for THIS interpreter is fixed at startup and
    # cannot be changed here; the env var only affects subprocesses we spawn.
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.PRNGKey(seed)
