"""Mixed precision helpers.

TPU-native policy: bfloat16 activations + params on the conv/attention path
(MXU native dtype), float32 for the decode/geometry numerics. Flax modules
infer computation dtype from inputs+params, so casting the variable tree and
the inputs is sufficient — no model-code changes.

Training keeps float32 master params (the optimizer state must not round);
bf16 training support = cast params in the forward only (see
trainer docstring for the planned loss-scale-free bf16 recipe).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating leaves to dtype; ints/bools untouched."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def bf16_inference_variables(variables):
    return cast_floating(variables, jnp.bfloat16)
