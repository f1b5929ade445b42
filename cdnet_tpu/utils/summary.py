"""Model summaries (the reference ships hhl_utils/torchsummary.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def model_summary(model, input_shape=(1, 256, 256, 3), depth: int = 2) -> str:
    """Tabulated module/param summary (flax tabulate; torchsummary parity)."""
    import flax.linen as nn
    return nn.tabulate(
        model, jax.random.PRNGKey(0), depth=depth,
        compute_flops=False, compute_vjp_flops=False,
    )(jnp.zeros(input_shape, jnp.float32), train=False)


def count_params(variables) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
