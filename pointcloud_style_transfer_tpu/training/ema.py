"""Exponential moving average of a parameter pytree.

The reference maintains per-tensor shadow copies with in-place lerp and
apply/restore swapping (reference: utils/ema.py:7-150). In JAX this collapses
to a one-line tree_map; "apply shadow" is simply evaluating with the EMA
pytree, so no swap/restore machinery is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    """Shadow = a DISTINCT copy of params (reference: utils/ema.py:30-40).
    Must not alias the param buffers: the train step donates its state, and
    aliased leaves would be donated twice."""
    return jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)


def ema_update(ema_params, params, decay: float = 0.999):
    """shadow = decay * shadow + (1 - decay) * param
    (reference: utils/ema.py:52)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
