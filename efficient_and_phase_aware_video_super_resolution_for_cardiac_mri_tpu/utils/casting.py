"""Dtype casting helpers shared by the runners' compute_dtype knob."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype`` (ints, bools
    and index arrays pass through untouched)."""
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree,
    )
