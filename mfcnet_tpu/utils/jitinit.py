"""Jit-wrapped module init.

Eager (unjitted) flax ``init`` executes one XLA program per op; on hosts
with slow per-op compiles a 30-conv model takes minutes. Jitting init
compiles the whole initialization as one program.
"""

from __future__ import annotations

import functools

import jax


def jit_init(model, rngs, *args, **kwargs):
    """model.init under jit (static kwargs must be hashable)."""
    fn = functools.partial(model.init, **kwargs)
    return jax.jit(fn)(rngs, *args)


def cast_floats(tree, dtype):
    """Cast every floating-point leaf to ``dtype`` (ints/bools untouched).

    The one compute-dtype policy shared by the live InferenceEngine and
    the serving exports — keeping it in one place keeps the pinned
    artifact-vs-live parity honest if the policy ever changes."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )
