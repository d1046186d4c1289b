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
