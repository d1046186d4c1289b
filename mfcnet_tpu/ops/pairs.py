"""Frame-pair batching for the flow providers.

The reference pairs the window's newest frame with each of the T-1
previous frames (src/engine.py:39-53 for training, the half-res variant
test_multiframe_segmentation_on_videos_v3.py:264-271 for tracking). Every
batched provider in this repo flattens those pairs to one (B*(T-1), ...)
forward; the pairing correctness depends on all of them using the SAME
(b, i) flattening order — pair ``k*(T-1)+i`` is window ``k``, previous
frame ``i+1``. This module is the one definition of that order.
"""

from __future__ import annotations

import jax.numpy as jnp


def repeat_for_pairs(v, n: int):
    """Broadcast a per-window array to its ``n`` frame pairs.

    (B, ...) -> (B*n, ...), row ``k*n+i`` = input row ``k`` — matching the
    ``(B, n, ...) -> (B*n, ...)`` reshape used for the previous-frames
    axis, so ``repeat_for_pairs(newest, n)`` lines up elementwise with
    ``prevs.reshape((B*n,) + ...)``.
    """
    return jnp.repeat(v[:, None], n, axis=1).reshape(
        (v.shape[0] * n,) + v.shape[1:]
    )
