"""TAPNet motion-prior attention maps (reference: src/dataloader.py:20-76).

``cal_attmap`` forward-warps the previous frame's attention map along the
optical flow and applies a 10x10 grey dilation — the motion prior fed into
TAPNet's attention modules. The reference computes this per sample in
dataloader workers (cal_attmap_np, src/dataloader.py:56-76); provided here
both as the NumPy reference and as a batched jit version built on the
shared warp op.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def cal_attmap_np(attmap: np.ndarray, optflow: np.ndarray) -> np.ndarray:
    """Forward-warp ``attmap`` (H, W) by ``optflow`` (H, W, 2) then grey
    dilation with a 10x10 structuring element.

    Forward warping: each source pixel (y, x) pushes its value to
    (y + flow_y, x + flow_x) rounded, with target coordinates CLIPPED to
    the image border (np.clip in the reference, src/dataloader.py:69-70)
    — off-screen flow therefore writes to edge pixels, and on collisions
    the last source pixel in row-major order wins, exactly as the
    reference's fancy-indexed assignment.
    """
    H, W = attmap.shape
    ys, xs = np.mgrid[:H, :W]
    ny = np.clip(np.rint(ys + optflow[..., 1]).astype(np.int64), 0, H - 1)
    nx = np.clip(np.rint(xs + optflow[..., 0]).astype(np.int64), 0, W - 1)
    out = np.zeros_like(attmap)
    out[ny.ravel(), nx.ravel()] = attmap[ys.ravel(), xs.ravel()]
    return ndimage.grey_dilation(out, size=(10, 10))


def cal_attmap_batched(attmaps, optflows):
    """jit-friendly backward-warp + max-pool dilation approximation.

    Scatter (forward warp) is expensive on TPU; the backward-warp of the
    *next* frame's sampling positions followed by a 10x10 max filter is the
    device-side equivalent used in the training pipeline (the subsequent
    dilation makes the two formulations nearly identical for the smooth
    probability maps involved; the NumPy path above is the exact-parity
    reference, :func:`cal_attmap_scatter` the exact device one).
    """
    import jax.numpy as jnp
    from flax import linen as nn

    from mfcnet_tpu.ops.warp import flow_warp

    warped = flow_warp(attmaps[..., None], -optflows,
                       banded=False)[..., 0]  # host/CPU data path
    # 10x10 grey dilation == max filter with a 10x10 footprint
    return nn.max_pool(
        warped[..., None], (10, 10), strides=(1, 1), padding="SAME"
    )[..., 0]


def cal_attmap_scatter(attmaps, optflows):
    """EXACT device forward-warp: bit-parity with :func:`cal_attmap_np`.

    The reference's integer scatter (src/dataloader.py:56-76) clips the
    target coordinates to the border (np.clip :69-70) and assigns
    ``out[ny, nx] = att[y, x]`` in row-major order, so on collisions the
    LAST source pixel wins. On device: every source proposes its
    row-major linear index to its (clipped) target; a ``segment_max``
    picks the winning (largest) source per target, then a gather reads
    the value — deterministic, vectorized, O(n). The 10x10 grey dilation
    uses scipy's even-size footprint (window [i-4, i+5], pad (4, 5)).

    attmaps: (B, H, W); optflows: (B, H, W, 2) with (dx, dy) channels.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    B, H, W = attmaps.shape
    n = H * W
    ys, xs = jnp.mgrid[:H, :W]

    def one(att, flow):
        ny = jnp.clip(
            jnp.rint(ys + flow[..., 1]).astype(jnp.int32), 0, H - 1
        )
        nx = jnp.clip(
            jnp.rint(xs + flow[..., 0]).astype(jnp.int32), 0, W - 1
        )
        tgt = (ny * W + nx).reshape(-1)
        src = jnp.arange(n, dtype=jnp.int32)
        win = jax.ops.segment_max(
            src, tgt, num_segments=n, indices_are_sorted=False
        )
        has = win >= 0  # segment_max fills empty segments with int32 min
        out = jnp.where(
            has, att.reshape(-1)[jnp.clip(win, 0, n - 1)], 0.0
        ).reshape(H, W)
        # grey dilation, scipy footprint for even size 10: window
        # [i-4, i+5] -> pad (4, 5)
        neg = jnp.finfo(out.dtype).min
        return lax.reduce_window(
            out, neg, lax.max, (10, 10), (1, 1),
            ((4, 5), (4, 5)),
        )

    return jax.vmap(one)(attmaps, optflows)
