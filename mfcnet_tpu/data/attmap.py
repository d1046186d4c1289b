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
    (y + flow_y, x + flow_x) rounded, in-bounds only — matching the
    reference's integer scatter.
    """
    H, W = attmap.shape
    ys, xs = np.mgrid[:H, :W]
    ny = np.rint(ys + optflow[..., 1]).astype(np.int64)
    nx = np.rint(xs + optflow[..., 0]).astype(np.int64)
    valid = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
    out = np.zeros_like(attmap)
    out[ny[valid], nx[valid]] = attmap[ys[valid], xs[valid]]
    return ndimage.grey_dilation(out, size=(10, 10))


def cal_attmap_batched(attmaps, optflows):
    """jit-friendly backward-warp + max-pool dilation approximation.

    Scatter (forward warp) is expensive on TPU; the backward-warp of the
    *next* frame's sampling positions followed by a 10x10 max filter is the
    device-side equivalent used in the training pipeline (the subsequent
    dilation makes the two formulations nearly identical for the smooth
    probability maps involved; the NumPy path above is the exact-parity
    reference).
    """
    import jax.numpy as jnp
    from flax import linen as nn

    from mfcnet_tpu.ops.warp import flow_warp

    warped = flow_warp(attmaps[..., None], -optflows)[..., 0]
    # 10x10 grey dilation == max filter with a 10x10 footprint
    return nn.max_pool(
        warped[..., None], (10, 10), strides=(1, 1), padding="SAME"
    )[..., 0]
