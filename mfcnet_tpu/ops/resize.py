"""Image resize with exact ``torch.nn.functional.interpolate`` semantics.

The reference pipeline resizes with torchvision ``transforms.Resize``
(bilinear for images, nearest for masks/depth — reference:
src/dataloader_multiframe.py:42-55) and with ``F.interpolate`` inside models
(``align_corners`` both True and False). Numerical parity with those rules is
required by the 1e-3 heatmap budget, so we implement them directly instead of
relying on ``jax.image.resize``.

TPU-first design: bilinear resize is expressed as two small matmuls against
precomputed interpolation matrices (``out = Wh @ img @ Ww^T`` per channel),
which lands on the MXU and is both exact and fast. Nearest resize is a
gather of rows/columns.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-interpolation matrix, float32.

    Coordinate rules (PyTorch):
      align_corners=False: src = (dst + 0.5) * in/out - 0.5, clamped to >= 0
      align_corners=True : src = dst * (in-1)/(out-1)
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        w[:, 0] = 1.0
        return w.astype(np.float32)
    # torch CPU computes source coordinates in float32 (scalar_t); match it
    # exactly so interpolation weights agree bit-for-bit.
    dst = np.arange(out_size, dtype=np.float32)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float32)
        else:
            scale = np.float32(in_size - 1) / np.float32(out_size - 1)
            src = dst * scale
    else:
        scale = np.float32(in_size) / np.float32(out_size)
        src = (dst + np.float32(0.5)) * scale - np.float32(0.5)
        # torch clamps the *source coordinate* at 0 (upper end handled by
        # index clamping below, lambda becomes 0 there).
        src = np.maximum(src, np.float32(0.0))
    src = src.astype(np.float64)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    frac = np.clip(frac, 0.0, 1.0)
    rows = np.arange(out_size)
    w[rows, lo] += 1.0 - frac
    w[rows, hi] += frac
    return w.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """Source index per output position under torch 'nearest' rules.

    torch nearest (used by ``InterpolationMode.NEAREST`` and
    ``F.interpolate(mode='nearest')``): src = floor(dst * in/out).
    """
    dst = np.arange(out_size, dtype=np.float64)
    src = np.floor(dst * (in_size / out_size)).astype(np.int64)
    return np.clip(src, 0, in_size - 1)


def resize_bilinear(img, out_h: int, out_w: int, align_corners: bool = False):
    """Bilinear resize on the (-3, -2) axes of an NHWC-like array.

    Matches ``F.interpolate(x, size, mode='bilinear', align_corners=...)``
    with antialias off (the reference's torchvision Resize runs on tensors
    where antialias defaults to False).
    """
    in_h, in_w = img.shape[-3], img.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return img
    dtype = img.dtype
    wh = jnp.asarray(_bilinear_matrix(in_h, out_h, align_corners))
    ww = jnp.asarray(_bilinear_matrix(in_w, out_w, align_corners))
    x = img.astype(jnp.float32)
    # rows: (..., H, W, C) -> (..., out_h, W, C)
    x = jnp.einsum("oh,...hwc->...owc", wh, x, precision="highest")
    # cols: -> (..., out_h, out_w, C)
    x = jnp.einsum("ow,...hwc->...hoc", ww, x, precision="highest")
    return x.astype(dtype)


def resize_nearest(img, out_h: int, out_w: int):
    """Nearest-neighbour resize on the (-3, -2) axes (torch rounding rules)."""
    in_h, in_w = img.shape[-3], img.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return img
    rows = jnp.asarray(_nearest_index(in_h, out_h))
    cols = jnp.asarray(_nearest_index(in_w, out_w))
    x = jnp.take(img, rows, axis=-3)
    x = jnp.take(x, cols, axis=-2)
    return x


def upsample_bilinear_2x(img, align_corners: bool = False):
    """2x bilinear upsample, the decoder hot path (TAPNet/UNet decoders)."""
    return resize_bilinear(
        img, img.shape[-3] * 2, img.shape[-2] * 2, align_corners=align_corners
    )
