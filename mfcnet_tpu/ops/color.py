"""Color jitter ops matching ``torchvision.transforms.functional`` on float tensors.

The reference's train pipeline applies brightness → contrast → saturation
with factors ~U(0.95, 1.05) at p=0.5 (reference:
src/dataloader_multiframe.py:74-95). These run on-device here, batched over
frames, as part of the fused augmentation pipeline.

All ops expect float images in [0, 1], shape (..., H, W, 3) RGB, and clamp
their output to [0, 1] exactly like the torchvision tensor backend.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ITU-R 601-2 luma weights used by torchvision rgb_to_grayscale.
# (numpy, not jnp: a module-level jnp constant would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize on
# multi-host launches that import this transitively before bootstrap)
_LUMA = np.asarray([0.2989, 0.587, 0.114], dtype=np.float32)


def _blend(img1, img2, ratio):
    """torchvision _blend: ratio*img1 + (1-ratio)*img2, clamped to [0, 1]."""
    out = ratio * img1 + (1.0 - ratio) * img2
    return jnp.clip(out, 0.0, 1.0)


def adjust_brightness(img, factor):
    """img * factor, clamped. factor may be a scalar or broadcastable array."""
    return _blend(img, jnp.zeros_like(img), factor)


def _grayscale(img):
    """(..., H, W, 3) -> (..., H, W, 1) luma."""
    return jnp.sum(img * _LUMA, axis=-1, keepdims=True)


def adjust_contrast(img, factor):
    """Blend with the scalar mean of the grayscale image (per image).

    torchvision computes ``mean`` over H, W of the grayscale conversion of
    each image independently.
    """
    gray = _grayscale(img)
    mean = jnp.mean(gray, axis=(-3, -2), keepdims=True)
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    """Blend with the per-pixel grayscale image."""
    return _blend(img, _grayscale(img), factor)
