"""Image rotation matching ``torchvision.transforms.functional.rotate``.

The reference's train transform rotates frames, masks, and depth maps by the
same random angle in [-15, 15) with the torchvision default interpolation
(NEAREST) and zero fill (reference: src/dataloader_multiframe.py:57-72).

torchvision (tensor backend) rotates around the exact image center by
building an inverse-rotation affine grid over pixel-center coordinates and
sampling with ``grid_sample(align_corners=False)``. Net mapping for output
pixel center p (relative to center c = ((W-1)/2, (H-1)/2)):

    src = R(-angle) @ (p - c) + c        # inverse map, angle CCW-positive

with nearest rounding via round-half-to-even (C ``nearbyint``), which is
exactly ``jnp.round``. Out-of-bounds samples fill with 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate_nearest(img, angle_deg):
    """Rotate (..., H, W, C) by ``angle_deg`` (scalar, CCW-positive), nearest.

    ``angle_deg`` may be a traced scalar (the augmentation pipeline draws it
    from jax.random each step).
    """
    H, W = img.shape[-3], img.shape[-2]
    theta = jnp.deg2rad(jnp.asarray(angle_deg, dtype=jnp.float32))
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] - cy  # (H, 1)
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] - cx  # (1, W)

    # Inverse rotation: for torchvision rotate(angle) (CCW in image coords
    # with y pointing down this is visually... torchvision's convention),
    # the source coords are R(angle) applied with the matrix below; verified
    # against torch in tests/test_ops.py.
    src_x = cos * xx + sin * yy + cx
    src_y = -sin * xx + cos * yy + cy

    ix = jnp.round(src_x).astype(jnp.int32)
    iy = jnp.round(src_y).astype(jnp.int32)
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)

    flat = img.reshape(*img.shape[:-3], H * W, img.shape[-1])
    idx = (iyc * W + ixc).reshape(-1)
    out = jnp.take(flat, idx, axis=-2).reshape(img.shape)
    return out * valid[..., None].astype(img.dtype)
