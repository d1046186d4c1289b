"""On-device keypoint decoding — fixed-shape, fully jitted.

The reference decodes on host with OpenCV contours + scipy filters
(utils/localization_utils_v2.py). That path needs the full class
probabilities shipped to host every frame (~2.7 MB at 480x640). This module
decodes on-device and ships 14 floats per instrument side:

  * tips: gaussian(σ=4) smooth -> circular-footprint local maxima ∧ blob ->
    top-2 peaks by smoothed value (fixed-shape ``top_k``; matches the
    host contour-centroid decode whenever each tip is a single connected
    local-max blob, which is the operating regime after NMS)
  * base: class-pixel centroid gated by pixel count >= area_threshold
    (the host path uses the largest contour's moment centroid; identical
    when one blob dominates — the deviation is documented and the host
    path remains the exact-parity mode).

Output layout per side: [tip1_x, tip1_y, tip1_valid, tip2_x, tip2_y,
tip2_valid, base_x, base_y, base_valid].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mfcnet_tpu.ops.peaks import gaussian_blur, local_maxima


def decode_tips_device(heatmap, blob, max_peaks: int = 2):
    """Top-``max_peaks`` local maxima of the masked smoothed heatmap.

    heatmap, blob: (H, W) float / bool. Returns (max_peaks, 3) rows of
    (x, y, valid).
    """
    H, W = heatmap.shape
    masked = jnp.where(blob, heatmap, 0.0)
    sm = gaussian_blur(masked, 4.0)
    lm = local_maxima(sm) & blob
    vals = jnp.where(lm, sm, -jnp.inf).reshape(-1)
    top_vals, top_idx = jax.lax.top_k(vals, max_peaks)
    xs = (top_idx % W).astype(jnp.float32)
    ys = (top_idx // W).astype(jnp.float32)
    valid = jnp.isfinite(top_vals).astype(jnp.float32)
    return jnp.stack([xs, ys, valid], axis=-1)


def decode_base_device(class_mask, area_threshold: float = 10.0):
    """Pixel-centroid of a boolean class mask, gated by pixel count.

    Returns (3,) = (x, y, valid).
    """
    H, W = class_mask.shape
    m = class_mask.astype(jnp.float32)
    count = jnp.sum(m)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    cx = jnp.sum(m * xs) / jnp.maximum(count, 1.0)
    cy = jnp.sum(m * ys) / jnp.maximum(count, 1.0)
    valid = (count >= area_threshold).astype(jnp.float32)
    return jnp.stack([cx, cy, valid])


@functools.partial(jax.jit, static_argnums=(1,))
def decode_keypoints_device(probs, area_threshold_x10: int = 100):
    """Full per-frame decode on device.

    probs: (H, W, C>=5) class probabilities (toolpose layout:
    1=r-base, 2=r-tip, 3=l-base, 4=l-tip).

    Returns (2, 3, 3): [side (left, right)][tip1, tip2, base][x, y, valid].
    """
    area_threshold = area_threshold_x10 / 10.0
    pred = jnp.argmax(probs, axis=-1)
    out = []
    for base_cls, tip_cls in ((3, 4), (1, 2)):  # left, right
        tips = decode_tips_device(probs[..., tip_cls], pred == tip_cls)
        base = decode_base_device(pred == base_cls, area_threshold)
        out.append(jnp.concatenate([tips, base[None]], axis=0))
    return jnp.stack(out)
