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


def connected_components(mask, connectivity: int = 8):
    """Connected-component labels by iterative min-label propagation with
    pointer jumping (O(log diameter) sweeps, all elementwise/gather —
    TPU-friendly, no data-dependent shapes).

    mask: (H, W) bool. Returns (H, W) int32: each foreground pixel gets its
    component's minimum flat index; background pixels get H*W.
    """
    H, W = mask.shape
    n = H * W
    big = jnp.int32(n)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
    lab = jnp.where(mask, idx, big)

    def neighbor_min(l):
        p = jnp.pad(l, 1, constant_values=n)
        m = jnp.minimum(
            jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
            jnp.minimum(p[1:-1, :-2], p[1:-1, 2:]),
        )
        if connectivity == 8:
            m = jnp.minimum(
                m,
                jnp.minimum(
                    jnp.minimum(p[:-2, :-2], p[:-2, 2:]),
                    jnp.minimum(p[2:, :-2], p[2:, 2:]),
                ),
            )
        return jnp.where(mask, jnp.minimum(l, m), big)

    def hop(l):
        # pointer jumping: follow each pixel's label to that pixel's label
        flat = jnp.concatenate(
            [l.reshape(-1), jnp.array([big], jnp.int32)]
        )
        return jnp.where(mask, flat[l], big)

    def body(state):
        l, _ = state
        l2 = hop(hop(neighbor_min(l)))
        return l2, jnp.any(l2 != l)

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True)))
    return lab


def fill_holes(mask):
    """Fill interior holes: background pixels (4-connected, matching the
    duality of 8-connected foreground) not reachable from the image border
    become foreground. This makes per-component pixel counts track
    cv2.contourArea of the OUTER contour (RETR_EXTERNAL), which is the
    filled polygon area the host ranks blobs by."""
    H, W = mask.shape
    n = H * W
    bg = ~mask
    lab_bg = connected_components(bg, connectivity=4)
    border = jnp.concatenate(
        [lab_bg[0], lab_bg[-1], lab_bg[:, 0], lab_bg[:, -1]]
    )
    border_reach = jnp.zeros(n + 1, bool).at[border].set(True)
    holes = bg & ~border_reach[lab_bg]
    return mask | holes


def decode_base_device(class_mask, area_threshold: float = 10.0):
    """LARGEST-component centroid gated by area — the host semantics
    (track/decode.py calc_base_centroid; reference
    test_multiframe_segmentation_on_videos_v3.py:45-59), on device.

    Matching the OpenCV path: cv2 ranks RETR_EXTERNAL contours by polygon
    area of the OUTER boundary (holes filled) and takes the polygon-moment
    centroid. Here: holes are filled on device, components ranked by
    filled pixel count, centroid over the filled component. Residual
    envelope vs cv2: pixel count vs polygon area differ by ~perimeter/2
    (can flip selection only between near-equal-area blobs) and the
    centroid by <~1 px (cv2 also truncates to int). Pinned by
    tests/test_decode_device.py multi-blob and ragged-mask cases.

    Returns (3,) = (x, y, valid).
    """
    H, W = class_mask.shape
    n = H * W
    filled = fill_holes(class_mask)
    lab = connected_components(filled).reshape(-1)
    ones = filled.reshape(-1).astype(jnp.float32)
    # per-component pixel counts, indexed by the component's root pixel
    counts = jax.ops.segment_sum(ones, lab, num_segments=n + 1)
    counts = counts.at[n].set(0.0)  # background bucket
    # rank by cv2.contourArea's polygon area: Pick's theorem gives
    # area ~= pixels - boundary/2, where boundary pixels have a 4-neighbor
    # outside the (filled) component
    fp = jnp.pad(filled, 1)
    interior4 = (
        fp[:-2, 1:-1] & fp[2:, 1:-1] & fp[1:-1, :-2] & fp[1:-1, 2:]
    ) & filled
    bnd = (filled & ~interior4).reshape(-1).astype(jnp.float32)
    bnd_counts = jax.ops.segment_sum(bnd, lab, num_segments=n + 1)
    scores = counts - 0.5 * bnd_counts
    scores = scores.at[n].set(0.0)
    root = jnp.argmax(scores)
    # centroid approximates cv2's polygon moments: interior pixels weight
    # 1, boundary pixels 1/2 (Green's-theorem discretization) — halves the
    # worst-case divergence on ragged blobs vs the plain pixel centroid
    w = jnp.where(interior4, 1.0, 0.5).reshape(-1) * ones
    sel_w = jnp.where(lab == root, w, 0.0)
    wsum = jnp.sum(sel_w)
    xs = jnp.arange(n, dtype=jnp.float32) % W
    ys = jnp.floor(jnp.arange(n, dtype=jnp.float32) / W)
    cx = jnp.sum(sel_w * xs) / jnp.maximum(wsum, 1.0)
    cy = jnp.sum(sel_w * ys) / jnp.maximum(wsum, 1.0)
    # gate on the polygon-area estimate (host gates on cv2.contourArea)
    valid = (scores[root] >= area_threshold).astype(jnp.float32)
    return jnp.stack([cx, cy, valid])


@functools.partial(jax.jit, static_argnums=(1,))
def decode_keypoints_device(probs, area_threshold_x10: int = 100,
                            pred=None):
    """Full per-frame decode on device.

    probs: (H, W, C>=5) class probabilities (toolpose layout:
    1=r-base, 2=r-tip, 3=l-base, 4=l-tip). ``pred``: optional (H, W)
    class-ID map to decode from instead of argmax(probs) — pass the
    score-thresholded mask so device decode matches the host path's
    semantics when --score_detection_threshold > 0 (reference
    test_multiframe_segmentation_on_videos_v3.py:282-289).

    Returns (2, 3, 3): [side (left, right)][tip1, tip2, base][x, y, valid].
    """
    area_threshold = area_threshold_x10 / 10.0
    if pred is None:
        pred = jnp.argmax(probs, axis=-1)
    out = []
    for base_cls, tip_cls in ((3, 4), (1, 2)):  # left, right
        tips = decode_tips_device(probs[..., tip_cls], pred == tip_cls)
        base = decode_base_device(pred == base_cls, area_threshold)
        out.append(jnp.concatenate([tips, base[None]], axis=0))
    return jnp.stack(out)
