"""On-device keypoint decoding — fixed-shape, fully jitted.

The reference decodes on host with OpenCV contours + scipy filters
(utils/localization_utils_v2.py). That path needs the full class
probabilities shipped to host every frame (~2.7 MB at 480x640). This module
decodes on-device and ships 9 floats per instrument side:

  * tips: component-area gate (top-2 components with outer-contour area
    >= threshold — the host refine_tip_segmentation semantics, via the
    same lockstep label/stats pass as the bases) -> gaussian(σ=4) smooth
    -> circular-footprint local maxima ∧ kept components -> top-2 peaks
    by smoothed value (fixed-shape ``top_k``); ambiguous component
    rankings raise the side's tie flag for the exact host fallback
  * base: largest-component centroid by exact-for-simple-polygons Pick
    area, gated by area >= threshold (the residual approximation and
    its tie-flag fallback are documented at decode_base_device; the host
    path remains the exact-parity mode).

Output layout per side: [tip1_x, tip1_y, tip1_valid, tip2_x, tip2_y,
tip2_valid, base_x, base_y, base_valid].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from mfcnet_tpu.ops.peaks import gaussian_blur, local_maxima


def decode_tips_device(heatmap, blob, max_peaks: int = 2, refined=None):
    """Top-``max_peaks`` local maxima of the masked smoothed heatmap.

    heatmap, blob: (..., H, W) float / bool. Returns (..., max_peaks, 3)
    rows of (x, y, valid). Host semantics
    (test_multiframe_segmentation_on_videos_v3.py:27-42 + the local-max
    decode): the heat is zeroed outside the RAW tip mask before the σ=4
    smoothing, and maxima are restricted to ``refined`` — the component-
    area-gated mask (see :func:`refine_keep_from_areas`); pass
    ``refined=None`` for the ungated primitive (maxima anywhere in
    ``blob``).
    """
    W = heatmap.shape[-1]
    masked = jnp.where(blob, heatmap, 0.0)
    sm = gaussian_blur(masked, 4.0)
    lm = local_maxima(sm) & (blob if refined is None else refined)
    vals = jnp.where(lm, sm, -jnp.inf).reshape(heatmap.shape[:-2] + (-1,))
    top_vals, top_idx = jax.lax.top_k(vals, max_peaks)
    xs = (top_idx % W).astype(jnp.float32)
    ys = (top_idx // W).astype(jnp.float32)
    valid = jnp.isfinite(top_vals).astype(jnp.float32)
    return jnp.stack([xs, ys, valid], axis=-1)


@functools.partial(jax.jit, static_argnames=("connectivity", "impl"))
def connected_components(mask, connectivity: int = 8, impl: str = "auto"):
    """Connected-component labels.

    ``impl='auto'`` picks the Pallas TPU kernel
    (:mod:`mfcnet_tpu.ops.cc_pallas`, same algorithm fully VMEM-resident,
    ~10x faster) whenever the default backend is a TPU, and the XLA
    formulation below on CPU; 'xla'/'pallas' force a path (tests pin
    cross-implementation parity).
    """
    if impl == "auto":
        impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if impl == "pallas":
        from mfcnet_tpu.ops.cc_pallas import connected_components_pallas

        return connected_components_pallas(mask, connectivity)
    return _connected_components_xla(mask, connectivity)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def _connected_components_xla(mask, connectivity: int = 8):
    """XLA connected components: per-iteration a SEGMENTED
    MIN-SCAN along rows then columns (``lax.associative_scan`` with
    background pixels as segment resets) propagates the minimum label
    across entire runs in one sweep, a 3x3 neighborhood min hands labels
    across diagonal touches (8-connectivity), and one pointer-jumping hop
    (gather) collapses label chains. Long straight structures resolve in
    O(1) iterations instead of O(length) neighbor sweeps — the
    vectorized-scan formulation keeps the while_loop trip count tiny,
    which is what makes per-frame on-device decode viable (a pure
    neighbor-propagation + double-hop variant measured ~330 ms/frame at
    480x640 on v5e; this one ~1-2 ms on realistic masks).

    mask: (..., H, W) bool (leading batch dims allowed — sides/frames are
    labeled in one lockstep loop). Returns int32 of the same shape: each
    foreground pixel gets its component's minimum flat index within its
    own (H, W) image; background pixels get H*W.
    """
    H, W = mask.shape[-2:]
    n = H * W
    big = jnp.int32(n)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
    lab = jnp.where(mask, jnp.broadcast_to(idx, mask.shape), big)
    reset = ~mask

    def comb(a, b):
        # standard segmented-min operator: a reset on the right element
        # truncates propagation from the left
        ra, va = a
        rb, vb = b
        return ra | rb, jnp.where(rb, vb, jnp.minimum(va, vb))

    def seg_min(l, axis):
        axis = axis % l.ndim  # reverse=True requires a nonnegative axis
        _, fwd = jax.lax.associative_scan(comb, (reset, l), axis=axis)
        _, bwd = jax.lax.associative_scan(
            comb, (reset, l), axis=axis, reverse=True
        )
        return jnp.where(mask, jnp.minimum(fwd, bwd), big)

    pad_cfg = [(0, 0)] * (mask.ndim - 2) + [(1, 1), (1, 1)]

    def neighbor_min(l):
        # diagonal hand-off for 8-connectivity (orthogonal propagation is
        # covered by the scans)
        p = jnp.pad(l, pad_cfg, constant_values=n)
        m = jnp.minimum(
            jnp.minimum(p[..., :-2, :-2], p[..., :-2, 2:]),
            jnp.minimum(p[..., 2:, :-2], p[..., 2:, 2:]),
        )
        return jnp.where(mask, jnp.minimum(l, m), big)

    def hop(l):
        # pointer jumping: follow each pixel's label to that pixel's label
        flat = l.reshape(l.shape[:-2] + (n,))
        padded = jnp.concatenate(
            [flat, jnp.full(flat.shape[:-1] + (1,), n, jnp.int32)],
            axis=-1,
        )
        return jnp.take_along_axis(padded, flat, axis=-1).reshape(l.shape)

    def body(state):
        l, _ = state
        l2 = l if connectivity == 4 else neighbor_min(l)
        l2 = hop(seg_min(seg_min(l2, -1), -2))
        return l2, jnp.any(l2 != l)

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True)))
    return lab


@jax.jit
def fill_holes(mask):
    """Fill interior holes: background pixels (4-connected, matching the
    duality of 8-connected foreground) not reachable from the image border
    become foreground. This makes per-component pixel counts track
    cv2.contourArea of the OUTER contour (RETR_EXTERNAL), which is the
    filled polygon area the host ranks blobs by.

    mask: (..., H, W) bool (batched)."""
    H, W = mask.shape[-2:]
    n = H * W
    bg = ~mask
    lab_bg = connected_components(bg, connectivity=4)
    border = jnp.concatenate(
        [lab_bg[..., 0, :], lab_bg[..., -1, :],
         lab_bg[..., :, 0], lab_bg[..., :, -1]],
        axis=-1,
    )
    # per-image scatter of border-reachable bg labels
    B = math.prod(mask.shape[:-2])
    reach = (
        jnp.zeros((B, n + 1), bool)
        .at[jnp.arange(B)[:, None], border.reshape(B, -1)]
        .set(True)
    )
    holes = bg & ~jnp.take_along_axis(
        reach, lab_bg.reshape(B, n), axis=-1
    ).reshape(mask.shape)
    return mask | holes


def _base_rows_from_stats(counts, bndc, sw, swx, swy, area_threshold,
                          tie_rel, tie_abs):
    """Shared ranking/centroid tail: per-component sums -> (..., 4) rows
    (x, y, valid, tie). Works on any trailing component axis."""
    area = counts - 0.5 * bndc - 1.0
    top2, top2_idx = jax.lax.top_k(area, 2)
    s1, s2 = top2[..., 0], top2[..., 1]
    tie = (s2 > 0) & (s1 - s2 <= tie_abs + tie_rel * s1)
    sel = top2_idx[..., :1]
    wsum = jnp.maximum(
        jnp.take_along_axis(sw, sel, axis=-1)[..., 0], 1.0
    )
    cx = jnp.take_along_axis(swx, sel, axis=-1)[..., 0] / wsum
    cy = jnp.take_along_axis(swy, sel, axis=-1)[..., 0] / wsum
    valid = ((s1 >= area_threshold) & (s1 > 0)).astype(jnp.float32)
    return jnp.stack(
        [cx, cy, valid, tie.astype(jnp.float32) * valid], axis=-1
    )


@functools.partial(
    jax.jit,
    static_argnames=("area_threshold", "tie_rel", "tie_abs", "impl"),
)
def decode_base_device(class_mask, area_threshold: float = 10.0,
                       tie_rel: float = 0.02, tie_abs: float = 2.0,
                       impl: str = "auto"):
    """LARGEST-component centroid gated by area — the host semantics
    (track/decode.py calc_base_centroid; reference
    test_multiframe_segmentation_on_videos_v3.py:45-59), on device.

    Matching the OpenCV path: cv2 ranks RETR_EXTERNAL contours by polygon
    area of the OUTER boundary (holes filled) and takes the polygon-moment
    centroid. Here: holes are filled on device and components are ranked
    by the EXACT cv2.contourArea for simple outer polygons —
    Pick's theorem on the traced boundary (unit/sqrt2 edges carry no
    interior lattice points) gives  area = pixels - boundary/2 - 1,
    where boundary pixels are those with a 4-connected (filled-)background
    neighbor, exactly the pixels cv2's border following visits. The
    residual approximation is twofold and documented:

      * 1-px spurs self-overlap in the traced polygon (shoelace cancels
        them, Pick counts +1/2 per spur pixel) — can flip selection only
        between near-equal-area blobs, so a TIE flag is emitted whenever
        the top-2 areas are within ``tie_abs + tie_rel * area1`` and the
        caller (tracker) falls back to the exact host decode;
      * the centroid is the Green's-theorem-discretized weighted pixel
        centroid (interior 1, boundary 1/2), within ~2 px of cv2's
        truncated polygon-moment centroid on adversarial ragged masks
        (tests/test_decode_device.py statistical envelope) and well under
        1 px on compact instrument blobs.

    class_mask: (..., H, W) bool (leading dims batched in one lockstep
    label pass). Returns (..., 4) = (x, y, valid, tie).

    ``impl='auto'`` -> on TPU backends the per-component sums come from
    the all-VMEM Pallas stats kernel
    (:func:`mfcnet_tpu.ops.cc_pallas.base_stats_pallas` — flood fill,
    labels, dense ids and an MXU one-hot matmul, zero scatters; ~4 ms
    vs ~23 ms for the XLA formulation at (2, 480, 640) on v5e), with a
    ``lax.cond`` fallback to the XLA path if a pathological mask has
    more components than the kernel's K slots. On CPU (tests) the XLA
    path runs directly. Both paths share the ranking/centroid tail and
    are parity-pinned in tests/test_decode_device.py.
    """
    if impl == "auto":
        impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if impl == "pallas":
        from mfcnet_tpu.ops.cc_pallas import base_stats_pallas

        K = 256
        stats, ncomp = base_stats_pallas(class_mask, K=K)
        rows = _base_rows_from_stats(
            stats[..., 0, :], stats[..., 1, :], stats[..., 2, :],
            stats[..., 3, :], stats[..., 4, :],
            area_threshold, tie_rel, tie_abs,
        )
        # > K components would alias stats slots: exact (rare) fallback
        return jax.lax.cond(
            jnp.any(ncomp > K),
            lambda: _decode_base_xla(
                class_mask, area_threshold, tie_rel, tie_abs
            ),
            lambda: rows,
        )
    return _decode_base_xla(class_mask, area_threshold, tie_rel, tie_abs)


def _decode_base_xla(class_mask, area_threshold, tie_rel, tie_abs):
    """XLA formulation (CPU path + overflow fallback): explicit labels +
    vmapped segment_sum keyed by component root pixel."""
    H, W = class_mask.shape[-2:]
    lead = class_mask.shape[:-2]
    n = H * W
    B = math.prod(lead)
    m = class_mask.reshape(B, H, W)
    counts, bnd_counts, sw, swx, swy, _ = _xla_component_stats(m, n)
    out = _base_rows_from_stats(
        counts, bnd_counts, sw, swx, swy,
        area_threshold, tie_rel, tie_abs,
    )
    return out.reshape(lead + (4,)) if lead else out[0]


def refine_keep_from_areas(areas, ids, area_threshold,
                           tie_rel: float = 0.02, tie_abs: float = 2.0):
    """Component-area gate shared by both decode implementations.

    Host semantics (refine_tip_segmentation, reference
    test_multiframe_segmentation_on_videos_v3.py:32-42): rank components
    by outer-contour area, keep the TOP-2, and keep each only if its
    area >= threshold.

    areas: (..., K) per-component Pick's-theorem areas (empty slots
    negative); ids: (..., H, W) per-pixel component key into that slot
    axis (-1 / sentinel outside). Returns ``(keep, tie)`` — keep
    (..., H, W) bool pixels of kept components, tie (...,) bool flagging
    decisions the Pick-area approximation could get wrong vs cv2: a
    near-tie at the #2/#3 ranking boundary, or any of the top-3 areas
    within ``tie_abs`` of the threshold (gate flips)."""
    top3, top3_idx = jax.lax.top_k(areas, 3)
    a1, a2, a3 = top3[..., 0], top3[..., 1], top3[..., 2]
    i1 = top3_idx[..., 0][..., None, None]
    i2 = top3_idx[..., 1][..., None, None]
    keep = (
        ((ids == i1) & (a1 >= area_threshold)[..., None, None])
        | ((ids == i2) & (a2 >= area_threshold)[..., None, None])
    )

    def near(v):
        return (v >= 0) & (jnp.abs(v - area_threshold) <= tie_abs)

    tie = (
        ((a2 > 0) & (a3 >= area_threshold - tie_abs)
         & (a2 - a3 <= tie_abs + tie_rel * jnp.maximum(a2, 0.0)))
        | near(a1) | near(a2) | near(a3)
    )
    return keep, tie


@functools.partial(jax.jit, static_argnums=(1,))
def decode_keypoints_device(probs, area_threshold_x10: int = 100,
                            pred=None):
    """Full per-frame decode on device.

    probs: (..., H, W, C>=5) class probabilities (toolpose layout:
    1=r-base, 2=r-tip, 3=l-base, 4=l-tip); leading dims (batched video
    streams) are decoded in one lockstep pass — do NOT ``jax.vmap`` this
    function over streams: vmap turns the rare-overflow ``lax.cond``
    into a ``select`` that executes the slow XLA fallback every frame
    (measured 93 -> 13 fps aggregate at B=4).
    ``pred``: optional (..., H, W) class-ID map to decode from instead of
    argmax(probs) — pass the score-thresholded mask so device decode
    matches the host path's semantics when --score_detection_threshold
    > 0 (reference test_multiframe_segmentation_on_videos_v3.py:282-289).

    All four class blobs (2 sides x base/tip) go through ONE lockstep
    label/stats pass; tip heatmap maxima are restricted to the top-2
    tip components with area >= threshold, matching the host
    refine_tip_segmentation gate (reference :32-42) — a sub-threshold
    speck of the tip class can no longer emit a spurious second tip.

    Returns (..., 2, 3, 3): [side (left, right)][tip1, tip2, base]
    [x, y, valid]. The base row's valid field is 0 (no detection),
    1 (detection), or 2 (detection with an approximation-sensitive
    decision on this side — a base near-tie OR an ambiguous tip
    component gate — the caller should fall back to the exact host
    decode for this side)."""
    area_threshold = area_threshold_x10 / 10.0
    if pred is None:
        pred = jnp.argmax(probs, axis=-1)
    lead = probs.shape[:-3]
    H, W = probs.shape[-3:-1]
    # [l-base, r-base, l-tip, r-tip] labeled/summed in one lockstep pass
    masks4 = jnp.stack(
        [pred == 3, pred == 1, pred == 4, pred == 2], axis=-3
    )
    heats = jnp.stack([probs[..., 4], probs[..., 2]], axis=-3)

    if jax.default_backend() == "cpu":
        return _decode_keypoints_xla(masks4, heats, area_threshold)
    return _decode_keypoints_union(pred, masks4, heats, area_threshold)


def _decode_keypoints_union(pred, masks4, heats, area_threshold,
                            interpret: bool = False):
    """TPU path: the four class blobs are mutually disjoint (one
    argmax/thresholded class map), so ONE union label pass per frame
    (:func:`mfcnet_tpu.ops.cc_pallas.union_stats_pallas`) replaces the
    four per-blob grid steps: encode them as a class image in the
    masks4 blob order (1=l-base, 2=r-base, 3=l-tip, 4=r-tip) and slice
    the union stats back per class. Raster slot order is preserved
    within each class, so every top-k tie-break matches the per-blob
    path.

    THREE-TIER fallback, each tier exact: frames the union image
    cannot represent (>= 2-deep cross-class nesting, a same-class
    component straddling a containment boundary, > K union components)
    drop to the per-blob lockstep Pallas pass (~3.6 ms — noisy class
    maps, e.g. from an untrained model, hit these geometries every
    frame, and the first cut's direct drop to the XLA formulation cost
    ~110 ms/frame there); only a per-blob component-count overflow
    falls all the way back to the XLA path."""
    from mfcnet_tpu.ops.cc_pallas import base_stats_pallas, union_stats_pallas

    # one SHARED slot budget across all four classes; overflow drops to
    # the per-blob tier (4 x 256 slots), never silently aliases. 256
    # keeps the one-hot stats matmuls narrow — measured ~0.3 ms/frame
    # cheaper than K=1024 on the e2e pipeline, and clean (trained-model)
    # masks stay far below it
    K = 256
    lead4 = masks4.shape[:-2]
    H, W = masks4.shape[-2:]
    ucls = jnp.where(
        pred == 3, 1,
        jnp.where(pred == 1, 2,
                  jnp.where(pred == 4, 3, jnp.where(pred == 2, 4, 0))),
    ).astype(jnp.int8)
    stats, ccls, ncomp, conflict, cid = union_stats_pallas(
        ucls, K=K, interpret=interpret
    )
    clsmask = ccls[..., None, :] == jnp.arange(
        1, 5, dtype=ccls.dtype
    )[:, None]  # (..., 4, K)

    def per_cls(rowi):
        return jnp.where(clsmask, stats[..., rowi, :][..., None, :], 0.0)

    ids4 = jnp.broadcast_to(cid[..., None, :, :], lead4 + (H, W))
    rows = _keypoints_from_stats(
        masks4, heats,
        per_cls(0), per_cls(1), per_cls(2), per_cls(3), per_cls(4),
        ids4, area_threshold,
    )

    def per_blob_tier():
        Kb = 256
        stats, ncomp4, cid4 = base_stats_pallas(
            masks4, K=Kb, return_cid=True, interpret=interpret
        )
        rows_pb = _keypoints_from_stats(
            masks4, heats,
            stats[..., 0, :], stats[..., 1, :], stats[..., 2, :],
            stats[..., 3, :], stats[..., 4, :], cid4, area_threshold,
        )
        return jax.lax.cond(
            jnp.any(ncomp4 > Kb),
            lambda: _decode_keypoints_xla(masks4, heats, area_threshold),
            lambda: rows_pb,
        )

    return jax.lax.cond(
        jnp.any(conflict) | jnp.any(ncomp > K),
        per_blob_tier,
        lambda: rows,
    )


def _keypoints_from_stats(masks4, heats, counts, bndc, sw, swx, swy, ids,
                          area_threshold,
                          tie_rel: float = 0.02, tie_abs: float = 2.0):
    """Shared tail: per-component sums over the [l-base, r-base, l-tip,
    r-tip] stack (+ per-pixel component keys ``ids``) -> (..., 2, 3, 3)
    keypoint rows. Works for both the Pallas (K slots) and XLA (n+1
    buckets) stats layouts."""
    base = _base_rows_from_stats(
        counts[..., :2, :], bndc[..., :2, :], sw[..., :2, :],
        swx[..., :2, :], swy[..., :2, :],
        area_threshold, tie_rel, tie_abs,
    )  # (..., 2, 4): (x, y, valid, tie)
    tip_areas = (
        counts[..., 2:, :] - 0.5 * bndc[..., 2:, :] - 1.0
    )  # (..., 2, K)
    keep, tip_tie = refine_keep_from_areas(
        tip_areas, ids[..., 2:, :, :], area_threshold, tie_rel, tie_abs
    )
    blobs = masks4[..., 2:, :, :]
    tips = decode_tips_device(
        heats, blobs, refined=blobs & keep
    )  # (..., 2, 2, 3)
    side_tie = jnp.minimum(
        base[..., 3] + tip_tie.astype(jnp.float32) * base[..., 2], 1.0
    )
    base_rows = jnp.stack(
        [base[..., 0], base[..., 1], base[..., 2] + side_tie], axis=-1
    )  # (..., 2, 3) valid 0/1/2
    return jnp.concatenate(
        [tips, base_rows[..., None, :]], axis=-2
    )


def _decode_keypoints_xla(masks4, heats, area_threshold,
                          tie_rel: float = 0.02, tie_abs: float = 2.0):
    """XLA formulation (CPU path + overflow fallback) of the combined
    4-blob decode: explicit labels + vmapped segment sums keyed by the
    component root pixel (bucket axis n+1, per-pixel key = label)."""
    H, W = masks4.shape[-2:]
    lead4 = masks4.shape[:-2]
    n = H * W
    B = math.prod(lead4)
    m = masks4.reshape(B, H, W)
    counts, bndc, sw, swx, swy, lab = _xla_component_stats(m, n)
    shape_stats = lead4 + (n + 1,)
    return _keypoints_from_stats(
        masks4, heats,
        counts.reshape(shape_stats), bndc.reshape(shape_stats),
        sw.reshape(shape_stats), swx.reshape(shape_stats),
        swy.reshape(shape_stats),
        lab.reshape(lead4 + (H, W)), area_threshold, tie_rel, tie_abs,
    )


def _xla_component_stats(m, n):
    """(B, H, W) bool -> per-label sums (B, n+1) x5 + labels (B, n):
    hole-filled component pixel/boundary counts and Green's-theorem
    centroid weights, background bucket (label n) zeroed."""
    B, H, W = m.shape
    filled = fill_holes(m)
    lab = _connected_components_xla(filled).reshape(B, n)
    ones = filled.reshape(B, n).astype(jnp.float32)
    seg = jax.vmap(
        lambda v, l: jax.ops.segment_sum(v, l, num_segments=n + 1)
    )
    counts = seg(ones, lab)
    fp = jnp.pad(filled, ((0, 0), (1, 1), (1, 1)))
    interior4 = (
        fp[:, :-2, 1:-1] & fp[:, 2:, 1:-1]
        & fp[:, 1:-1, :-2] & fp[:, 1:-1, 2:]
    ) & filled
    bnd = (filled & ~interior4).reshape(B, n).astype(jnp.float32)
    bnd_counts = seg(bnd, lab)
    counts = counts.at[:, n].set(0.0)
    bnd_counts = bnd_counts.at[:, n].set(0.0)
    w = jnp.where(interior4, 1.0, 0.5).reshape(B, n) * ones
    xs = jnp.arange(n, dtype=jnp.float32) % W
    ys = jnp.floor(jnp.arange(n, dtype=jnp.float32) / W)
    return (
        counts, bnd_counts, seg(w, lab), seg(w * xs, lab),
        seg(w * ys, lab), lab,
    )
