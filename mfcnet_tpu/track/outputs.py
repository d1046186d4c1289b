"""Per-frame output block shared by the live and artifact engines.

One definition of "probabilities -> (class mask, aux)" so the live
InferenceEngine and the exported-artifact ArtifactEngine cannot drift
apart — their bit-for-bit row parity is pinned in
tests/test_artifact_tracking.py, and this module is the reason a future
semantics change lands in both at once.

Reference semantics: per-class score threshold with higher classes
overwriting (test_multiframe_segmentation_on_videos_v3.py:282-289),
argmax otherwise.
"""

from __future__ import annotations


def outputs_from_probs(probs, cfg):
    """(..., H, W, C) class probabilities -> ``(mask, aux)``.

    ``mask``: (..., H, W) uint8 class IDs (thresholded or argmax).
    Decode-mode dependent tail —
      * ``cfg.decode == 'device'``: ``(mask, kps, heats)`` — kps
        (..., 2, 3, 3) keypoint rows from
        :func:`mfcnet_tpu.track.decode_device.decode_keypoints_device`
        (18 floats/frame on the host link) plus the f16 tip heats as a
        DEVICE-resident extra the tracker fetches lazily only when a
        side's tie flag demands the exact host re-decode;
      * host decode: ``(mask, heats)`` — (..., H, W, 2) f16 tip
        heatmaps (classes 2 and 4 — the sigma=4 smoothing and local-max
        comparison downstream are insensitive at f16 granularity).

    Traced code — call under jit with static ``cfg``.
    """
    import jax.numpy as jnp

    thr = float(cfg.score_detection_threshold)
    if thr > 0:
        mask = jnp.zeros(probs.shape[:-1], jnp.uint8)
        for cls in range(1, probs.shape[-1]):
            mask = jnp.where(probs[..., cls] > thr, jnp.uint8(cls), mask)
    else:
        mask = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
    heats = jnp.stack(
        [probs[..., 2], probs[..., 4]], axis=-1
    ).astype(jnp.float16)
    if cfg.decode == "device":
        import functools

        from mfcnet_tpu.track.decode_device import decode_keypoints_device

        dec = functools.partial(
            decode_keypoints_device,
            area_threshold_x10=int(cfg.area_threshold * 10),
        )
        return mask, dec(probs, pred=mask.astype(jnp.int32)), heats
    return mask, heats


def flow_for_window(frames_norm, flow_model, flow_variables):
    """Reference-v3 flow channels for one frame window, shared by the
    live engine and the serving export.

    (B, T, H, W, 3) normalized frames (newest first) -> (B, T-1, H, W, 2)
    flow. Reference test_multiframe_segmentation_on_videos_v3.py:264-271:
    the provider runs on 0.5x nearest-resized frames pairing the NEWEST
    frame with each previous one, and the flow is rescaled x2 (bilinear,
    align_corners=True) and divided by the 0.5 resize factor. All
    B*(T-1) pairs run as ONE batched forward, and the newest frame's
    per-image encoders run ONCE per window instead of once per pair
    (the pairs share image1; the encoders are per-sample at eval, so
    results equal the reference's per-pair loop to float-reassociation
    level).
    """
    from mfcnet_tpu.ops.pairs import repeat_for_pairs
    from mfcnet_tpu.ops.resize import resize_bilinear, resize_nearest

    B, T, H, W = frames_norm.shape[:4]
    H2, W2 = H // 2, W // 2
    half = resize_nearest(frames_norm, H2, W2)
    if hasattr(flow_model, "flow_from_features"):
        newest = half[:, 0]
        f1 = flow_model.apply(flow_variables, newest, method="features")
        net, inp = flow_model.apply(
            flow_variables, newest, method="context"
        )
        prevs = half[:, 1:T].reshape((B * (T - 1), H2, W2, 3))
        f2 = flow_model.apply(flow_variables, prevs, method="features")
        return _flow_from_feature_pairs(
            f1, f2, net, inp, T, (H, W), flow_model, flow_variables
        )
    # providers without split encoders (e.g. UnFlow, FlowFormer++)
    a = repeat_for_pairs(half[:, 0], T - 1)
    b = half[:, 1:T].reshape((B * (T - 1), H2, W2, 3))
    fl = flow_model.apply(flow_variables, a, b)
    fl = resize_bilinear(fl / 0.5, H, W, align_corners=True)
    return fl.reshape((B, T - 1, H, W, 2))


def flow_ingest(frame_norm, flow_model, flow_variables):
    """One frame's cacheable flow-provider encoder state.

    (B, H, W, 3) normalized frame -> ``(features, net, inp)`` — the
    0.5x-resolution fnet output (B, h, w, 256) plus the context
    encoder's GRU init/feed (B, h, w, 128) x2. The stateless
    :func:`flow_for_window` recomputes the previous frames' features on
    every new frame (the reference pairs the CURRENT frame with each
    previous one, so the flows themselves are not cacheable — but the
    per-image encoders are); the incremental engine calls this once per
    NEW frame and keeps a newest-first ring of the features.
    """
    from mfcnet_tpu.ops.resize import resize_nearest

    H, W = frame_norm.shape[-3:-1]
    half = resize_nearest(frame_norm, H // 2, W // 2)
    f = flow_model.apply(flow_variables, half, method="features")
    net, inp = flow_model.apply(flow_variables, half, method="context")
    return f, net, inp


def flow_from_feature_ring(feat_buf, net, inp, out_hw, flow_model,
                           flow_variables):
    """Reference-v3 flow for one window from CACHED per-frame features.

    feat_buf: (B, T, h, w, 256) newest-first ring of
    :func:`flow_ingest` features; (net, inp): the NEWEST frame's
    context state; out_hw: the full-resolution (H, W) the flow is
    rescaled to. Returns (B, T-1, H, W, 2) — the same quantity as
    :func:`flow_for_window` (same ops on the same inputs; each previous
    frame's fnet features were simply computed when that frame arrived
    instead of being recomputed per pair, so results agree to
    float-reassociation level — pinned in tests/test_tracker.py). The
    T-1 recurrent solves run as ONE batched forward, and the newest
    frame's encoders run once per frame instead of once per pair.
    """
    B, T = feat_buf.shape[:2]
    f2 = feat_buf[:, 1:T].reshape((B * (T - 1),) + feat_buf.shape[2:])
    return _flow_from_feature_pairs(
        feat_buf[:, 0], f2, net, inp, T, out_hw, flow_model,
        flow_variables,
    )


def _flow_from_feature_pairs(f1, f2, net, inp, T, out_hw, flow_model,
                             flow_variables):
    """Shared tail of the two feature paths: batched recurrent solve over
    the T-1 (newest, previous) feature pairs + the v3 0.5x rescale.

    f1: (B, h, w, C) newest-frame features; f2: (B*(T-1), h, w, C)
    previous-frame features in pair order; (net, inp): (B, ...) newest
    context state.
    """
    from mfcnet_tpu.ops.pairs import repeat_for_pairs
    from mfcnet_tpu.ops.resize import resize_bilinear

    B = f1.shape[0]
    H, W = out_hw
    fl = flow_model.apply(
        flow_variables,
        repeat_for_pairs(f1, T - 1), f2,
        repeat_for_pairs(net, T - 1), repeat_for_pairs(inp, T - 1),
        method="flow_from_features",
    )
    fl = resize_bilinear(fl / 0.5, H, W, align_corners=True)
    return fl.reshape((B, T - 1, H, W, 2))
