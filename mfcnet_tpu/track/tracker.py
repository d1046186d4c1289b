"""End-to-end video tracking — the product surface.

Reimplements scripts/test_multiframe_segmentation_on_videos_v3.py tpu-first:
the rolling T-frame window, per-frame model forward, class decode, per-side
tip/base keypoint extraction with area/distance gating and 2-tip temporal
assignment, overlay MP4 + N x 12 CSV output.

TPU-first changes vs the reference:
  * Incremental mode (default): one base-model forward per new frame — the
    previous frames' class maps live in a device-side ring buffer; the
    reference recomputes all T base forwards per frame (:251-281). Output is
    identical (verified by tests); base-model FLOPs drop by T x.
  * Device does decode-adjacent work (softmax, argmax, per-class score
    threshold) and ships only the class mask + the two tip heatmaps to host.
  * Host keypoint decode matches the reference bit-for-bit, including its
    left-instrument prev-tip bookkeeping bug (:299 assigns the returned
    cY_prev into cX_prev_left and never updates cY_prev_left) — controlled
    by ``replicate_left_prev_bug``.

CSV layout (N x 12, NaN = missing):
  [ltip1 x, ltip1 y, ltip2 x, ltip2 y, rtip1 x, rtip1 y, rtip2 x, rtip2 y,
   lbase x, lbase y, rbase x, rbase y]
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Optional

import cv2
import numpy as np

from mfcnet_tpu.track.decode import (
    calc_base_centroid,
    compute_distance,
    create_circular_mask,
    determine_local_maxima_and_estimate_centroids,
    refine_tip_segmentation,
)
from mfcnet_tpu.utils.vis import mask_overlay


@dataclasses.dataclass
class TrackerConfig:
    num_input_frames: int = 3
    num_classes: int = 5
    input_height: int = 480
    input_width: int = 640
    score_detection_threshold: float = 0.0
    area_threshold: float = 10.0
    dist_threshold: float = 40.0
    mode: str = "incremental"  # 'incremental' | 'full'
    decode: str = "host"  # 'host' (exact parity) | 'device' (fixed-shape)
    #: device-decode only: re-decode a tie-flagged side with the exact
    #: host path (lazy mask/heat fetch + sync). Trained checkpoints flag
    #: ~0.25% of frames (r3 envelope: 1/400 adversarial masks); leave on
    #: for production. Random-init fixtures emit speckle masks that flag
    #: nearly EVERY frame, serializing the pipeline on per-frame mask
    #: transfers — benchmarks on synthetic weights disable this and
    #: accept the device approximation for flagged sides.
    decode_tie_fallback: bool = True
    #: frames per device->host result fetch. 1 = synchronous per-frame
    #: readback; K>1 stacks K frames' outputs on device and fetches them
    #: in ONE transfer, amortizing the round-trip latency K-fold (the
    #: dominant per-frame cost on high-latency links). Keypoint rows are
    #: identical for any K — only fetch granularity changes; results
    #: lag the newest ingested frame by up to 2K frames.
    fetch_batch: int = 8
    dtype: str = "bfloat16"
    add_depth_inputs: bool = False
    add_optflow_inputs: bool = False
    replicate_left_prev_bug: bool = True
    output_fps: int = 30
    overlay: bool = True
    #: shard the image height over this many devices (1-D 'spatial' mesh):
    #: single-stream latency scaling — GSPMD splits every conv across
    #: chips with ICI halo exchanges. Outputs identical to unsharded.
    spatial_shards: int = 1
    #: incremental mode: dispatch ingest+fuse as ONE jitted call per
    #: post-warmup frame instead of two — saves one dispatch round trip
    #: per frame and lets XLA schedule base forward + fusion head as one
    #: program. Outputs identical (pinned by test); opt-in until the
    #: dispatch saving is measured on directly-attached hardware.
    fused_dispatch: bool = False


@dataclasses.dataclass
class _SideState:
    detected_tips: int = 0
    cx_prev: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )
    cy_prev: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )


# per-side class IDs and CSV column offsets
_SIDE = {
    "left": dict(base_cls=3, tip_cls=4, tcol=0, bcol=8, color=(255, 255, 255)),
    "right": dict(base_cls=1, tip_cls=2, tcol=4, bcol=10, color=(0, 0, 0)),
}


def decode_side_keypoints(
    side: str,
    mask_array: np.ndarray,
    tip_heatmap: np.ndarray,
    state: _SideState,
    cfg: TrackerConfig,
    row: np.ndarray,
    disp_image: Optional[np.ndarray] = None,
):
    """Decode one instrument's base + up-to-2 tips into ``row`` (len 12).

    Mirrors compute_centroids_and_store
    (scripts/test_multiframe_segmentation_on_videos_v3.py:95-194).
    Returns the updated side state.
    """
    info = _SIDE[side]
    tcol, bcol, colors = info["tcol"], info["bcol"], info["color"]
    base_mask = 255 * (mask_array == info["base_cls"]).astype(np.uint8)
    tip_mask = 255 * (mask_array == info["tip_cls"]).astype(np.uint8)
    heat = tip_heatmap.copy()
    heat[tip_mask == 0] = 0

    fmask = create_circular_mask(10, 10).astype(np.float64)
    bx, by = calc_base_centroid(base_mask, cfg.area_threshold)
    if len(bx) == 0:
        state.detected_tips = 0
        return state
    row[bcol] = bx[0]
    row[bcol + 1] = by[0]
    tip_mask = refine_tip_segmentation(tip_mask, cfg.area_threshold)
    cx, cy = determine_local_maxima_and_estimate_centroids(
        heat, tip_mask > 0, fmask
    )
    if len(cx) == 0:
        state.detected_tips = 0
    elif len(cx) == 1:
        d = compute_distance(bx[0], by[0], cx[0], cy[0])
        if d < cfg.dist_threshold:
            state.detected_tips = 1
            row[tcol : tcol + 4] = [cx[0], cy[0], cx[0], cy[0]]
            if disp_image is not None:
                cv2.circle(disp_image, (cx[0], cy[0]), 4, colors, -1)
        else:
            state.detected_tips = 0
    elif len(cx) == 2:
        d01 = compute_distance(bx[0], by[0], cx[0], cy[0])
        d02 = compute_distance(bx[0], by[0], cx[1], cy[1])
        if d01 < cfg.dist_threshold and d02 < cfg.dist_threshold:
            state.detected_tips = 2
            d11 = compute_distance(cx[0], cy[0], state.cx_prev[0], state.cy_prev[0])
            d12 = compute_distance(cx[0], cy[0], state.cx_prev[1], state.cy_prev[1])
            d21 = compute_distance(cx[1], cy[1], state.cx_prev[0], state.cy_prev[0])
            d22 = compute_distance(cx[1], cy[1], state.cx_prev[1], state.cy_prev[1])
            if d11 + d22 < d12 + d21:
                row[tcol : tcol + 4] = [cx[0], cy[0], cx[1], cy[1]]
            else:
                row[tcol : tcol + 4] = [cx[1], cy[1], cx[0], cy[0]]
            if disp_image is not None:
                cv2.circle(disp_image, (cx[0], cy[0]), 4, colors, -1)
                cv2.circle(disp_image, (cx[1], cy[1]), 4, colors, -1)
        elif d01 < cfg.dist_threshold:
            state.detected_tips = 1
            row[tcol : tcol + 4] = [cx[0], cy[0], cx[0], cy[0]]
            if disp_image is not None:
                cv2.circle(disp_image, (cx[0], cy[0]), 4, colors, -1)
        elif d02 < cfg.dist_threshold:
            state.detected_tips = 1
            row[tcol : tcol + 4] = [cx[1], cy[1], cx[1], cy[1]]
            if disp_image is not None:
                cv2.circle(disp_image, (cx[1], cy[1]), 4, colors, -1)
        else:
            state.detected_tips = 0
    else:
        raise ValueError(f"Unexpected number of detected tips: {len(cx)}")

    new_cx = row[tcol : tcol + 4 : 2].copy()
    new_cy = row[tcol + 1 : tcol + 4 : 2].copy()
    if side == "left" and cfg.replicate_left_prev_bug:
        # reference :299 unpacks (..., cX_prev, cY_prev, ...) into
        # (..., cX_prev_left, cX_prev_left, ...): cx_prev ends up holding
        # cy, and cy_prev is never updated from the call.
        state.cx_prev = new_cy
    else:
        state.cx_prev = new_cx
        state.cy_prev = new_cy
    if disp_image is not None:
        cv2.circle(disp_image, (bx[0], by[0]), 2, colors, -1)
    return state


class KeypointTracker:
    """Stateful per-video keypoint tracker over decoded model outputs."""

    def __init__(self, num_frames_total: int, cfg: TrackerConfig):
        self.cfg = cfg
        # num_frames_total is a hint (video containers routinely misreport
        # CAP_PROP_FRAME_COUNT): storage GROWS if more frames arrive, and
        # `rows` always spans max(hint, frames seen) so a short video
        # keeps the reference's NaN-padded N-row CSV shape
        self._hint = max(0, int(num_frames_total))
        self._rows = np.full((max(1, self._hint), 12), np.nan)
        self.left = _SideState()
        self.right = _SideState()
        self.count = 0

    @property
    def rows(self):
        return self._rows[: max(self.count, self._hint)]

    def _next_row(self):
        if self.count >= len(self._rows):
            grow = np.full((max(64, len(self._rows) // 2), 12), np.nan)
            self._rows = np.vstack([self._rows, grow])
        return self._rows[self.count]

    def update(self, mask_array, left_tip_heat, right_tip_heat,
               disp_image=None):
        row = self._next_row()
        self.left = decode_side_keypoints(
            "left", mask_array, left_tip_heat, self.left, self.cfg, row,
            disp_image,
        )
        self.right = decode_side_keypoints(
            "right", mask_array, right_tip_heat, self.right, self.cfg, row,
            disp_image,
        )
        self.count += 1
        return row

    def update_device(self, kps, mask_array=None, disp_image=None,
                      mask_provider=None, heat_provider=None):
        """Update from on-device decoded keypoints (2, 3, 3):
        [side l/r][tip1, tip2, base][x, y, valid]. Applies the same
        distance gate and 2-tip temporal assignment as the host path.

        A base valid field of 2 flags an approximation-sensitive side
        (a base near-tie between the two largest components, or an
        ambiguous tip component gate — see decode_keypoints_device): the
        device Pick-area ranking could disagree with cv2 there, so the
        whole side is re-decoded with the exact host path from the class
        mask + tip heat — ``mask_array`` directly or via
        ``mask_provider``, and the f16 tip heats via ``heat_provider``
        (zero-arg callables; the fast path skips those transfers on the
        overwhelming majority of frames with no tie). Without a heat
        source only the base is host-recomputed (pre-heat-plumbing
        behavior)."""
        row = self._next_row()
        for side, state, arr in (
            ("left", self.left, kps[0]),
            ("right", self.right, kps[1]),
        ):
            info = _SIDE[side]
            tcol, bcol = info["tcol"], info["bcol"]
            bx, by, bvalid = arr[2]
            if bvalid <= 0:
                state.detected_tips = 0
                continue
            if bvalid >= 2:  # ambiguous -> exact host re-decode
                m = mask_array
                if m is None and mask_provider is not None:
                    m = np.asarray(mask_provider())
                h = (
                    np.asarray(heat_provider())
                    if heat_provider is not None else None
                )
                if m is not None and h is not None:
                    # full host side decode (same f16 heat quantization
                    # as the --decode host pipeline ships)
                    heat = (
                        h[..., 1] if side == "left" else h[..., 0]
                    ).astype(np.float32)
                    decode_side_keypoints(
                        side, m, heat, state, self.cfg, row, disp_image
                    )
                    continue
                if m is not None:
                    from mfcnet_tpu.track.decode import calc_base_centroid

                    hx, hy = calc_base_centroid(
                        255 * (m == info["base_cls"]).astype(np.uint8),
                        self.cfg.area_threshold,
                    )
                    if not hx:
                        state.detected_tips = 0
                        continue
                    bx, by = float(hx[0]), float(hy[0])
            row[bcol], row[bcol + 1] = bx, by
            tips = [
                (x, y) for x, y, v in arr[:2]
                if v > 0
                and compute_distance(bx, by, x, y) < self.cfg.dist_threshold
            ]
            if not tips:
                state.detected_tips = 0
            elif len(tips) == 1:
                state.detected_tips = 1
                (x, y) = tips[0]
                row[tcol : tcol + 4] = [x, y, x, y]
            else:
                state.detected_tips = 2
                (x1, y1), (x2, y2) = tips[:2]
                d11 = compute_distance(x1, y1, state.cx_prev[0], state.cy_prev[0])
                d12 = compute_distance(x1, y1, state.cx_prev[1], state.cy_prev[1])
                d21 = compute_distance(x2, y2, state.cx_prev[0], state.cy_prev[0])
                d22 = compute_distance(x2, y2, state.cx_prev[1], state.cy_prev[1])
                if d11 + d22 < d12 + d21:
                    row[tcol : tcol + 4] = [x1, y1, x2, y2]
                else:
                    row[tcol : tcol + 4] = [x2, y2, x1, y1]
            if side == "left" and self.cfg.replicate_left_prev_bug:
                # mirror the host path's reference-bug bookkeeping
                # (decode_side_keypoints: reference :299 leaves cy_prev
                # stale and stores cy into cx_prev for the left side) so
                # host- and device-decode 2-tip assignments stay identical
                state.cx_prev = row[tcol + 1 : tcol + 4 : 2].copy()
            else:
                state.cx_prev = row[tcol : tcol + 4 : 2].copy()
                state.cy_prev = row[tcol + 1 : tcol + 4 : 2].copy()
            if disp_image is not None:
                for x, y in tips:
                    cv2.circle(disp_image, (int(x), int(y)), 4,
                               info["color"], -1)
                cv2.circle(disp_image, (int(bx), int(by)), 2,
                           info["color"], -1)
        self.count += 1
        return row

    def skip(self):
        """Frame consumed without a model output (warmup window)."""
        self._next_row()  # ensure storage spans this (NaN) row
        self.count += 1

    @property
    def missing_rates(self):
        n = max(1, len(self.rows))
        return (
            np.count_nonzero(np.isnan(self.rows[:, 0])) / n,
            np.count_nonzero(np.isnan(self.rows[:, 4])) / n,
        )


def classes_from_probs(probs: np.ndarray, threshold: float) -> np.ndarray:
    """argmax decode, or per-class score threshold when threshold > 0
    (reference :282-289 — higher classes overwrite lower)."""
    if threshold > 0:
        out = np.zeros(probs.shape[:2])
        for cls in range(1, probs.shape[-1]):
            out[probs[..., cls] > threshold] = cls
        return out
    return probs.argmax(axis=-1)


def render_overlay(frame_rgb, mask_array):
    """4-class mask overlay (reference :292-296)."""
    disp = frame_rgb
    disp = mask_overlay(disp, (mask_array == 1).astype(np.uint8), (255, 1, 0))
    disp = mask_overlay(disp, (mask_array == 2).astype(np.uint8), (255, 255, 1))
    disp = mask_overlay(disp, (mask_array == 3).astype(np.uint8), (0, 1, 255))
    disp = mask_overlay(disp, (mask_array == 4).astype(np.uint8), (0, 255, 255))
    return disp


class InferenceEngine:
    """Device-side per-frame inference engines.

    'incremental': every frame gets ONE base-model forward pushed into a
    device ring buffer; fusion runs on the buffered per-frame class maps.
    Numerically identical to 'full' (which recomputes all T base forwards
    per frame, the reference's pattern) — including during warmup, since
    ingest happens for every frame from the first one.
    """

    def __init__(self, model, variables, cfg: TrackerConfig,
                 flow_model=None, flow_variables=None,
                 spatial_shards: int = 0, num_streams: int = 1,
                 stream_shards: int = 1, weights: str = "closure"):
        """``flow_model``/``flow_variables``: optional frozen flow provider
        (a RAFT module) used when cfg.add_optflow_inputs — the reference
        computes flow between the newest frame and each previous frame at
        0.5x resolution, then rescales the flow x2 with bilinear
        align_corners=True (test_multiframe_segmentation_on_videos_v3.py:
        264-271).

        ``spatial_shards``: shard the image HEIGHT over this many devices
        (1-D 'spatial' mesh). Tracking is batch-1, so the data axis is
        useless for latency; height sharding lets GSPMD split every conv
        across chips with ICI halo exchanges — the single-stream latency
        scaling path. Outputs are identical to the unsharded engine
        (pinned by test); the keypoint decode input is gathered to
        replicated first (the Pallas decode is a whole-image kernel).
        0 (default) means 'use cfg.spatial_shards'.

        ``num_streams``: track B videos CONCURRENTLY as one batched
        engine — ring buffers, base forwards, fusion, and keypoint
        decode all carry a leading stream axis, so B videos cost one
        batched dispatch per frame instead of B (production serving:
        aggregate throughput; the reference processes videos strictly
        sequentially). ``step_async`` then takes (B, H, W, 3) frame
        stacks and returns per-stream outputs; results are identical to
        B independent engines (pinned by test). With num_streams == 1
        the compiled programs are unchanged.

        ``stream_shards``: additionally shard the STREAM axis over a
        'data' mesh axis (requires num_streams % stream_shards == 0) —
        the pod-serving layout: independent streams on independent
        chips, composable with ``spatial_shards`` as a (data, spatial)
        mesh. Outputs identical (pinned by test).

        ``weights``: 'closure' (default) bakes the model/flow variables
        into the compiled programs as XLA constants — best steady-state
        fps, but the serialized executables carry ~3x the weight bytes
        (~400 MB for the flagship), which costs minutes to load per
        process on a remote-tunnel backend. 'packed' passes them as
        shape-grouped stacked buffers (utils/flatpack.py): ~7 MB
        executables, ~0.4 ms/frame runtime weight prep. Outputs
        identical either way."""
        import jax
        import jax.numpy as jnp

        self.cfg = cfg
        if spatial_shards == 0:
            spatial_shards = getattr(cfg, "spatial_shards", 1)
        B = self.num_streams = max(1, int(num_streams))
        stream_shards = max(1, int(stream_shards))
        if stream_shards > 1 and B % stream_shards != 0:
            raise ValueError(
                f"num_streams {B} must be divisible by stream_shards "
                f"{stream_shards}"
            )
        H, W, T, C = (
            cfg.input_height, cfg.input_width,
            cfg.num_input_frames, cfg.num_classes,
        )
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self._jnp = jnp

        self._spatial = None
        if spatial_shards > 1 or stream_shards > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            from mfcnet_tpu.parallel import make_mesh

            from mfcnet_tpu.parallel import spatial_sharding

            mesh = make_mesh(
                stream_shards * spatial_shards, ("data", "spatial"),
                shape=(stream_shards, spatial_shards),
            )
            shard_streams = stream_shards > 1

            def _h_sharding(ndim, h_axis):
                # in a batched engine every committed array carries the
                # stream axis at position 0 (frames, buffers, zero depth)
                return spatial_sharding(
                    mesh, ndim, h_axis,
                    data_axis=(
                        "data" if shard_streams and h_axis > 0 else None
                    ),
                )

            self._spatial = (mesh, _h_sharding)
            self._replicated = NamedSharding(mesh, PartitionSpec())
            # pure stream sharding + host decode: every shard already
            # holds its streams' complete images — no gather needed
            # (the host fetch assembles shards without extra traffic)
            self._skip_gather = (
                spatial_shards == 1 and cfg.decode != "device"
            )
        from mfcnet_tpu.utils.jitinit import cast_floats

        cvars = cast_floats(variables, dtype)
        # the frozen flow provider follows the engine compute dtype too:
        # at tracker sizes the f32 conv path is ~2-4x slower on the MXU
        # and the flow feeds a 0.5x->x2 rescaled input channel, well
        # inside the bf16 envelope (tests/test_flow.py pins the fused-
        # update drift; f32 engines keep the provider exact)
        if flow_variables is not None:
            flow_variables = cast_floats(flow_variables, dtype)
        if weights == "packed":
            from mfcnet_tpu.utils.flatpack import (
                pack_variables, unpack_variables,
            )

            pm, sm = pack_variables(cvars)
            wb = {"m": pm}
            sf = None
            if flow_variables is not None:
                pf, sf = pack_variables(flow_variables)
                wb["f"] = pf
            jax.block_until_ready(wb)
            self._wb = wb

            def _cv(wb):
                return unpack_variables(wb["m"], sm)

            def _fv(wb):
                return unpack_variables(wb["f"], sf) \
                    if sf is not None else None
        else:
            self._wb = {}

            def _cv(wb):
                return cvars

            def _fv(wb):
                return flow_variables
        mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], dtype)

        def compute_flow(frames_norm, fv):
            # reference v3 half-res flow semantics — shared with the
            # serving export so live and artifact flow cannot drift
            from mfcnet_tpu.track.outputs import flow_for_window

            return flow_for_window(frames_norm, flow_model, fv)

        # streaming fast path: with no flow/depth inputs the per-frame seg
        # ring buffer lives in the space-to-depth domain (zero layout
        # transposes per frame; see MultiFrameHead) — outputs identical
        use_s2d = (
            not cfg.add_optflow_inputs and not cfg.add_depth_inputs
            and cfg.mode == "incremental" and H % 4 == 0 and W % 4 == 0
        )
        self._use_s2d = use_s2d
        # incremental flow path: providers exposing split per-image
        # encoders (RAFT's and FlowFormer++'s features/context/
        # flow_from_features) get the cached feature ring; others
        # (UnFlow) keep a raw frame ring and run the stateless
        # flow_for_window per fuse
        flow_split = cfg.add_optflow_inputs and hasattr(
            flow_model, "flow_from_features"
        )

        @jax.jit
        def ingest(seg_buf, depth_buf, frame_buf, frame_u8, depth_u8, wb):
            # frame_u8: (H, W, 3) single-stream or (B, H, W, 3) batched
            cv, fv = _cv(wb), _fv(wb)
            x = frame_u8.astype(dtype) / 255.0
            x = (x - mean) / std
            if x.ndim == 3:
                x = x[None]
            if use_s2d:
                seg_new = model.apply(cv, x, method="base_forward_s2d")
                seg_buf = jnp.concatenate(
                    [seg_new, seg_buf[..., : (T - 1) * 16 * C]], axis=-1
                )
            else:
                seg_new = model.apply(cv, x, method="base_forward")
                seg_buf = jnp.concatenate(
                    [seg_new[:, None], seg_buf[:, :-1]], axis=1
                )
            if cfg.add_depth_inputs:
                d = (depth_u8.astype(dtype) / 255.0)[..., None]
                if d.ndim == 3:
                    d = d[None]
                depth_buf = jnp.concatenate(
                    [d[:, None], depth_buf[:, :-1]], axis=1
                )
            # else: depth_buf is a (B, 1, 1, 1, 1) placeholder carried
            # through untouched — fuse never reads it, and skipping the
            # roll saves B*T*H*W HBM write traffic per frame on the
            # non-s2d (flow) path
            if cfg.add_optflow_inputs:
                if flow_split:
                    # frame_buf is the flow-provider FEATURE ring
                    # (feat_buf, net, inp): the per-image encoders run
                    # once per NEW frame here instead of once per pair
                    # per frame in the stateless path (the flows
                    # themselves are not cacheable — the reference pairs
                    # the CURRENT frame with each previous one — but
                    # fnet features are)
                    from mfcnet_tpu.track.outputs import flow_ingest

                    feat_buf, _, _ = frame_buf
                    f_new, net, inp = flow_ingest(x, flow_model, fv)
                    frame_buf = (
                        jnp.concatenate(
                            [f_new[:, None], feat_buf[:, :-1]], axis=1
                        ),
                        net, inp,
                    )
                else:
                    # providers without split encoders (UnFlow): raw
                    # normalized-frame ring; fuse runs the stateless
                    # flow_for_window over it
                    frame_buf = jnp.concatenate(
                        [x[:, None], frame_buf[:, :-1]], axis=1
                    )
            return seg_buf, depth_buf, frame_buf

        def _outputs(probs):
            """Per-frame outputs, minimized for host transfer.

            'host' decode needs the class mask + the two tip heatmaps
            (classes 2 and 4); heatmaps ship as f16 (the σ=4 smoothing and
            local-max comparison are insensitive at 1e-3 granularity).
            'device' decode runs fully on device and ships 18 floats
            (+ the mask when score-thresholding or overlays need it).
            """
            if self._spatial is not None and not getattr(
                self, "_skip_gather", False
            ):
                # gather the height shards: the decode is a whole-image
                # computation (Pallas kernels see one block) and the host
                # fetches these outputs anyway. Skipped for pure stream
                # sharding + host decode (shards are already complete
                # per stream).
                import jax as _jax

                probs = _jax.lax.with_sharding_constraint(
                    probs, self._replicated
                )
            # threshold/argmax mask + decode-mode aux — shared with
            # ArtifactEngine so live and artifact serving cannot drift.
            # (Batched streams decode in one lockstep pass inside: leading
            # dims are native in decode_keypoints_device; a vmap here
            # would turn the Pallas/XLA fallback cond into a select that
            # executes BOTH decode paths every frame.)
            from mfcnet_tpu.track.outputs import outputs_from_probs

            return outputs_from_probs(probs, cfg)

        @jax.jit
        def fuse(seg_buf, depth_buf, frame_buf, wb):
            cv, fv = _cv(wb), _fv(wb)
            if use_s2d:
                from mfcnet_tpu.ops.fastconv import from_s2d

                logits = from_s2d(
                    model.apply(
                        cv, seg_buf, method="fuse_s2d", orig_hw=(H, W)
                    ),
                    4, H, W,
                )
            else:
                kwargs = (
                    {"depth": depth_buf} if cfg.add_depth_inputs else {}
                )
                if cfg.add_optflow_inputs:
                    if flow_split:
                        from mfcnet_tpu.track.outputs import (
                            flow_from_feature_ring,
                        )

                        kwargs["optflow"] = flow_from_feature_ring(
                            *frame_buf, (H, W), flow_model, fv,
                        )
                    else:
                        kwargs["optflow"] = compute_flow(frame_buf, fv)
                logits = model.apply(
                    cv, seg_buf, method="fuse_precomputed", **kwargs
                )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return _outputs(probs[0] if B == 1 else probs)

        @jax.jit
        def full(frames_u8, depth_u8, wb):
            # frames_u8: (T, H, W, 3) single-stream or (B, T, H, W, 3)
            cv, fv = _cv(wb), _fv(wb)
            x = frames_u8.astype(dtype) / 255.0
            x = (x - mean) / std
            if x.ndim == 4:
                x = x[None]
            kwargs = {}
            if cfg.add_depth_inputs:
                d = (depth_u8.astype(dtype) / 255.0)[..., None]
                kwargs["depth"] = d[None] if d.ndim == 4 else d
            if cfg.add_optflow_inputs:
                kwargs["optflow"] = compute_flow(x, fv)
            logits = model.apply(cv, x, **kwargs)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return _outputs(probs[0] if B == 1 else probs)

        @jax.jit
        def ingest_fuse(seg_buf, depth_buf, frame_buf, frame_u8, depth_u8,
                        wb):
            # one dispatch per post-warmup frame: the nested jitted
            # closures inline, so XLA compiles base forward + ring-buffer
            # roll + fusion head + outputs as ONE program
            seg_buf, depth_buf, frame_buf = ingest(
                seg_buf, depth_buf, frame_buf, frame_u8, depth_u8, wb
            )
            return (
                seg_buf, depth_buf, frame_buf,
                fuse(seg_buf, depth_buf, frame_buf, wb),
            )

        self._ingest, self._fuse, self._full = ingest, fuse, full
        self._ingest_fuse = ingest_fuse
        self._shapes = (H, W, T, C, dtype)
        # incremental + flow with split encoders: the frame ring is
        # replaced by a flow-provider FEATURE ring. Its seed entries are
        # provably never read — step_async only fuses after T ingests
        # (fused_dispatch ingests inside the same program before its
        # fuse), by which point every seed entry has rolled out — so
        # zeros of the right shape suffice; eval_shape gets the shapes
        # without compiling or running the flow encoders at construction
        self._flow_zero = None
        if flow_split and cfg.mode == "incremental":
            from mfcnet_tpu.track.outputs import flow_ingest

            shapes = jax.eval_shape(
                lambda z: flow_ingest(z, flow_model, flow_variables),
                jax.ShapeDtypeStruct((B, H, W, 3), dtype),
            )
            self._flow_zero = tuple(
                jnp.zeros(s.shape, s.dtype) for s in shapes
            )
        self._zero_depth = self._put(  # uploaded once
            jnp.zeros((H, W) if B == 1 else (B, H, W), jnp.uint8),
            0 if B == 1 else 1,
        )
        self.reset()

    def _put(self, x, h_axis):
        """Commit an array; with a mesh, shard its height/stream axes.

        Device-resident inputs (the bench's ``--source device`` path) must
        pass through without a host round trip: jnp.asarray is a no-op on
        a jax.Array, and np.ndim reads the rank without copying."""
        import jax

        if self._spatial is None:
            return jax.numpy.asarray(x)
        _, h_sharding = self._spatial
        return jax.device_put(x, h_sharding(np.ndim(x), h_axis))

    def reset(self):
        """Zero the ring buffers and warmup queue — start of a new video.
        Compiled executables are kept, so one engine can be reused across
        videos/trials without recompiling."""
        jnp = self._jnp
        H, W, T, C, dtype = self._shapes
        B = self.num_streams
        if self._use_s2d:
            self.seg_buf = self._put(
                jnp.zeros((B, H // 4, W // 4, T * 16 * C), dtype), 1
            )
        else:
            self.seg_buf = self._put(jnp.zeros((B, T, H, W, C), dtype), 2)
        if self.cfg.add_depth_inputs:
            self.depth_buf = self._put(
                jnp.zeros((B, T, H, W, 1), dtype), 2
            )
        else:  # placeholder: never read, never rolled (see ingest)
            self.depth_buf = jnp.zeros((B, 1, 1, 1, 1), dtype)
        if self._flow_zero is not None:
            import jax

            fz, nz, iz = self._flow_zero
            # the flow state is tiny (1/16-resolution features) and its
            # height need not divide spatial_shards — REPLICATE it
            # under a mesh instead of sharding (the flow solve at
            # h/16 x w/16 is negligible next to the sharded fusion)
            rep = (
                (lambda x: jax.device_put(x, self._replicated))
                if self._spatial is not None
                else jnp.asarray
            )
            self.frame_buf = (
                rep(jnp.repeat(fz[:, None], T, axis=1)),
                rep(nz),
                rep(iz),
            )
        else:
            self.frame_buf = self._put(
                jnp.zeros(
                    (B, T if self.cfg.add_optflow_inputs else 1, H, W, 3),
                    dtype,
                ),
                2,
            )
        self._frame_q = []
        self._depth_q = []

    def step_async(self, frame_u8, depth_u8=None):
        """Dispatch one frame; returns device handles (mask, aux) or None
        during warmup. No host synchronization — fetch with np.asarray.

        Single-stream engines take one (H, W, 3) frame; multi-stream
        engines (num_streams=B) take a lockstep (B, H, W, 3) stack and
        return (B, ...) outputs."""
        T = self.cfg.num_input_frames
        batched = self.num_streams > 1
        # height axis of an incoming frame/depth array
        hax = 1 if batched else 0
        if self.cfg.mode == "incremental":
            d = (
                self._zero_depth if depth_u8 is None
                else self._put(depth_u8, hax)
            )
            if (
                getattr(self.cfg, "fused_dispatch", False)
                and len(self._frame_q) >= T - 1
            ):
                # post-warmup: one dispatch does ingest + fuse
                (
                    self.seg_buf, self.depth_buf, self.frame_buf, out,
                ) = self._ingest_fuse(
                    self.seg_buf, self.depth_buf, self.frame_buf,
                    self._put(frame_u8, hax), d, self._wb,
                )
                self._frame_q.append(True)
                return out
            self.seg_buf, self.depth_buf, self.frame_buf = self._ingest(
                self.seg_buf, self.depth_buf, self.frame_buf,
                self._put(frame_u8, hax), d, self._wb,
            )
            self._frame_q.append(True)
            if len(self._frame_q) < T:
                return None
            return self._fuse(
                self.seg_buf, self.depth_buf, self.frame_buf, self._wb
            )
        # full mode: keep raw frames, newest-first stacking (reference :251)
        if depth_u8 is None:
            depth_u8 = np.zeros(
                frame_u8.shape[:-1] if batched else frame_u8.shape[:2],
                np.uint8,
            )
        self._frame_q.append(frame_u8)
        self._depth_q.append(depth_u8)
        if len(self._frame_q) > T:
            self._frame_q.pop(0)
            self._depth_q.pop(0)
        if len(self._frame_q) < T:
            return None
        # (T, H, W, 3) single-stream; (B, T, H, W, 3) batched
        stack = np.stack(self._frame_q[::-1], axis=1 if batched else 0)
        dstack = np.stack(self._depth_q[::-1], axis=1 if batched else 0)
        return self._full(
            self._put(stack, 2 if batched else 1),
            self._put(dstack, 2 if batched else 1),
            self._wb,
        )

    def step(self, frame_u8, depth_u8=None):
        """Synchronous step: (mask, aux[, *extras]) numpy arrays, or None
        in warmup (device-decode mode adds the f16 tip heats)."""
        out = self.step_async(frame_u8, depth_u8)
        if out is None:
            return None
        return tuple(np.asarray(v) for v in out)


class _ThreadedIter:
    """Background-thread iterator prefetch (bounded queue).

    Video decode (cv2/ffmpeg releases the GIL in its C core) overlaps
    device compute and host keypoint decode instead of serializing with
    them — the tracking analogue of data/loader.py's training Prefetcher.
    Exceptions from the producer re-raise at the consumer."""

    _END = object()

    def __init__(self, it, depth: int = 4):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = False

        def run():
            try:
                for item in it:
                    if self._stop:  # early consumer exit: stop decoding
                        break
                    self._q.put(item)
            except BaseException as e:  # re-raised at the consumer
                self._err = e
            finally:
                self._q.put(self._END)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            self._finished = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the producer, drain, and join so producer resources
        (e.g. cv2 captures) can be released safely even if the consumer
        stopped early — without decoding the rest of the video."""
        self._stop = True  # producer checks before each put
        if not getattr(self, "_finished", False):
            while self._q.get() is not self._END:
                pass
            self._finished = True
        self._t.join()


def _staged_fetch_loop(dispatch_seq, on_skip, consume, need_mask, K, jnp):
    """Shared device->host fetch pipeline for the tracking drivers.

    ``dispatch_seq`` yields (payload, handles_or_None) per frame step;
    handles are the engine's (mask, aux[, *extras]) device arrays.
    Outputs are STACKED on device in chunks of K and fetched in one
    transfer each, amortizing round-trip latency K-fold; the previous
    chunk is fetched before the current one is staged, so fetch overlaps
    device compute. Per-frame mask and extra handles (e.g. the tip heats
    in device-decode mode) stay alive UNFETCHED so the rare near-tie
    host-decode fallback can pull a single frame's data lazily.
    Keypoint rows are identical for any K.
    ``consume(payload, mask_np|None, aux_np, mask_handle, extras)``
    runs host-side per frame; ``on_skip(payload)`` handles warmup frames
    (flushed first to preserve row order)."""
    cur = []       # (payload, handles) dispatched, not yet stacked
    staged = None  # (payloads, masks|None, auxs, mask_handles, extras)

    def stage():
        nonlocal staged, cur
        if not cur:
            return
        payloads = [p for p, _ in cur]
        mask_handles = [h[0] for _, h in cur]
        masks = jnp.stack(mask_handles) if need_mask else None
        auxs = jnp.stack([h[1] for _, h in cur])
        extras = [h[2:] for _, h in cur]  # lazy, never stacked/fetched
        cur = []
        staged = (payloads, masks, auxs, mask_handles, extras)

    def fetch_staged():
        nonlocal staged
        if staged is None:
            return
        payloads, masks, auxs, mask_handles, extras = staged
        staged = None
        masks_np = np.asarray(masks) if masks is not None else None
        auxs_np = np.asarray(auxs)
        for k, payload in enumerate(payloads):
            consume(
                payload,
                masks_np[k] if masks_np is not None else None,
                auxs_np[k],
                mask_handles[k],
                extras[k],
            )

    for payload, handles in dispatch_seq:
        if handles is None:  # warmup frame — keep row order
            # drain pending work BEFORE staging: stage() first would
            # overwrite a non-empty `staged` chunk and silently drop its
            # frames (only reachable if a source emits warmup frames
            # mid-stream, but keep the helper correct for any sequence)
            fetch_staged()
            stage()
            fetch_staged()
            on_skip(payload)
            continue
        cur.append((payload, handles))
        if len(cur) >= K:
            fetch_staged()
            stage()
    fetch_staged()
    stage()
    fetch_staged()


def _track_stream(
    frame_iter,
    num_frames_total: int,
    name: str,
    engine: "InferenceEngine",
    cfg: TrackerConfig,
    output_dir,
    logger=None,
):
    """Shared per-frame pipeline over a ``(frame_rgb_u8, depth_u8|None)``
    iterator: device engine (normalize, base forward(s), fuse, softmax,
    argmax) -> host keypoint decode -> CSV/MP4. The iterator is pulled one
    frame AHEAD of host decode (1-frame pipeline), so frame acquisition +
    device dispatch overlap the previous frame's host-side work."""
    H, W = cfg.input_height, cfg.input_width
    engine.reset()  # fresh ring buffers per video; executables kept
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    writer = None
    if cfg.overlay:
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        writer = cv2.VideoWriter(
            str(output_dir / f"{name}_tracked.mp4"),
            fourcc,
            cfg.output_fps,
            (W, H),
        )

    tracker = KeypointTracker(num_frames_total, cfg)
    t_start = time.perf_counter()
    frames_done = 0
    # device decode ships 18 floats/frame; the class mask (H*W bytes) is
    # only fetched when something on host actually reads it (overlay
    # render or the host decode path)
    need_mask = cfg.overlay or cfg.decode != "device"
    K = max(1, cfg.fetch_batch)
    jnp = engine._jnp

    def consume_row(frame, mask_array, aux, mask_provider=None,
                    heat_provider=None):
        nonlocal frames_done
        disp = (
            render_overlay(np.asarray(frame), mask_array)
            if cfg.overlay else None
        )
        if cfg.decode == "device":
            tracker.update_device(aux, mask_array, disp,
                                  mask_provider=mask_provider,
                                  heat_provider=heat_provider)
        else:
            heats = aux.astype(np.float32)
            tracker.update(mask_array, heats[..., 1], heats[..., 0], disp)
        if writer is not None:
            writer.write(cv2.cvtColor(disp, cv2.COLOR_RGB2BGR))
        frames_done += 1

    def dispatch():
        for frame, dframe in frame_iter:
            yield frame, engine.step_async(frame, dframe)

    _staged_fetch_loop(
        dispatch(),
        on_skip=lambda frame: tracker.skip(),
        consume=lambda frame, mask_np, aux_np, mask_handle, extras: (
            consume_row(
                frame, mask_np, aux_np,
                mask_provider=(
                    (lambda h=mask_handle: h)
                    if cfg.decode_tie_fallback else None
                ),
                heat_provider=(
                    (lambda h=extras[0]: h)
                    if extras and cfg.decode_tie_fallback else None
                ),
            )
        ),
        need_mask=need_mask, K=K, jnp=jnp,
    )

    elapsed = time.perf_counter() - t_start
    if writer is not None:
        writer.release()
    csv_path = output_dir / f"{name}_tracked.csv"
    np.savetxt(csv_path, tracker.rows, delimiter=",")
    lmiss, rmiss = tracker.missing_rates
    if logger:
        logger.info(f"Saved tracked results to {csv_path}")
        logger.info(
            f"Missing centroids — left: {lmiss:.3f}, right: {rmiss:.3f}; "
            f"{frames_done / max(elapsed, 1e-9):.1f} frames/s"
        )
    return tracker.rows, frames_done / max(elapsed, 1e-9)


def track_on_video(
    video_path,
    model,
    variables,
    cfg: TrackerConfig,
    output_dir,
    depth_video_path=None,
    logger=None,
    flow_model=None,
    flow_variables=None,
    engine=None,
):
    """Track one video end to end; writes ``{name}_tracked.{csv,mp4}``.

    Per frame: host decode+resize -> device engine (normalize, base
    forward(s), fuse, softmax, argmax) -> host keypoint decode -> CSV/MP4.
    (Reference: test_multiframe_segmentation_on_videos_v3.py:198-315.)

    ``engine``: optional prebuilt engine (a reused ``InferenceEngine`` or
    a ``serve.ArtifactEngine`` driving a frozen artifact); ``model``/
    ``variables`` are ignored when given.
    """
    H, W = cfg.input_height, cfg.input_width
    if engine is None:
        engine = InferenceEngine(
            model, variables, cfg, flow_model=flow_model,
            flow_variables=flow_variables,
        )

    vid = cv2.VideoCapture(str(video_path))
    name = Path(video_path).stem
    N = int(vid.get(cv2.CAP_PROP_FRAME_COUNT))
    depth_vid = None
    if cfg.add_depth_inputs:
        depth_vid = cv2.VideoCapture(str(depth_video_path))
        nd = int(depth_vid.get(cv2.CAP_PROP_FRAME_COUNT))
        assert N == nd, f"RGB({N}) vs depth({nd}) frame-count mismatch"

    def frames():
        while True:
            ret, frame = vid.read()
            if not ret:
                return
            frame = cv2.resize(
                cv2.cvtColor(frame, cv2.COLOR_BGR2RGB), (W, H)
            )
            dframe = None
            if depth_vid is not None:
                retd, d = depth_vid.read()
                if not retd:
                    return
                dframe = cv2.resize(
                    cv2.cvtColor(d, cv2.COLOR_BGR2GRAY), (W, H)
                )
            yield frame, dframe

    it = _ThreadedIter(frames())  # decode overlaps device compute
    try:
        return _track_stream(
            it, N, name, engine, cfg, output_dir, logger
        )
    finally:
        it.close()
        vid.release()
        if depth_vid is not None:
            depth_vid.release()


def track_on_frames(
    frames,
    model,
    variables,
    cfg: TrackerConfig,
    output_dir,
    name: str = "frames",
    depth_frames=None,
    logger=None,
    flow_model=None,
    flow_variables=None,
    engine: Optional["InferenceEngine"] = None,
):
    """Track a sequence of already-decoded RGB frames (each (H, W, 3)
    uint8, host numpy or device-resident arrays) — the product pipeline
    without the video-decode stage: device inference -> keypoint decode ->
    CSV/MP4. Frames must already be at (cfg.input_height,
    cfg.input_width).

    Passing device-resident frames (pre-``jax.device_put``) removes the
    per-frame H2D transfer from the measured path as well — the bench's
    ``--source device`` configuration. ``engine`` can be supplied to reuse
    compiled executables across calls."""
    if engine is None:
        engine = InferenceEngine(
            model, variables, cfg, flow_model=flow_model,
            flow_variables=flow_variables,
        )

    def stream():
        for i, frame in enumerate(frames):
            yield frame, (
                depth_frames[i] if depth_frames is not None else None
            )

    return _track_stream(
        stream(), len(frames), name, engine, cfg, output_dir, logger
    )


def track_on_frame_streams(
    streams,
    model,
    variables,
    cfg: TrackerConfig,
    output_dir,
    names=None,
    depth_streams=None,
    logger=None,
    flow_model=None,
    flow_variables=None,
    engine: Optional["InferenceEngine"] = None,
    prestacked: bool = False,
    stream_shards: int = 1,
):
    """Track B videos CONCURRENTLY with one batched engine (production
    serving: aggregate throughput). The reference processes videos
    strictly sequentially (test_multiframe_segmentation_on_videos_v3.py:
    373-399, one track_on_video per file); here all B streams advance in
    lockstep — one batched dispatch per frame step instead of B — and
    each stream gets its own tracker state and ``{name}_tracked.csv``
    (+ overlay MP4 when cfg.overlay). Keypoint rows are identical to B
    independent single-stream engines (pinned by test).

    ``streams``: either a list of B frame sequences (each item (H, W, 3)
    uint8; lengths may DIFFER — shorter streams are padded device-side by
    repeating their last frame, with the padded steps' results discarded,
    so each stream's rows equal its own independent run), or — with
    ``prestacked=True`` — a sequence of N lockstep (B, H, W, 3) batches
    (host numpy or device-resident, the bench's zero-H2D configuration;
    necessarily equal-length). ``depth_streams`` mirrors the chosen
    layout ((H, W) items, or (B, H, W) batches).

    Returns (list of B per-stream row arrays, aggregate frames/s).
    """
    if prestacked:
        N = len(streams)
        B = int(np.asarray(streams[0]).shape[0]) if N else 0
        Ns = [N] * B

        def get_batch(i):
            return streams[i]

        def get_depth(i):
            return depth_streams[i] if depth_streams is not None else None
    else:
        B = len(streams)
        Ns = [len(s) for s in streams]
        N = max(Ns) if B else 0
        _zf = np.zeros(
            (cfg.input_height, cfg.input_width, 3), np.uint8
        )  # stand-in for empty streams (their results are never consumed)
        _zd = _zf[..., 0]

        def _pad_get(seqs, i, zero):
            return np.stack([
                np.asarray(s[min(i, len(s) - 1)]) if len(s) else zero
                for s in seqs
            ])

        def get_batch(i):
            # repeat-last-frame padding for exhausted streams
            return _pad_get(streams, i, _zf)

        def get_depth(i):
            if depth_streams is None:
                return None
            return _pad_get(depth_streams, i, _zd)

    names = list(names) if names is not None else [
        f"stream{b}" for b in range(B)
    ]
    assert len(names) == B
    if B == 1:
        # a 1-stream engine squeezes its outputs (single-stream layout);
        # delegate to the single-stream driver for identical behavior
        frames = [x[0] for x in streams] if prestacked else streams[0]
        dframes = None
        if depth_streams is not None:
            dframes = (
                [x[0] for x in depth_streams] if prestacked
                else depth_streams[0]
            )
        rows, fps = track_on_frames(
            frames, model, variables, cfg, output_dir, name=names[0],
            depth_frames=dframes, logger=logger, flow_model=flow_model,
            flow_variables=flow_variables, engine=engine,
        )
        return [rows], fps
    if engine is None:
        engine = InferenceEngine(
            model, variables, cfg, flow_model=flow_model,
            flow_variables=flow_variables, num_streams=B,
            stream_shards=stream_shards,
        )
    assert engine.num_streams == B, (
        f"engine has num_streams={engine.num_streams}, need {B}"
    )
    engine.reset()
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    H, W = cfg.input_height, cfg.input_width
    writers = None
    if cfg.overlay:
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        writers = [
            cv2.VideoWriter(
                str(output_dir / f"{name}_tracked.mp4"), fourcc,
                cfg.output_fps, (W, H),
            )
            for name in names
        ]

    trackers = [KeypointTracker(Ns[b], cfg) for b in range(B)]
    t_start = time.perf_counter()
    frames_done = 0
    need_mask = cfg.overlay or cfg.decode != "device"
    K = max(1, cfg.fetch_batch)
    jnp = engine._jnp

    # host-side decode of different streams at the same timestep is
    # independent (per-stream tracker state); the exact host decode
    # (cv2 contours + scipy smoothing, GIL-releasing C cores) is the
    # expensive part, so fan it out across streams
    pool = None
    if cfg.decode != "device" and B > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=min(B, 8))

    def _consume_one(b, idx, frame_batch, masks_np, aux_np, mask_handle,
                     heat_handle=None):
        disp = (
            render_overlay(np.asarray(frame_batch[b]), masks_np[b])
            if cfg.overlay else None
        )
        if cfg.decode == "device":
            trackers[b].update_device(
                aux_np[b],
                masks_np[b] if masks_np is not None else None,
                disp,
                mask_provider=(
                    None
                    if mask_handle is None or not cfg.decode_tie_fallback
                    else (lambda h=mask_handle, bb=b: h[bb])
                ),
                heat_provider=(
                    None
                    if heat_handle is None or not cfg.decode_tie_fallback
                    else (lambda h=heat_handle, bb=b: h[bb])
                ),
            )
        else:
            heats = aux_np[b].astype(np.float32)
            trackers[b].update(
                masks_np[b], heats[..., 1], heats[..., 0], disp
            )
        if writers is not None:
            writers[b].write(cv2.cvtColor(disp, cv2.COLOR_RGB2BGR))

    def consume_step(idx, frame_batch, masks_np, aux_np, mask_handle=None,
                     heat_handle=None):
        """One lockstep frame across all streams still active at idx."""
        nonlocal frames_done
        active = [b for b in range(B) if idx < Ns[b]]
        if pool is not None:
            list(pool.map(
                lambda b: _consume_one(
                    b, idx, frame_batch, masks_np, aux_np, mask_handle,
                    heat_handle,
                ),
                active,
            ))
        else:
            for b in active:
                _consume_one(
                    b, idx, frame_batch, masks_np, aux_np, mask_handle,
                    heat_handle,
                )
        frames_done += len(active)

    def on_skip(payload):
        idx, _ = payload
        for b, tr in enumerate(trackers):
            if idx < Ns[b]:
                tr.skip()

    def dispatch():
        for i in range(N):
            batch = get_batch(i)
            yield (i, batch), engine.step_async(batch, get_depth(i))

    _staged_fetch_loop(
        dispatch(),
        on_skip=on_skip,
        consume=lambda payload, mask_np, aux_np, mask_handle, extras: (
            consume_step(
                payload[0], payload[1], mask_np, aux_np,
                mask_handle=mask_handle,
                heat_handle=extras[0] if extras else None,
            )
        ),
        need_mask=need_mask, K=K, jnp=jnp,
    )

    elapsed = time.perf_counter() - t_start
    if pool is not None:
        pool.shutdown(wait=True)
    if writers is not None:
        for w in writers:
            w.release()
    all_rows = []
    for b, name in enumerate(names):
        csv_path = output_dir / f"{name}_tracked.csv"
        np.savetxt(csv_path, trackers[b].rows, delimiter=",")
        all_rows.append(trackers[b].rows)
    agg_fps = frames_done / max(elapsed, 1e-9)
    if logger:
        logger.info(
            f"Tracked {B} streams x {N} frames concurrently: "
            f"{agg_fps:.1f} frames/s aggregate "
            f"({agg_fps / max(B, 1):.1f} per stream)"
        )
    return all_rows, agg_fps
