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
        self.rows = np.full((num_frames_total, 12), np.nan)
        self.left = _SideState()
        self.right = _SideState()
        self.count = 0

    def update(self, mask_array, left_tip_heat, right_tip_heat,
               disp_image=None):
        row = self.rows[self.count]
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
                      mask_provider=None):
        """Update from on-device decoded keypoints (2, 3, 3):
        [side l/r][tip1, tip2, base][x, y, valid]. Applies the same
        distance gate and 2-tip temporal assignment as the host path.

        A base valid field of 2 flags a NEAR-TIE between the two largest
        components (decode_base_device): the device Pick-area ranking
        could disagree with cv2's there, so the base is recomputed with
        the exact host contour decode from the class mask —
        ``mask_array`` directly, or fetched lazily via ``mask_provider``
        (a zero-arg callable; lets the fast path skip the mask transfer
        on the overwhelming majority of frames with no tie)."""
        row = self.rows[self.count]
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
            if bvalid >= 2:  # near-tie -> exact host fallback
                m = mask_array
                if m is None and mask_provider is not None:
                    m = np.asarray(mask_provider())
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
                 flow_model=None, flow_variables=None):
        """``flow_model``/``flow_variables``: optional frozen flow provider
        (a RAFT module) used when cfg.add_optflow_inputs — the reference
        computes flow between the newest frame and each previous frame at
        0.5x resolution, then rescales the flow x2 with bilinear
        align_corners=True (test_multiframe_segmentation_on_videos_v3.py:
        264-271)."""
        import jax
        import jax.numpy as jnp

        self.cfg = cfg
        H, W, T, C = (
            cfg.input_height, cfg.input_width,
            cfg.num_input_frames, cfg.num_classes,
        )
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self._jnp = jnp
        cvars = jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            variables,
        )
        mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], dtype)

        H2, W2 = H // 2, W // 2

        def compute_flow(frames_norm):
            """(1, T, H, W, 3) normalized frames -> (1, T-1, H, W, 2) flow
            (reference v3: flow(newest_half, frame_i_half), upscaled x2
            bilinear align_corners=True, values /0.5).

            The T-1 pairs run as ONE batched forward — every op in the
            provider is per-sample at eval (convs, instance norm, BN with
            running stats), so this is numerically identical to the
            reference's per-pair loop at a third of the dispatches."""
            from mfcnet_tpu.ops.resize import resize_bilinear, resize_nearest

            Tn = cfg.num_input_frames
            assert frames_norm.shape[0] == 1  # engine streams one video
            half = resize_nearest(frames_norm, H2, W2)
            a = jnp.repeat(half[:, 0], Tn - 1, axis=0)
            b = half[0, 1:Tn]
            fl = flow_model.apply(flow_variables, a, b)  # (T-1, H2, W2, 2)
            fl = resize_bilinear(fl / 0.5, H, W, align_corners=True)
            return fl[None]

        # streaming fast path: with no flow/depth inputs the per-frame seg
        # ring buffer lives in the space-to-depth domain (zero layout
        # transposes per frame; see MultiFrameHead) — outputs identical
        use_s2d = (
            not cfg.add_optflow_inputs and not cfg.add_depth_inputs
            and cfg.mode == "incremental" and H % 4 == 0 and W % 4 == 0
        )
        self._use_s2d = use_s2d

        @jax.jit
        def ingest(seg_buf, depth_buf, frame_buf, frame_u8, depth_u8):
            x = frame_u8.astype(dtype) / 255.0
            x = ((x - mean) / std)[None]
            if use_s2d:
                seg_new = model.apply(cvars, x, method="base_forward_s2d")
                seg_buf = jnp.concatenate(
                    [seg_new, seg_buf[..., : (T - 1) * 16 * C]], axis=-1
                )
            else:
                seg_new = model.apply(cvars, x, method="base_forward")
                seg_buf = jnp.concatenate(
                    [seg_new[:, None], seg_buf[:, :-1]], axis=1
                )
            d = (depth_u8.astype(dtype) / 255.0)[None, ..., None]
            depth_buf = jnp.concatenate(
                [d[:, None], depth_buf[:, :-1]], axis=1
            )
            if cfg.add_optflow_inputs:
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
            if cfg.score_detection_threshold > 0:
                # per-class score threshold, higher classes overwrite
                # (reference :282-289), computed on device
                mask = jnp.zeros(probs.shape[:2], jnp.uint8)
                for cls in range(1, probs.shape[-1]):
                    mask = jnp.where(
                        probs[..., cls] > cfg.score_detection_threshold,
                        jnp.uint8(cls), mask,
                    )
            else:
                mask = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
            if cfg.decode == "device":
                from mfcnet_tpu.track.decode_device import (
                    decode_keypoints_device,
                )

                kps = decode_keypoints_device(
                    probs, int(cfg.area_threshold * 10),
                    pred=mask.astype(jnp.int32),
                )
                return mask, kps
            heats = jnp.stack(
                [probs[..., 2], probs[..., 4]], axis=-1
            ).astype(jnp.float16)
            return mask, heats

        @jax.jit
        def fuse(seg_buf, depth_buf, frame_buf):
            if use_s2d:
                from mfcnet_tpu.ops.fastconv import from_s2d

                logits = from_s2d(
                    model.apply(
                        cvars, seg_buf, method="fuse_s2d", orig_hw=(H, W)
                    ),
                    4, H, W,
                )
            else:
                kwargs = (
                    {"depth": depth_buf} if cfg.add_depth_inputs else {}
                )
                if cfg.add_optflow_inputs:
                    kwargs["optflow"] = compute_flow(frame_buf)
                logits = model.apply(
                    cvars, seg_buf, method="fuse_precomputed", **kwargs
                )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0]
            return _outputs(probs)

        @jax.jit
        def full(frames_u8, depth_u8):
            x = frames_u8.astype(dtype) / 255.0
            x = ((x - mean) / std)[None]
            kwargs = {}
            if cfg.add_depth_inputs:
                kwargs["depth"] = (
                    depth_u8.astype(dtype) / 255.0
                )[None, ..., None]
            if cfg.add_optflow_inputs:
                kwargs["optflow"] = compute_flow(x)
            logits = model.apply(cvars, x, **kwargs)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0]
            return _outputs(probs)

        self._ingest, self._fuse, self._full = ingest, fuse, full
        self._shapes = (H, W, T, C, dtype)
        self._zero_depth = jnp.zeros((H, W), jnp.uint8)  # uploaded once
        self.reset()

    def reset(self):
        """Zero the ring buffers and warmup queue — start of a new video.
        Compiled executables are kept, so one engine can be reused across
        videos/trials without recompiling."""
        jnp = self._jnp
        H, W, T, C, dtype = self._shapes
        if self._use_s2d:
            self.seg_buf = jnp.zeros(
                (1, H // 4, W // 4, T * 16 * C), dtype
            )
        else:
            self.seg_buf = jnp.zeros((1, T, H, W, C), dtype)
        self.depth_buf = jnp.zeros((1, T, H, W, 1), dtype)
        self.frame_buf = jnp.zeros(
            (1, T if self.cfg.add_optflow_inputs else 1, H, W, 3), dtype
        )
        self._frame_q = []
        self._depth_q = []

    def step_async(self, frame_u8, depth_u8=None):
        """Dispatch one frame; returns device handles (mask, aux) or None
        during warmup. No host synchronization — fetch with np.asarray."""
        jnp = self._jnp
        T = self.cfg.num_input_frames
        if self.cfg.mode == "incremental":
            d = (
                self._zero_depth if depth_u8 is None
                else jnp.asarray(depth_u8)
            )
            self.seg_buf, self.depth_buf, self.frame_buf = self._ingest(
                self.seg_buf, self.depth_buf, self.frame_buf,
                jnp.asarray(frame_u8), d,
            )
            self._frame_q.append(True)
            if len(self._frame_q) < T:
                return None
            return self._fuse(self.seg_buf, self.depth_buf, self.frame_buf)
        # full mode: keep raw frames, newest-first stacking (reference :251)
        if depth_u8 is None:
            depth_u8 = np.zeros(frame_u8.shape[:2], np.uint8)
        self._frame_q.append(frame_u8)
        self._depth_q.append(depth_u8)
        if len(self._frame_q) > T:
            self._frame_q.pop(0)
            self._depth_q.pop(0)
        if len(self._frame_q) < T:
            return None
        stack = np.stack(self._frame_q[::-1])
        dstack = np.stack(self._depth_q[::-1])
        return self._full(jnp.asarray(stack), jnp.asarray(dstack))

    def step(self, frame_u8, depth_u8=None):
        """Synchronous step: (mask, aux) numpy arrays, or None in warmup."""
        out = self.step_async(frame_u8, depth_u8)
        if out is None:
            return None
        mask, aux = out
        return np.asarray(mask), np.asarray(aux)


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
    cur = []       # (frame, handles) dispatched, not yet stacked
    staged = None  # (frames, mask_stack|None, aux_stack) device handles

    def consume_row(frame, mask_array, aux, mask_provider=None):
        nonlocal frames_done
        disp = (
            render_overlay(np.asarray(frame), mask_array)
            if cfg.overlay else None
        )
        if cfg.decode == "device":
            tracker.update_device(aux, mask_array, disp,
                                  mask_provider=mask_provider)
        else:
            heats = aux.astype(np.float32)
            tracker.update(mask_array, heats[..., 1], heats[..., 0], disp)
        if writer is not None:
            writer.write(cv2.cvtColor(disp, cv2.COLOR_RGB2BGR))
        frames_done += 1

    def stage():
        """Stack the current batch's outputs on device (async) — turns K
        per-frame fetches into one transfer each for masks and aux. The
        per-frame mask handles stay alive (device-side) so the rare
        near-tie host fallback can fetch one lazily."""
        nonlocal staged, cur
        if not cur:
            return
        frames = [f for f, _ in cur]
        mask_handles = [h[0] for _, h in cur]
        masks = jnp.stack(mask_handles) if need_mask else None
        auxs = jnp.stack([h[1] for _, h in cur])
        cur = []
        staged = (frames, masks, auxs, mask_handles)

    def fetch_staged():
        nonlocal staged
        if staged is None:
            return
        frames, masks, auxs, mask_handles = staged
        staged = None
        masks_np = np.asarray(masks) if masks is not None else None
        auxs_np = np.asarray(auxs)
        for i, frame in enumerate(frames):
            consume_row(
                frame, masks_np[i] if masks_np is not None else None,
                auxs_np[i],
                mask_provider=(lambda h=mask_handles[i]: h),
            )

    for frame, dframe in frame_iter:
        handles = engine.step_async(frame, dframe)
        if handles is None:  # warmup frame — keep row order
            stage()
            fetch_staged()
            tracker.skip()
            continue
        cur.append((frame, handles))
        if len(cur) >= K:
            # fetch the PREVIOUS batch (its device work is long done)
            # before staging this one: one batch of fetch/compute overlap
            fetch_staged()
            stage()
    fetch_staged()
    stage()
    fetch_staged()

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
):
    """Track one video end to end; writes ``{name}_tracked.{csv,mp4}``.

    Per frame: host decode+resize -> device engine (normalize, base
    forward(s), fuse, softmax, argmax) -> host keypoint decode -> CSV/MP4.
    (Reference: test_multiframe_segmentation_on_videos_v3.py:198-315.)
    """
    H, W = cfg.input_height, cfg.input_width
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

    try:
        return _track_stream(
            frames(), N, name, engine, cfg, output_dir, logger
        )
    finally:
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
