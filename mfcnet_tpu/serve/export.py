"""AOT model export for serving — ``jax.export`` StableHLO artifacts.

The reference has no deployment story beyond "run the Python scripts on a
CUDA box" (scripts/test_multiframe_segmentation_on_videos_v3.py). On TPU
the XLA-native equivalent is ahead-of-time export: lower the full
inference function (uint8 frames -> class probabilities, weights baked in
as StableHLO constants) once, serialize it, and serve the artifact from
any process — no Flax model code, no checkpoint plumbing, no Python-side
retracing. ``jax.export`` guarantees cross-version loading (the StableHLO
forward-compatibility window) and cross-platform lowering, so one file
produced on a CPU dev box runs on the TPU fleet.

Artifact = one file: magic, JSON meta header (shapes, dtype, platforms,
producer versions), then the serialized ``jax.export.Exported`` bytes.

Exported semantics match the reference's full per-window forward
(scripts/test_multiframe_segmentation_on_videos_v3.py:251-281): frames
stacked NEWEST-first, /255, ImageNet normalize, optional depth channels,
optional in-graph optical flow (provider at 0.5x resolution, flow
upscaled 2x bilinear align_corners=True, values /0.5 — v3:264-271),
softmax class probabilities in float32. The batch dimension is exported
SYMBOLIC by default, so one artifact serves any batch size.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Optional, Sequence

_MAGIC = b"MFCNETX1"


def _export_with_fallback(export_fn):
    """Try ('tpu', 'cpu') cross-platform lowering; fall back to the
    current default platform only for lowering failures, and say so —
    a silent downgrade would produce an artifact that refuses to load on
    the other platform with no record of why."""
    import logging

    try:
        return export_fn(("tpu", "cpu"))
    except Exception as e:
        logging.getLogger(__name__).warning(
            "cross-platform ('tpu', 'cpu') export failed (%s: %s); "
            "falling back to the current default platform only — the "
            "artifact will not load on other platforms", type(e).__name__, e,
        )
        return export_fn(None)


def make_serving_fn(
    model,
    variables,
    *,
    dtype: str = "bfloat16",
    add_depth_inputs: bool = False,
    flow_model=None,
    flow_variables=None,
):
    """Build the pure serving function ``fn(frames_u8[, depth_u8]) -> probs``.

    ``frames_u8``: (B, T, H, W, 3) uint8 RGB, newest frame first (the
    reference stacks the rolling window newest-first,
    test_multiframe_segmentation_on_videos_v3.py:251-259).
    ``depth_u8`` (only when ``add_depth_inputs``): (B, T, H, W) uint8.
    Returns (B, H, W, C) float32 softmax probabilities.

    Weights are captured by closure — ``jax.export`` bakes them into the
    artifact as constants (a self-contained frozen model). Floating-point
    weights are cast to ``dtype`` first, matching the live
    ``InferenceEngine`` (track/tracker.py).
    """
    import jax
    import jax.numpy as jnp

    from mfcnet_tpu.utils.jitinit import cast_floats

    if (flow_model is None) != (flow_variables is None):
        raise ValueError(
            "flow_model and flow_variables must be given together"
        )
    cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    cvars = cast_floats(variables, cdtype)
    if flow_model is not None:
        flow_vars = cast_floats(flow_variables, cdtype)
    mean = jnp.asarray([0.485, 0.456, 0.406], cdtype)
    std = jnp.asarray([0.229, 0.224, 0.225], cdtype)

    def compute_flow(frames_norm):
        # reference v3 half-res flow semantics — the ONE definition,
        # shared with InferenceEngine so live and artifact flow match
        from mfcnet_tpu.track.outputs import flow_for_window

        return flow_for_window(frames_norm, flow_model, flow_vars)

    if add_depth_inputs:

        def serving_fn(frames_u8, depth_u8):
            x = frames_u8.astype(cdtype) / 255.0
            x = (x - mean) / std
            kwargs = {"depth": (depth_u8.astype(cdtype) / 255.0)[..., None]}
            if flow_model is not None:
                kwargs["optflow"] = compute_flow(x)
            logits = model.apply(cvars, x, **kwargs)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    else:

        def serving_fn(frames_u8):
            x = frames_u8.astype(cdtype) / 255.0
            x = (x - mean) / std
            kwargs = {}
            if flow_model is not None:
                kwargs["optflow"] = compute_flow(x)
            logits = model.apply(cvars, x, **kwargs)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return serving_fn


def make_singleframe_serving_fn(
    model,
    variables,
    output_mode: str,
    dtype: str = "bfloat16",
):
    """Serving fn for a SINGLE-FRAME model: (B, H, W, 3) uint8 -> (B, H,
    W, C) float32 softmax probs. ``output_mode`` is the registry's
    per-family adapter (reference train_toolpose_segmentation.py:160-170):
    'log_probs' (TernausNet/SegFormer emit log-probs) or 'logits'
    (HRNet/DeepLab/FCN/UNet/ResUNet). TAPNet is not exportable — its
    motion-prior attention-map input is produced by the host-side warp
    pipeline (data/attmap.py), not by the graph."""
    import jax
    import jax.numpy as jnp

    from mfcnet_tpu.utils.jitinit import cast_floats

    if output_mode not in ("log_probs", "logits"):
        raise ValueError(
            f"output_mode {output_mode!r} not exportable "
            "(TAPNet needs the host attmap pipeline)"
        )
    cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    cvars = cast_floats(variables, cdtype)
    mean = jnp.asarray([0.485, 0.456, 0.406], cdtype)
    std = jnp.asarray([0.229, 0.224, 0.225], cdtype)

    def serving_fn(frames_u8):
        x = (frames_u8.astype(cdtype) / 255.0 - mean) / std
        out = model.apply(cvars, x)
        # EXACTLY the live single-frame video CLI's math incl. dtype
        # boundaries (test_toolpose_segmentation_on_videos.py dev_step:
        # log_softmax in compute dtype, exp in f32) — the artifact's CSV
        # parity with the checkpoint run is pinned bitwise by test
        if output_mode == "logits":
            out = jax.nn.log_softmax(out, axis=-1)
        return jnp.exp(out.astype(jnp.float32))

    return serving_fn


def export_singleframe(
    model,
    variables,
    *,
    height: int,
    width: int,
    output_mode: str,
    dtype: str = "bfloat16",
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Export a single-frame segmentation model (symbolic batch by
    default). Returns ``jax.export.Exported``."""
    import jax
    from jax import export as jexport

    fn = make_singleframe_serving_fn(
        model, variables, output_mode, dtype=dtype
    )
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    specs = [
        jax.ShapeDtypeStruct((b, height, width, 3), jax.numpy.uint8)
    ]

    def _export(plats):
        return jexport.export(jax.jit(fn), platforms=plats)(*specs)

    if platforms is not None:
        return _export(tuple(platforms))
    return _export_with_fallback(_export)


def export_serving(
    model,
    variables,
    *,
    height: int,
    width: int,
    num_frames: int,
    dtype: str = "bfloat16",
    add_depth_inputs: bool = False,
    flow_model=None,
    flow_variables=None,
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Lower + export the serving function. Returns ``jax.export.Exported``.

    ``batch=None`` exports a SYMBOLIC batch dimension (one artifact, any
    batch size); an int pins it. ``platforms=None`` tries
    ``("tpu", "cpu")`` cross-platform lowering and falls back to the
    current default platform if some op refuses to lower for an absent
    backend.
    """
    import jax
    from jax import export as jexport

    fn = make_serving_fn(
        model, variables, dtype=dtype, add_depth_inputs=add_depth_inputs,
        flow_model=flow_model, flow_variables=flow_variables,
    )
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    specs = [
        jax.ShapeDtypeStruct(
            (b, num_frames, height, width, 3), jax.numpy.uint8
        )
    ]
    if add_depth_inputs:
        specs.append(
            jax.ShapeDtypeStruct(
                (b, num_frames, height, width), jax.numpy.uint8
            )
        )

    def _export(plats):
        return jexport.export(jax.jit(fn), platforms=plats)(*specs)

    if platforms is not None:
        return _export(tuple(platforms))
    return _export_with_fallback(_export)


def save_exported(path, exported, meta: Optional[dict] = None) -> dict:
    """Write the artifact file; returns the full header written."""
    import jax

    data = exported.serialize()
    header = {
        "format": "mfcnet_tpu.serve/1",
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "calling_convention_version": exported.calling_convention_version,
        "jax_version": jax.__version__,
    }
    header.update(meta or {})
    hdr = json.dumps(header).encode("utf-8")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(hdr)))
        f.write(hdr)
        f.write(struct.pack("<Q", len(data)))
        f.write(data)
    tmp.replace(path)
    return header


class LoadedServing:
    """A deserialized artifact: ``loaded(frames_u8[, depth_u8]) -> probs``.

    ``meta`` is the JSON header; ``exported`` the ``jax.export.Exported``.
    The call goes through ``Exported.call`` under ONE ``jax.jit`` owned by
    this instance — a bare ``exported.call(*args)`` builds a fresh wrapper
    per invocation, so the jit cache (keyed on function identity) misses
    and every frame pays a full retrace; the instance-held jit makes
    repeat shapes dispatch-cached. Runs on whatever platform the process
    uses, provided it is in ``meta['platforms']``.
    """

    def __init__(self, meta: dict, exported):
        import jax

        self.meta = meta
        self.exported = exported
        self._call = jax.jit(lambda *args: exported.call(*args))

    def __call__(self, *args):
        return self._call(*args)


def make_incremental_step(
    model,
    variables,
    *,
    height: int,
    width: int,
    num_frames: int,
    num_classes: int,
    dtype: str = "bfloat16",
    add_depth_inputs: bool = False,
):
    """Build the PRODUCT serving step: incremental tracking with an
    explicit ring buffer — one base-model forward per frame instead of T
    (the reference recomputes all T,
    test_multiframe_segmentation_on_videos_v3.py:251-281; incremental ≡
    full is pinned in tests/test_tracker.py).

    Returns ``(step, state_spec)``:

    - without depth: ``step(seg_buf, frame_u8) -> (seg_buf', probs)``,
      seg_buf in the space-to-depth domain (B, H/4, W/4, T*16*C) — the
      zero-layout-transpose fast path the live ``InferenceEngine`` uses;
    - with depth: ``step(seg_buf, depth_buf, frame_u8, depth_u8) ->
      (seg_buf', depth_buf', probs)``, seg_buf (B, T, H, W, C).

    ``state_spec`` maps buffer name -> (shape-with-None-batch, dtype str);
    start each stream from zeros (``zero_state``) and ignore probs for
    the first T-1 warmup frames, exactly like ``InferenceEngine``.
    """
    import jax
    import jax.numpy as jnp

    from mfcnet_tpu.utils.jitinit import cast_floats

    H, W, T, C = height, width, num_frames, num_classes
    cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    cvars = cast_floats(variables, cdtype)
    mean = jnp.asarray([0.485, 0.456, 0.406], cdtype)
    std = jnp.asarray([0.229, 0.224, 0.225], cdtype)
    use_s2d = not add_depth_inputs and H % 4 == 0 and W % 4 == 0

    def _norm(frame_u8):
        x = frame_u8.astype(cdtype) / 255.0
        return (x - mean) / std

    if use_s2d:

        def step(seg_buf, frame_u8):
            from mfcnet_tpu.ops.fastconv import from_s2d

            x = _norm(frame_u8)
            seg_new = model.apply(cvars, x, method="base_forward_s2d")
            seg_buf = jnp.concatenate(
                [seg_new, seg_buf[..., : (T - 1) * 16 * C]], axis=-1
            )
            logits = from_s2d(
                model.apply(
                    cvars, seg_buf, method="fuse_s2d", orig_hw=(H, W)
                ),
                4, H, W,
            )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return seg_buf, probs

        state_spec = {
            "seg_buf": ((None, H // 4, W // 4, T * 16 * C), dtype),
        }
    elif add_depth_inputs:

        def step(seg_buf, depth_buf, frame_u8, depth_u8):
            x = _norm(frame_u8)
            seg_new = model.apply(cvars, x, method="base_forward")
            seg_buf = jnp.concatenate(
                [seg_new[:, None], seg_buf[:, :-1]], axis=1
            )
            d = (depth_u8.astype(cdtype) / 255.0)[..., None]
            depth_buf = jnp.concatenate(
                [d[:, None], depth_buf[:, :-1]], axis=1
            )
            logits = model.apply(
                cvars, seg_buf, method="fuse_precomputed", depth=depth_buf
            )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return seg_buf, depth_buf, probs

        state_spec = {
            "seg_buf": ((None, T, H, W, C), dtype),
            "depth_buf": ((None, T, H, W, 1), dtype),
        }
    else:
        # no depth, but H or W not divisible by 4: plain (non-s2d) ring
        # buffer, no depth arguments at all (the model was built without
        # depth inputs — feeding it a zero depth channel would be wrong)

        def step(seg_buf, frame_u8):
            x = _norm(frame_u8)
            seg_new = model.apply(cvars, x, method="base_forward")
            seg_buf = jnp.concatenate(
                [seg_new[:, None], seg_buf[:, :-1]], axis=1
            )
            logits = model.apply(
                cvars, seg_buf, method="fuse_precomputed"
            )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return seg_buf, probs

        state_spec = {
            "seg_buf": ((None, T, H, W, C), dtype),
        }
    return step, state_spec


def export_incremental(
    model,
    variables,
    *,
    height: int,
    width: int,
    num_frames: int,
    num_classes: int,
    dtype: str = "bfloat16",
    add_depth_inputs: bool = False,
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the incremental step. Returns ``(Exported, state_spec)``."""
    import jax
    from jax import export as jexport

    step, state_spec = make_incremental_step(
        model, variables, height=height, width=width,
        num_frames=num_frames, num_classes=num_classes, dtype=dtype,
        add_depth_inputs=add_depth_inputs,
    )
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    jnp = jax.numpy
    cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    specs = [
        jax.ShapeDtypeStruct((b,) + tuple(shape[1:]), cdtype)
        for shape, _ in state_spec.values()
    ]
    specs.append(
        jax.ShapeDtypeStruct((b, height, width, 3), jnp.uint8)
    )
    if add_depth_inputs:
        specs.append(jax.ShapeDtypeStruct((b, height, width), jnp.uint8))

    def _export(plats):
        return jexport.export(jax.jit(step), platforms=plats)(*specs)

    if platforms is not None:
        exported = _export(tuple(platforms))
    else:
        exported = _export_with_fallback(_export)
    return exported, state_spec


def zero_state(meta: dict, batch: int = 1):
    """Zero ring buffers for an incremental artifact, from its header
    (start of a new stream — the analogue of ``InferenceEngine.reset``)."""
    import jax.numpy as jnp

    spec = meta.get("state")
    if not spec:
        raise ValueError("not an incremental artifact (no 'state' header)")
    return [
        jnp.zeros(
            tuple(batch if s is None else s for s in shape),
            jnp.bfloat16 if dt == "bfloat16" else dt,
        )
        for shape, dt in spec.values()
    ]


def load_exported(path) -> LoadedServing:
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(
                f"{path}: not an mfcnet_tpu serving artifact "
                f"(magic {magic!r})"
            )
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        (dlen,) = struct.unpack("<Q", f.read(8))
        data = f.read(dlen)
    return LoadedServing(meta, jexport.deserialize(data))
