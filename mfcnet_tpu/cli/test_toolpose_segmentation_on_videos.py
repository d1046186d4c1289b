"""Single-frame per-video tracking CLI (reference:
scripts/test_toolpose_segmentation_on_videos_v2.py): same decode/tracking
pipeline as the multi-frame variant but with a per-frame segmentation model
(no temporal window).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

import cv2
import jax
import numpy as np

from mfcnet_tpu.cli.test_multiframe_segmentation_on_videos import (
    list_video_files,
)
from mfcnet_tpu.cli.train_toolpose_segmentation import OUTPUT_MODES
from mfcnet_tpu.models import get_tooltip_segmentation_model
from mfcnet_tpu.track.tracker import (
    KeypointTracker,
    TrackerConfig,
    render_overlay,
)
from mfcnet_tpu.utils.checkpoint import load_checkpoint
from mfcnet_tpu.utils.jitinit import jit_init


def build_parser():
    p = argparse.ArgumentParser(
        description="Test Single-frame Segmentation Model on Videos"
    )
    p.add_argument("--videos_dir", type=str, required=True)
    p.add_argument("--expt_savedir", type=str, required=True)
    p.add_argument("--expt_name", type=str, required=True)
    p.add_argument("--model_type", type=str, default=None,
                   choices=list(OUTPUT_MODES))
    p.add_argument("--load_wts_model", type=str, default=None)
    p.add_argument("--artifact", type=str, default=None,
                   help="track from a frozen single-frame serving "
                        "artifact (cli.export_model --task singleframe) "
                        "instead of model code + checkpoint (both --decode "
                        "modes work)")
    p.add_argument("--use_ema", type=lambda v: v.lower() in ("true", "1"),
                   default=False,
                   help="track with the checkpoint's EMA weights "
                        "(written by training with --ema_decay)")
    p.add_argument("--num_videos", type=int, default=-1)
    p.add_argument("--input_width", type=int, default=640)
    p.add_argument("--input_height", type=int, default=480)
    p.add_argument("--score_detection_threshold", type=float, default=0)
    p.add_argument("--area_threshold", type=int, default=10)
    p.add_argument("--dist_threshold", type=int, default=40)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--model_scale", type=float, default=1.0)
    p.add_argument("--decode", type=str, default="host",
                   choices=["host", "device"],
                   help="host = exact OpenCV-parity decode; device = "
                        "fully on-device fixed-shape decode (largest-"
                        "component base, ships 18 floats/frame)")
    p.add_argument("--spatial_shards", type=int, default=1,
                   help="shard the image HEIGHT over this many devices "
                        "(single-stream latency scaling; outputs "
                        "identical to unsharded)")
    return p


def track_singleframe_video(video_path, step_fn, cfg, out_dir, logger=None):
    vid = cv2.VideoCapture(str(video_path))
    name = Path(video_path).stem
    N = int(vid.get(cv2.CAP_PROP_FRAME_COUNT))
    W, H = cfg.input_width, cfg.input_height
    writer = None
    if cfg.overlay:
        writer = cv2.VideoWriter(
            str(Path(out_dir) / f"{name}_tracked.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), cfg.output_fps, (W, H),
        )
    tracker = KeypointTracker(N, cfg)
    t0 = time.perf_counter()
    done = 0
    while True:
        ret, frame = vid.read()
        if not ret:
            break
        frame = cv2.resize(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB), (W, H))
        out = step_fn(frame)
        mask_array, aux = out[0], out[1]
        disp = render_overlay(frame, mask_array) if cfg.overlay else None
        if cfg.decode == "device":
            tracker.update_device(
                aux, mask_array, disp,
                heat_provider=(
                    (lambda h=out[2]: h) if len(out) > 2 else None
                ),
            )
        else:
            tracker.update(mask_array, aux[..., 1], aux[..., 0], disp)
        if writer is not None:
            writer.write(cv2.cvtColor(disp, cv2.COLOR_RGB2BGR))
        done += 1
    elapsed = time.perf_counter() - t0
    if writer is not None:
        writer.release()
    vid.release()
    csv_path = Path(out_dir) / f"{name}_tracked.csv"
    np.savetxt(csv_path, tracker.rows, delimiter=",")
    if logger:
        logger.info(
            f"Saved {csv_path}; {done / max(elapsed, 1e-9):.1f} frames/s"
        )
    return tracker.rows, done / max(elapsed, 1e-9)


def main(argv=None):
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)
    out_dir = Path(args.expt_savedir) / args.expt_name / (
        "video_tracking_results"
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger("sf_video_tracking")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    logger.addHandler(logging.FileHandler(out_dir / "log.log"))
    logger.addHandler(logging.StreamHandler(sys.stdout))

    num_classes = 5
    if args.artifact is None and (
        args.model_type is None or args.load_wts_model is None
    ):
        raise SystemExit(
            "either --artifact or both --model_type and --load_wts_model "
            "are required"
        )
    if args.artifact is not None:
        return _main_artifact(args, out_dir, logger, num_classes)
    model = get_tooltip_segmentation_model(
        args.model_type, num_classes, scale=args.model_scale
    )
    H, W = args.input_height, args.input_width
    output_mode = OUTPUT_MODES[args.model_type]
    if output_mode == "tapnet":
        # reference parity: TAPNet video tracking is NotImplementedError
        # there too (test_toolpose_segmentation_on_videos_v2.py:224-225) —
        # its motion-prior attention maps come from the offline dataset
        # pipeline, which a live video stream does not have
        raise SystemExit(
            "TAPNet video tracking is not implemented (reference "
            "raises NotImplementedError as well); use infer_toolpose_"
            "segmentation on an attmap-equipped dataset instead"
        )
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, H, W, 3), np.float32)
    )
    payload, _ = load_checkpoint(args.load_wts_model)
    from flax import serialization

    from mfcnet_tpu.utils.checkpoint import params_from_payload

    try:
        params_src = params_from_payload(payload, args.use_ema)
    except ValueError as e:
        raise SystemExit(f"{args.load_wts_model}: {e}")
    variables = {
        "params": serialization.from_state_dict(
            variables["params"], params_src,
        ),
        "batch_stats": serialization.from_state_dict(
            variables.get("batch_stats", {}), payload["batch_stats"]
        ),
    }

    dtype = (
        jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    )
    cvars = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        variables,
    )
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype)

    # --spatial_shards: height-sharded input -> GSPMD splits every conv
    # over a 1-D 'spatial' mesh (single-stream latency scaling); the
    # probability map is gathered back before decode/transfer
    spatial = getattr(args, "spatial_shards", 1)
    _replicated = None
    if spatial > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from mfcnet_tpu.parallel import make_mesh

        _mesh = make_mesh(spatial, ("spatial",))
        _h_shard = NamedSharding(_mesh, PartitionSpec("spatial"))
        _replicated = NamedSharding(_mesh, PartitionSpec())

        def put(x):
            return jax.device_put(x, _h_shard)
    else:
        def put(x):
            return jnp.asarray(x)

    @jax.jit
    def dev_step(frame_u8):
        x = frame_u8.astype(dtype) / 255.0
        x = ((x - mean) / std)[None]
        out = model.apply(cvars, x)
        if output_mode == "logits":
            out = jax.nn.log_softmax(out, axis=-1)
        probs = jnp.exp(out.astype(jnp.float32))[0]
        if _replicated is not None:
            # gather height shards before decode/transfer
            probs = jax.lax.with_sharding_constraint(probs, _replicated)
        # mask + minimized aux outputs (multiframe _outputs semantics:
        # track/tracker.py) — full probs never leave the device
        if args.score_detection_threshold > 0:
            mask = jnp.zeros(probs.shape[:2], jnp.uint8)
            for cls in range(1, probs.shape[-1]):
                mask = jnp.where(
                    probs[..., cls] > args.score_detection_threshold,
                    jnp.uint8(cls), mask,
                )
        else:
            mask = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
        heats = jnp.stack([probs[..., 2], probs[..., 4]], axis=-1)
        if args.decode == "device":
            from mfcnet_tpu.track.decode_device import (
                decode_keypoints_device,
            )

            aux = decode_keypoints_device(
                probs, int(args.area_threshold * 10),
                pred=mask.astype(jnp.int32),
            )
            # f32 heats ride along as a device handle, fetched only on a
            # tie-flagged side (exact host re-decode)
            return mask, aux, heats
        # f32 heats: the host path is the exact OpenCV-parity decode
        return mask, heats

    def step_fn(frame):
        out = dev_step(put(np.asarray(frame)))
        return (
            np.asarray(out[0]),
            np.asarray(out[1]).astype(np.float32),
            *out[2:],
        )

    cfg = TrackerConfig(
        num_input_frames=1, num_classes=num_classes, input_height=H,
        input_width=W,
        score_detection_threshold=args.score_detection_threshold,
        area_threshold=args.area_threshold,
        dist_threshold=args.dist_threshold,
        dtype=args.compute_dtype,
        decode=args.decode,
        spatial_shards=getattr(args, 'spatial_shards', 1),
    )
    if args.decode == "device":
        logger.warning(
            "--decode device: base centroids use the on-device polygon-"
            "moment approximation (<~2 px vs the host cv2 decode on "
            "adversarial masks); tips apply the host's top-2/area "
            "component gate on device; any ambiguous decision (base "
            "near-tie or tip-gate boundary) auto-falls back to the "
            "exact host decode for that side. Use --decode host for "
            "bit-exact reference parity."
        )
    videos = list_video_files(args.videos_dir)
    if args.num_videos > 0:
        videos = videos[: args.num_videos]
    logger.info(f"Processing {len(videos)} videos")
    fps_all = []
    for video in videos:
        logger.info(f"Processing video: {video}")
        _, fps = track_singleframe_video(
            video, step_fn, cfg, out_dir, logger
        )
        fps_all.append(fps)
    return fps_all


def _main_artifact(args, out_dir, logger, num_classes):
    """Track from a frozen single-frame artifact — no model code, no
    checkpoint. The artifact returns per-frame probs; mask + tip heats
    (host decode) or keypoint rows (device decode — a framework op,
    independent of model code) come from a small jitted post step."""
    import jax
    import jax.numpy as jnp

    from mfcnet_tpu.serve import load_exported

    if getattr(args, "spatial_shards", 1) > 1:
        raise SystemExit("--artifact does not compose with "
                         "--spatial_shards (use the live model path)")
    loaded = load_exported(args.artifact)
    meta = loaded.meta
    if meta.get("task") != "singleframe":
        raise SystemExit(
            f"{args.artifact} is a {meta.get('task', 'multiframe')} "
            "artifact; this is the single-frame video CLI"
        )
    H = meta.get("input_height", args.input_height)
    W = meta.get("input_width", args.input_width)
    thr = float(args.score_detection_threshold)

    @jax.jit
    def post(probs):
        if thr > 0:
            mask = jnp.zeros(probs.shape[:2], jnp.uint8)
            for cls in range(1, probs.shape[-1]):
                mask = jnp.where(
                    probs[..., cls] > thr, jnp.uint8(cls), mask
                )
        else:
            mask = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
        heats = jnp.stack([probs[..., 2], probs[..., 4]], axis=-1)
        if args.decode == "device":
            import functools

            from mfcnet_tpu.track.decode_device import (
                decode_keypoints_device,
            )

            dec = functools.partial(
                decode_keypoints_device,
                area_threshold_x10=int(args.area_threshold * 10),
            )
            return mask, dec(probs, pred=mask.astype(jnp.int32)), heats
        return mask, heats

    def step_fn(frame):
        probs = loaded(np.asarray(frame)[None])[0]
        out = post(probs)
        return (
            np.asarray(out[0]),
            np.asarray(out[1]).astype(np.float32),
            *out[2:],
        )

    cfg = TrackerConfig(
        num_input_frames=1, num_classes=num_classes, input_height=H,
        input_width=W,
        score_detection_threshold=thr,
        area_threshold=args.area_threshold,
        dist_threshold=args.dist_threshold,
        dtype=meta.get("compute_dtype", args.compute_dtype),
        decode=args.decode,
    )
    logger.info(f"artifact serving: {args.artifact} ({H}x{W})")
    if args.decode == "device":
        logger.warning(
            "--decode device: base centroids use the on-device polygon-"
            "moment approximation (<~2 px vs the host cv2 decode on "
            "adversarial masks); tips apply the host's top-2/area "
            "component gate on device; any ambiguous decision (base "
            "near-tie or tip-gate boundary) auto-falls back to the "
            "exact host decode for that side. Use --decode host for "
            "bit-exact reference parity."
        )
    videos = list_video_files(args.videos_dir)
    if args.num_videos > 0:
        videos = videos[: args.num_videos]
    fps_all = []
    for video in videos:
        logger.info(f"Processing video: {video}")
        _, fps = track_singleframe_video(
            video, step_fn, cfg, out_dir, logger
        )
        fps_all.append(fps)
    if fps_all:
        logger.info(f"mean throughput: {np.mean(fps_all):.1f} frames/s")
    return fps_all


if __name__ == "__main__":
    main()
