"""End-to-end per-video tracking CLI (reference:
scripts/test_multiframe_segmentation_on_videos_v3.py). Produces
``{video}_tracked.csv`` (N x 12 keypoints) and overlay MP4s under
``{expt_savedir}/{expt_name}/video_tracking_results``.

TPU-native default: incremental mode (one base-model forward per frame via
a device ring buffer — identical outputs to the reference's full recompute,
T x fewer base FLOPs). ``--tracker_mode full`` reproduces the reference's
compute pattern exactly.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

import jax
import numpy as np

from mfcnet_tpu.models import get_multiframe_segmentation_model
from mfcnet_tpu.track.tracker import TrackerConfig, track_on_video
from mfcnet_tpu.utils.checkpoint import load_checkpoint
from mfcnet_tpu.utils.jitinit import jit_init

_MODELS = [
    "TernausNetMulti-Basic", "TernausNetMulti-Large",
    "DeepLabMulti-Basic", "DeepLabMulti-Large",
    "FCNMulti-Basic", "FCNMulti-Large",
    "SegFormerMulti-Basic", "SegFormerMulti-Large",
    "HRNetMulti-Basic", "HRNetMulti-Large",
    "UNetMulti-Basic", "UNetMulti-Large",
    "ResUNetMulti-Basic", "ResUNetMulti-Large",
]


def build_parser():
    p = argparse.ArgumentParser(
        description="Test Multiframe Segmentation Model on Videos"
    )
    p.add_argument("--videos_dir", type=str, required=True)
    p.add_argument("--depth_videos_dir", type=str, default=None)
    p.add_argument("--expt_savedir", type=str, required=True)
    p.add_argument("--expt_name", type=str, required=True)
    p.add_argument("--model_type", type=str, default=None, choices=_MODELS)
    p.add_argument("--num_input_frames", type=int, default=3)
    p.add_argument("--load_wts_model", type=str, default=None)
    p.add_argument("--artifact", type=str, default=None,
                   help="track from a frozen serving artifact "
                        "(cli.export_model) instead of model code + "
                        "checkpoint (both --decode modes work)")
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
    p.add_argument("--add_optflow_inputs", type=lambda v: v.lower() in
                   ("true", "1", "yes"), default=False)
    p.add_argument("--add_depth_inputs", type=lambda v: v.lower() in
                   ("true", "1", "yes"), default=False)
    p.add_argument("--load_wts_flow_model", type=str, default=None,
                   help="Flow-model weights (msgpack) for --add_optflow_inputs")
    p.add_argument("--tracker_mode", type=str, default="incremental",
                   choices=["incremental", "full"])
    p.add_argument("--decode", type=str, default="host",
                   choices=["host", "device"],
                   help="host = exact OpenCV-parity decode; device = "
                        "fully on-device fixed-shape decode (largest-"
                        "component base via on-device connected "
                        "components)")
    p.add_argument("--fetch_batch", type=int, default=8,
                   help="frames per device->host result fetch (1 = "
                        "per-frame sync; larger amortizes transfer "
                        "round-trips on high-latency links; keypoint "
                        "rows are identical for any value)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--model_scale", type=float, default=1.0)
    p.add_argument("--spatial_shards", type=int, default=1,
                   help="shard the image HEIGHT over this many devices "
                        "(single-stream latency scaling; outputs "
                        "identical to unsharded)")
    p.add_argument("--parallel_videos", type=int, default=1,
                   help="track this many videos CONCURRENTLY with one "
                        "batched engine (aggregate throughput). Videos "
                        "are chunked in listing order and each chunk's "
                        "frames pre-decoded to RAM; unequal lengths are "
                        "padded device-side with the padded results "
                        "discarded (group similar-length videos "
                        "together to minimize padding). Keypoint rows "
                        "are identical to sequential tracking")
    return p


def list_video_files(directory):
    out = []
    for root, _, files in os.walk(directory):
        for f in files:
            if f.endswith((".mp4", ".avi", ".mov")):
                out.append(os.path.join(root, f))
    return sorted(out)


def main(argv=None):
    args = build_parser().parse_args(argv)
    out_dir = Path(args.expt_savedir) / args.expt_name / (
        "video_tracking_results"
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger("video_tracking")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(out_dir / "log.log")
    logger.addHandler(fh)
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
    model = get_multiframe_segmentation_model(
        args.model_type,
        num_classes=num_classes,
        num_input_frames=args.num_input_frames,
        add_depth_inputs=args.add_depth_inputs,
        scale=args.model_scale,
    )
    T, H, W = args.num_input_frames, args.input_height, args.input_width
    init_kwargs = {}
    if args.add_depth_inputs:
        init_kwargs["depth"] = np.zeros((1, T, H, W, 1), np.float32)
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, T, H, W, 3), np.float32), **init_kwargs,
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
    logger.info(
        f"Loaded model weights from {args.load_wts_model}"
        + (" (EMA)" if args.use_ema else "")
    )

    cfg = TrackerConfig(
        num_input_frames=T,
        num_classes=num_classes,
        input_height=H,
        input_width=W,
        score_detection_threshold=args.score_detection_threshold,
        area_threshold=args.area_threshold,
        dist_threshold=args.dist_threshold,
        mode=args.tracker_mode,
        decode=args.decode,
        dtype=args.compute_dtype,
        add_depth_inputs=args.add_depth_inputs,
        add_optflow_inputs=args.add_optflow_inputs,
        fetch_batch=args.fetch_batch,
        spatial_shards=getattr(args, 'spatial_shards', 1),
    )
    if args.decode == "device":
        logger.warning(
            "--decode device: base centroids use the on-device polygon-"
            "moment approximation (<~2 px vs the host cv2 decode on "
            "adversarial masks, well under 1 px on compact blobs); tips "
            "apply the host's top-2/area component gate on device; any "
            "ambiguous decision (base near-tie or tip-gate boundary) "
            "auto-falls back to the exact host decode for that side. "
            "Use --decode host for bit-exact reference parity."
        )

    flow_model = flow_variables = None
    if args.add_optflow_inputs:
        # frozen RAFT provider (reference loads torchvision raft_large,
        # :342-352); supply converted weights via --load_wts_flow_model
        from mfcnet_tpu.models.raft import RAFT

        # bf16 runs route the 12 update iterations through the fused
        # Pallas kernel (ops/raft_update_pallas.py — the XLA convs are
        # relayout-bound at half-res 1/8 scale); f32 runs keep the
        # exact XLA path for bit-parity work
        flow_model = RAFT(
            iters=12,
            fused_update=args.compute_dtype == "bfloat16",
        )
        flow_variables = jit_init(
            flow_model, jax.random.PRNGKey(1),
            np.zeros((1, H // 2, W // 2, 3), np.float32),
            np.zeros((1, H // 2, W // 2, 3), np.float32),
        )
        if args.load_wts_flow_model:
            from mfcnet_tpu.utils.checkpoint import load_params

            flow_variables = {"params": load_params(
                args.load_wts_flow_model,
                template=flow_variables["params"],
            )}

    videos = list_video_files(args.videos_dir)
    if args.num_videos > 0:
        videos = videos[: args.num_videos]
    logger.info(f"Processing {len(videos)} video files from {args.videos_dir}")
    depth_videos = (
        list_video_files(args.depth_videos_dir)
        if args.add_depth_inputs
        else [None] * len(videos)
    )
    fps_all = []
    P = max(1, getattr(args, "parallel_videos", 1))
    if P > 1:
        # batched serving: groups of up to P videos advance in lockstep
        # through ONE batched engine (per-video CSVs/overlays unchanged;
        # rows identical to sequential tracking; unequal lengths are
        # padded device-side and the padded results discarded). Group
        # frames are pre-decoded to RAM (~H*W*3*N bytes per video).
        from mfcnet_tpu.track.tracker import (
            InferenceEngine,
            track_on_frame_streams,
        )

        def read_all(path, gray=False):
            return _read_all_frames(path, W, H, gray)

        items = list(zip(videos, depth_videos))
        engine_cache = {}
        for i in range(0, len(items), P):
            chunk = items[i : i + P]
            streams = [read_all(v) for v, _ in chunk]
            dstreams = None
            if args.add_depth_inputs:
                dstreams = [read_all(d, gray=True) for _, d in chunk]
                for (v, d), s, ds in zip(chunk, streams, dstreams):
                    # same contract as the sequential path
                    # (track_on_video asserts RGB/depth counts match)
                    assert len(s) == len(ds), (
                        f"RGB({len(s)}) vs depth({len(ds)}) frame-count "
                        f"mismatch for {v} / {d}"
                    )
            names = [Path(v).stem for v, _ in chunk]
            logger.info(
                f"Tracking {len(chunk)} videos concurrently: {names}"
            )
            B = len(chunk)
            engine = engine_cache.get(B)
            if engine is None:
                engine = InferenceEngine(
                    model, variables, cfg, flow_model=flow_model,
                    flow_variables=flow_variables, num_streams=B,
                )
                engine_cache[B] = engine
            _, fps = track_on_frame_streams(
                streams, model, variables, cfg, out_dir, names=names,
                depth_streams=dstreams, logger=logger, engine=engine,
            )
            fps_all.append(fps)
    else:
        for video, dvideo in zip(videos, depth_videos):
            logger.info(f"Processing video: {video}")
            _, fps = track_on_video(
                video, model, variables, cfg, out_dir,
                depth_video_path=dvideo, logger=logger,
                flow_model=flow_model, flow_variables=flow_variables,
            )
            fps_all.append(fps)
    if fps_all:
        logger.info(f"mean throughput: {np.mean(fps_all):.1f} frames/s")
    return fps_all


def _read_all_frames(path, W, H, gray=False):
    """Decode a whole video to resized RGB (or grayscale) frames in RAM."""
    import cv2

    cap = cv2.VideoCapture(str(path))
    out = []
    while True:
        ret, f = cap.read()
        if not ret:
            break
        f = cv2.cvtColor(
            f, cv2.COLOR_BGR2GRAY if gray else cv2.COLOR_BGR2RGB
        )
        out.append(cv2.resize(f, (W, H)))
    cap.release()
    return out


def _main_artifact(args, out_dir, logger, num_classes):
    """Track from a frozen serving artifact — no model code, no
    checkpoint. Shapes come from the artifact header; both --decode
    modes work (the device decode is a framework op, not model code)."""
    from mfcnet_tpu.serve import ArtifactEngine, load_exported
    from mfcnet_tpu.track.tracker import TrackerConfig, track_on_video

    loaded = load_exported(args.artifact)
    meta = loaded.meta
    T = meta.get("num_input_frames", args.num_input_frames)
    H = meta.get("input_height", args.input_height)
    W = meta.get("input_width", args.input_width)
    add_depth = meta.get("add_depth_inputs", args.add_depth_inputs)
    cfg = TrackerConfig(
        num_input_frames=T,
        num_classes=meta.get("num_classes", num_classes),
        input_height=H,
        input_width=W,
        score_detection_threshold=args.score_detection_threshold,
        area_threshold=args.area_threshold,
        dist_threshold=args.dist_threshold,
        mode=meta.get("serving_mode", "full"),
        decode=args.decode,
        dtype=meta.get("compute_dtype", args.compute_dtype),
        add_depth_inputs=add_depth,
        fetch_batch=args.fetch_batch,
    )
    logger.info(
        f"artifact serving: {args.artifact} "
        f"(mode={cfg.mode}, {H}x{W}, T={T}"
        f"{', +depth' if add_depth else ''})"
    )
    if args.decode == "device":
        logger.warning(
            "--decode device: base centroids use the on-device polygon-"
            "moment approximation (<~2 px vs the host cv2 decode on "
            "adversarial masks, well under 1 px on compact blobs); tips "
            "apply the host's top-2/area component gate on device; any "
            "ambiguous decision (base near-tie or tip-gate boundary) "
            "auto-falls back to the exact host decode for that side. "
            "Use --decode host for bit-exact reference parity."
        )
    videos = list_video_files(args.videos_dir)
    if args.num_videos > 0:
        videos = videos[: args.num_videos]
    depth_videos = (
        list_video_files(args.depth_videos_dir)
        if add_depth
        else [None] * len(videos)
    )
    fps_all = []
    P = max(1, getattr(args, "parallel_videos", 1))
    if P > 1:
        # batched artifact serving: groups of up to P videos in lockstep
        # through ONE ArtifactEngine (symbolic batch dim); same contract
        # as the live --parallel_videos path
        from mfcnet_tpu.track.tracker import track_on_frame_streams

        items = list(zip(videos, depth_videos))
        engine_cache = {}
        for i in range(0, len(items), P):
            chunk = items[i : i + P]
            streams = [_read_all_frames(v, W, H) for v, _ in chunk]
            dstreams = None
            if add_depth:
                dstreams = [
                    _read_all_frames(d, W, H, gray=True) for _, d in chunk
                ]
                for (v, d), s, ds in zip(chunk, streams, dstreams):
                    assert len(s) == len(ds), (
                        f"RGB({len(s)}) vs depth({len(ds)}) frame-count "
                        f"mismatch for {v} / {d}"
                    )
            names = [Path(v).stem for v, _ in chunk]
            logger.info(
                f"Tracking {len(chunk)} videos concurrently: {names}"
            )
            B = len(chunk)
            beng = engine_cache.get(B)
            if beng is None:
                beng = ArtifactEngine(loaded, cfg, num_streams=B)
                engine_cache[B] = beng
            _, fps = track_on_frame_streams(
                streams, None, None, cfg, out_dir, names=names,
                depth_streams=dstreams, logger=logger, engine=beng,
            )
            fps_all.append(fps)
    else:
        engine = ArtifactEngine(loaded, cfg)
        for video, dvideo in zip(videos, depth_videos):
            logger.info(f"Processing video: {video}")
            _, fps = track_on_video(
                video, None, None, cfg, out_dir,
                depth_video_path=dvideo, logger=logger, engine=engine,
            )
            fps_all.append(fps)
    if fps_all:
        logger.info(f"mean throughput: {np.mean(fps_all):.1f} frames/s")
    return fps_all


if __name__ == "__main__":
    main()
