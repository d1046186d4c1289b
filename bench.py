"""Benchmark: 3-frame 480x640 MFCNet video inference, frames/sec/chip.

Measures the flagship video-tracking inference pipeline
(TernausNetMulti-Basic: TernausNet16 per-frame base + MFCNet fusion head) in
the incremental rolling-window mode a video tracker actually runs: each new
frame costs ONE base-model forward (prior frames' class maps come from the
ring buffer) plus one fusion-head forward — the TPU-first redesign of
scripts/test_multiframe_segmentation_on_videos_v3.py:251-281, which
recomputes all 3 base forwards per frame.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = fps / 60 (BASELINE.json north-star: >=60 fps/chip on v5e).
"""

import argparse
import json
import time

import numpy as np

# TPU v5e published peak: 394 bf16 TFLOP/s per chip. MFU is quoted
# against this hardware peak for every dtype (the standard convention),
# so f32 rows read low by construction — the number answers "how much of
# the chip's ceiling does this config reach", making 'latency-bound, not
# FLOP-bound' claims a gateable figure instead of prose.
V5E_PEAK_FLOPS = 394e12


def mfu_fields(jitted, example_args, frames_per_call, fps):
    """{"model_tflops_per_frame", "mfu"} from XLA's own cost analysis of
    the measured executable (compile is cached — the bench already ran
    it). Empty dict if the backend can't report flops."""
    try:
        ca = jitted.lower(*example_args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0) or 0.0)
    except Exception:
        return {}
    if flops <= 0:
        return {}
    per_frame = flops / frames_per_call
    return {
        "model_tflops_per_frame": round(per_frame / 1e12, 4),
        "mfu": round(per_frame * fps / V5E_PEAK_FLOPS, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--frames", type=int, default=200,
                    help="timed frames per trial")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--mode", default="incremental",
                    choices=["incremental", "full", "e2e", "train",
                             "single", "flowgen"],
                    help="incremental: 1 base fwd/frame (tracker mode); "
                         "full: T base fwds/frame (reference semantics); "
                         "train: optimizer steps/s, README flagship recipe; "
                         "single: single-frame model-zoo forward "
                         "(BASELINE configs 1-2, pick with --model); "
                         "flowgen: offline .flo precompute CLI throughput "
                         "(cli/generate_opticalflow.py, reference "
                         "scripts/generate_opticalflow_raft.py)")
    ap.add_argument("--model", default="UNet",
                    help="single mode: single-frame registry model name "
                         "(UNet, TernausNet16, ResUNet, ...)")
    ap.add_argument("--chunk", type=int, default=1,
                    help="frames per device launch in incremental mode. "
                         "1 (default) = per-frame async dispatch, the "
                         "tracker's real configuration — measured FASTER "
                         "than lax.scan chunking (120 vs 116 fps: the "
                         "scan's buffer threading costs more than the "
                         "~0.3 ms dispatch floor it amortizes); >1 = "
                         "scan-chunked launches for high-dispatch-cost "
                         "environments")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--decode", default="device",
                    choices=["device", "host"],
                    help="e2e mode keypoint decode path")
    ap.add_argument("--source", default="video",
                    choices=["video", "ram", "device"],
                    help="e2e mode frame source: 'video' = mp4 decode per "
                         "frame (the reference's full pipeline); 'ram' = "
                         "frames pre-decoded in host memory (product cost "
                         "without the cv2 decode stage); 'device' = frames "
                         "pre-staged in HBM (inference + keypoint decode + "
                         "CSV only — the compute-bound product number, "
                         "free of this harness's ~5 MB/s tunnel H2D "
                         "artifact)")
    ap.add_argument("--streams", type=int, default=1,
                    help="e2e mode: track this many videos CONCURRENTLY "
                         "with one batched engine (aggregate serving "
                         "throughput; requires --source ram|device)")
    ap.add_argument("--fused", type=lambda v: v.lower() in ("true", "1"),
                    default=False,
                    help="e2e only: engine fused_dispatch — ingest+fuse "
                         "as ONE jitted call per post-warmup frame "
                         "(outputs identical; saves one dispatch round "
                         "trip per frame)")
    ap.add_argument("--engine", default="live",
                    choices=["live", "artifact"],
                    help="e2e only: 'artifact' runs the exported "
                         "StableHLO incremental artifact through "
                         "serve.ArtifactEngine (requires --flow none; "
                         "both --decode modes and --streams N work) — "
                         "measures the deployment configuration's "
                         "overhead vs the live engine")
    ap.add_argument("--flow", default="none",
                    choices=["none", "RAFT", "FlowFormerPlusPlus"],
                    help="e2e mode: enable the reference's optical-flow "
                         "input channels with a frozen provider "
                         "(flow at 0.5x, x2 bilinear rescale — "
                         "test_multiframe_segmentation_on_videos_v3.py:"
                         "264-271); T-1 flow forwards per frame. "
                         "train mode: frozen full-resolution provider "
                         "inside the jitted step (src/engine.py:39-53); "
                         "flowgen mode: which provider to precompute with")
    ap.add_argument("--depth", type=lambda v: v.lower() in ("true", "1"),
                    default=False,
                    help="e2e/train: add the reference's depth input "
                         "channel (DepthAnything-v2 precomputed maps — "
                         "src/engine.py:56-64, BASELINE config 4); fed "
                         "synthetic uint8 depth frames here")
    ap.add_argument("--batch", type=int, default=None,
                    help="inference: concurrent video streams (frames/sec "
                         "counts batch*frames; default 1). train: the "
                         "optimizer batch size (default 4, the README "
                         "recipe)")
    ap.add_argument("--profile", type=str, default=None,
                    help="write a jax.profiler trace of one timed trial "
                         "to this directory (view with TensorBoard's "
                         "profile tab / XProf)")
    ap.add_argument("--record_detail", default=None,
                    choices=["none", "fast", "full", "true", "false"],
                    help="also measure other configs in subprocesses and "
                         "merge the rows into BENCH_DETAIL.json. 'fast' "
                         "(the plain-run default): 3 warm-cacheable rows "
                         "under a hard wall-clock budget so the driver's "
                         "default invocation always exits 0 in its "
                         "window; 'full': the complete ~40-min sweep over "
                         "every BASELINE.md config (builder sessions). "
                         "true/false are aliases for full/none")
    ap.add_argument("--weights", default=None,
                    choices=["closure", "packed"],
                    help="how jitted programs receive model weights. "
                         "'closure' bakes them in as XLA constants: best "
                         "steady-state fps (compile-time weight prep) "
                         "but a ~416 MB serialized executable that costs "
                         "200-500 s to load per process through this "
                         "harness's tunnel. 'packed' passes shape-"
                         "grouped stacked buffers as args "
                         "(utils/flatpack.py): ~7 MB executable, "
                         "~40-120 s cold process, ~4% lower fps (runtime "
                         "weight prep). Default: closure for the "
                         "incremental headline (the product number), "
                         "packed for the driver-window detail rows")
    ap.add_argument("--detail_budget", type=float, default=None,
                    help="hard wall-clock budget (s, from process start) "
                         "for the detail rows; rows that don't fit are "
                         "skipped with a stderr note. Default: 600 for "
                         "--record_detail fast, unlimited for full")
    args = ap.parse_args()
    t_start = time.perf_counter()

    def stamp(label):
        # phase timing to stderr: the driver window is a hard budget and
        # every round's artifact must show WHERE the wall-clock went
        # (r04: the headline consumed ~486 s of the 600 s window with no
        # record of which phase ate it)
        import sys as _sys
        print(
            f"[t+{time.perf_counter() - t_start:7.1f}s] {label}",
            file=_sys.stderr, flush=True,
        )

    if args.batch is None:
        args.batch = 4 if args.mode == "train" else 1
    if args.record_detail is None:
        args.record_detail = (
            "fast" if args.mode == "incremental" and args.batch == 1
            else "none"
        )
    if args.weights is None:
        # full-mode detail rows are driver-window critical (r04: zero
        # fresh rows landed — each closure-form subprocess pays a
        # 200-500 s executable load); the headline keeps the closure
        # form's fps. e2e has its own engine-level packed support.
        args.weights = "packed" if args.mode in ("full", "e2e") \
            else "closure"
    args.record_detail = {"true": "full", "false": "none"}.get(
        args.record_detail, args.record_detail
    )
    if args.detail_budget is None:
        args.detail_budget = 600.0 if args.record_detail == "fast" else 0.0

    import os

    import jax
    import jax.numpy as jnp

    # honor an explicit JAX_PLATFORMS (e.g. cpu smoke runs): the axon TPU
    # plugin force-appends itself to jax_platforms, so env alone is not
    # enough (same workaround as tools/parity_check.py). No-op when unset.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from mfcnet_tpu.utils.cachedir import machine_cache_dir

    # machine-keyed: another machine's XLA:CPU AOT cache entries can
    # SIGILL this host (see utils/cachedir.py)
    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_bench_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # unreachable-TPU-tunnel guard: record an error row instead of
    # hanging the harness forever in backend init
    from mfcnet_tpu.utils.watchdog import device_init_watchdog

    init_done = device_init_watchdog(lambda: print(json.dumps({
        "metric": "bench_error",
        "value": 0,
        "unit": "device init timed out after 300s "
                "(TPU tunnel unreachable?)",
        "vs_baseline": 0,
    }), flush=True))
    stamp("imports done, initializing device")
    jax.devices()
    init_done()
    stamp("device init done")

    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.utils.jitinit import jit_init

    if args.mode == "single":
        # BASELINE configs 1-2: single-frame toolpose models (UNet,
        # TernausNet*, ResUNet, ...) — forward + the log-softmax the
        # train CLI applies (reference scripts/train_toolpose_
        # segmentation.py), full 480x640 scale.
        from mfcnet_tpu.cli.train_toolpose_segmentation import OUTPUT_MODES
        from mfcnet_tpu.models import get_tooltip_segmentation_model
        from mfcnet_tpu.utils.jitinit import cast_floats

        C, H, W, B = 5, args.height, args.width, args.batch
        model = get_tooltip_segmentation_model(args.model, C)
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        tapnet = args.model.startswith("TAPNet")
        x0 = np.zeros((1, H, W, 3), np.float32)
        init_args = (x0, np.zeros((1, H, W, 1), np.float32)) if tapnet \
            else (x0,)
        cvars = cast_floats(
            jit_init(model, jax.random.PRNGKey(0), *init_args), dtype
        )
        logits_out = OUTPUT_MODES.get(args.model) == "logits"

        def fwd(*xs):
            y = model.apply(cvars, *xs).astype(jnp.float32)
            return jax.nn.log_softmax(y, axis=-1) if logits_out else y

        step = jax.jit(fwd)
        call_args = tuple(
            jnp.zeros((B,) + a.shape[1:], dtype) for a in init_args
        )
        out = step(*call_args)
        float(out.reshape(-1)[0])

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = step(*call_args)
            float(out.reshape(-1)[0])  # drain the tunnel queue
            return time.perf_counter() - t0

        run(10)
        best = min(run(args.frames) for _ in range(args.trials))
        fps = args.frames * B / best
        row = {
            "metric": (
                f"singleframe_{args.model}_{H}x{W}_{args.dtype}"
                + (f"_b{B}" if B > 1 else "")
            ),
            "value": round(fps, 2),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / 60.0, 3),
        }
        row.update(mfu_fields(step, call_args, B, fps))
        print(json.dumps(row))
        return

    if args.mode == "flowgen":
        # offline .flo precompute throughput through the REAL CLI on a
        # synthetic JIGSAWS-format dataset (reference scripts/generate_
        # opticalflow_raft.py) — image read, consecutive-pair provider
        # forward (batched), .flo write, per-video zero-flow convention.
        import tempfile
        from pathlib import Path as _P

        from mfcnet_tpu.cli.generate_opticalflow import main as genflow
        from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset

        provider = args.flow if args.flow != "none" else "RAFT"
        if provider not in ("RAFT", "UnFlow"):
            raise SystemExit("flowgen supports --flow RAFT|UnFlow")
        N = args.frames
        with tempfile.TemporaryDirectory() as td:
            root = make_jigsaws_like_dataset(
                _P(td) / "data", num_videos=1, frames_per_video=N,
                height=args.height, width=args.width,
            )
            argv = [
                "--data_dir", str(root), "--dataset", "JIGSAWS",
                "--optflow_model", provider, "--save_viz", "false",
                "--batch", "8",
                "--input_height", str(args.height),
                "--input_width", str(args.width),
            ]
            genflow(argv)  # warm compile
            best = 0.0
            for _ in range(args.trials):
                t0 = time.perf_counter()
                genflow(argv)
                best = max(best, N / (time.perf_counter() - t0))
        print(json.dumps({
            "metric": (
                f"flowgen_{provider}_{args.height}x{args.width}"
            ),
            "value": round(best, 2),
            "unit": "frames/sec/chip",
            "vs_baseline": round(best / 60.0, 3),
            "note": "full CLI path incl. image read + per-frame H2D over "
                    "this harness's ~5 MB/s tunnel (the bound here; "
                    "compute-side provider cost is the zoo_bench --flow "
                    "pair-forward number in docs/PERFORMANCE.md)",
        }))
        return

    if args.mode == "e2e":
        # full product pipeline (BASELINE.json config 5): frame source ->
        # device inference (incremental ring buffer) -> keypoint decode ->
        # CSV/overlay. --source picks where the pipeline starts: mp4
        # decode, host-RAM frames, or HBM-staged frames (see --help).
        import tempfile

        from mfcnet_tpu.data.synthetic import (
            make_synthetic_frames,
            make_synthetic_video,
        )
        from mfcnet_tpu.track.tracker import (
            InferenceEngine,
            TrackerConfig,
            track_on_frames,
            track_on_video,
        )

        T, C, H, W = 3, 5, args.height, args.width
        use_flow = args.flow != "none"
        use_depth = args.depth
        model = get_multiframe_segmentation_model(
            "TernausNetMulti-Basic", num_classes=C, num_input_frames=T,
            add_optflow_inputs=use_flow, add_depth_inputs=use_depth,
        )
        init_kw = {}
        if use_depth:
            init_kw["depth"] = np.zeros((1, T, H, W, 1), np.float32)
        variables = jit_init(
            model, jax.random.PRNGKey(0),
            np.zeros((1, T, H, W, 3), np.float32), **init_kw,
        )
        if use_depth:
            # fixture realism, the r4 flow-head trick applied to depth
            # (VERDICT r4 item 6): under RANDOM-INIT weights the depth
            # channels inject full-amplitude noise into the fusion
            # head, fragmenting the argmax masks into worst-case
            # speckle that drives the device decode's data-dependent
            # component tiers to their ~480 ms/frame envelope — a
            # fixture artifact no trained checkpoint produces (the
            # train row shows depth adds ~2%). Scaling the head's
            # Conv_0 input slice for the T depth channels keeps the
            # compute graph identical (same convs, same decode) while
            # giving the masks the same statistics as the flow-only
            # row, so the decode runs its production tier.
            import flax

            fv = flax.core.unfreeze(variables)
            k0 = fv["params"]["multiframe_net"]["head"]["Conv_0"]
            k0["kernel"] = (
                jnp.asarray(k0["kernel"]).at[..., T * C :, :].mul(0.02)
            )
            variables = fv
        flow_model = flow_variables = None
        if use_flow:
            # frozen provider at half resolution (reference default is
            # RAFT — scripts/test_..._on_videos_v3.py:343-349; FFPP is
            # its --optflow_model alternative)
            if args.flow == "RAFT":
                from mfcnet_tpu.models.raft import RAFT

                # bf16: fused Pallas update iterations (the XLA convs
                # are relayout-bound at 30x40 — ops/raft_update_pallas)
                flow_model = RAFT(
                    iters=12,
                    fused_update=args.dtype == "bfloat16",
                )
            else:
                from mfcnet_tpu.models.flowformerpp import FlowFormerPP

                flow_model = FlowFormerPP(iters=12)
            half = np.zeros((1, H // 2, W // 2, 3), np.float32)
            flow_variables = jit_init(
                flow_model, jax.random.PRNGKey(1), half, half
            )
            # a RANDOM-INIT flow head emits garbage flow (RAFT: ~+-130
            # px), which no trained provider produces on adjacent video
            # frames; it forces the banded warp's (and the patch
            # lookup's) exact fallback and makes the bench measure an
            # unrealistic code path. Scaling the final flow-delta conv
            # keeps the compute graph identical while giving the
            # provider deployment-realistic output statistics
            # (~+-3 px). Both providers name it update_block/flow2.
            import flax

            fv = flax.core.unfreeze(flow_variables)
            fl2 = fv["params"]["update_block"]["flow2"]
            fl2["kernel"] = fl2["kernel"] * 0.02
            fl2["bias"] = fl2["bias"] * 0.02
            flow_variables = fv
        cfg = TrackerConfig(
            num_input_frames=T, num_classes=C, input_height=H,
            input_width=W, dtype=args.dtype, overlay=False,
            decode=args.decode, add_optflow_inputs=use_flow,
            add_depth_inputs=use_depth,
            fused_dispatch=args.fused,
            # random-init fixtures emit speckle masks whose top-2
            # components near-tie on ~every frame, serializing the
            # pipeline on per-frame exact-fallback mask fetches; trained
            # checkpoints flag ~0.25% (see TrackerConfig docstring)
            decode_tie_fallback=False,
        )
        S = max(1, args.streams)
        if S > 1 and args.source == "video":
            raise SystemExit("--streams needs --source ram|device")
        if args.engine == "artifact" and (
            args.source == "video" or use_flow or use_depth
        ):
            # validate HERE: a silently ignored flag would mislabel a
            # live-engine number as _artifact
            raise SystemExit(
                "--engine artifact needs --source ram|device, --flow "
                "none, --depth false"
            )
        def build_artifact_engine(td, num_streams=1):
            # deployment configuration: exported incremental StableHLO
            # artifact instead of the live engine (symbolic batch dim —
            # one artifact serves any stream count)
            from mfcnet_tpu.serve import (
                ArtifactEngine, export_incremental, load_exported,
                save_exported,
            )

            exported, spec = export_incremental(
                model, variables, height=H, width=W,
                num_frames=T, num_classes=C, dtype=args.dtype,
            )
            apath = f"{td}/bench.stablehlo"
            save_exported(apath, exported, meta={
                "serving_mode": "incremental",
                "compute_dtype": args.dtype,
                "state": {
                    k: [list(s), d] for k, (s, d) in spec.items()
                },
            })
            return ArtifactEngine(
                load_exported(apath), cfg, num_streams=num_streams
            )

        with tempfile.TemporaryDirectory() as td:
            def make_depth(seed):
                # synthetic stand-in for precomputed DepthAnything-v2
                # maps (the reference reads them from disk per frame —
                # src/engine.py:56-64): single-channel uint8, same frame
                # cadence as the RGB stream
                rng = np.random.default_rng(seed)
                return list(rng.integers(
                    0, 256, (args.frames, H, W), dtype=np.uint8
                ))

            if args.source == "video":
                if use_depth:
                    raise SystemExit("--depth needs --source ram|device")
                video = make_synthetic_video(
                    f"{td}/bench.mp4", num_frames=args.frames,
                    height=H, width=W,
                )
                run_once = lambda: track_on_video(
                    video, model, variables, cfg, td,
                    flow_model=flow_model, flow_variables=flow_variables,
                )
            elif S > 1:
                # S videos tracked concurrently by ONE batched engine:
                # lockstep (S, H, W, 3) batches, per-stream tracker state
                # and CSVs — the aggregate serving-throughput number
                from mfcnet_tpu.track.tracker import track_on_frame_streams

                per_stream = [
                    make_synthetic_frames(
                        num_frames=args.frames, height=H, width=W,
                        seed=100 + b,
                    )
                    for b in range(S)
                ]
                stacked = [
                    np.stack([per_stream[b][i] for b in range(S)])
                    for i in range(args.frames)
                ]
                dstreams = None
                if use_depth:
                    per_depth = [make_depth(200 + b) for b in range(S)]
                    dstreams = [
                        np.stack([per_depth[b][i] for b in range(S)])
                        for i in range(args.frames)
                    ]
                if args.source == "device":
                    stacked = [jax.device_put(x) for x in stacked]
                    if dstreams is not None:
                        dstreams = [jax.device_put(x) for x in dstreams]
                    jax.block_until_ready(stacked[-1])
                if args.engine == "artifact":
                    engine = build_artifact_engine(td, num_streams=S)
                else:
                    engine = InferenceEngine(
                        model, variables, cfg,
                        flow_model=flow_model,
                        flow_variables=flow_variables,
                        num_streams=S,
                        weights=args.weights,
                    )
                run_once = lambda: track_on_frame_streams(
                    stacked, model, variables, cfg, td, engine=engine,
                    depth_streams=dstreams, prestacked=True,
                )
            else:
                frames = make_synthetic_frames(
                    num_frames=args.frames, height=H, width=W
                )
                dframes = make_depth(7) if use_depth else None
                if args.source == "device":
                    frames = [jax.device_put(f) for f in frames]
                    if dframes is not None:
                        dframes = [jax.device_put(d) for d in dframes]
                    jax.block_until_ready(frames[-1])
                if args.engine == "artifact":
                    engine = build_artifact_engine(td)
                else:
                    # one engine across trials: reuse compiled executables
                    engine = InferenceEngine(
                        model, variables, cfg,
                        flow_model=flow_model, flow_variables=flow_variables,
                        weights=args.weights,
                    )
                run_once = lambda: track_on_frames(
                    frames, model, variables, cfg, td, engine=engine,
                    depth_frames=dframes,
                )
            run_once()  # warm compile
            if args.profile:
                from mfcnet_tpu.utils.profiling import trace

                with trace(args.profile):
                    run_once()
            best = 0.0
            for _ in range(args.trials):
                _, fps = run_once()
                best = max(best, fps)
        # NOTE: in this test harness the TPU sits behind a remote tunnel
        # with ~5 MB/s host<->device bandwidth; with --source video|ram the
        # per-frame upload alone bounds the number (0.9 MB/frame ≈ 5 fps
        # ceiling regardless of compute). On a directly attached chip those
        # modes are compute-bound; --source device removes the tunnel from
        # the measured path and is the faithful product number here.
        row = {
            "metric": (
                f"mfcnet_e2e_tracking_{H}x{W}_{args.dtype}_{args.decode}"
                + (f"_{args.source}" if args.source != "video" else "")
                + (("_flowFFPP" if args.flow == "FlowFormerPlusPlus"
                    else f"_flow{args.flow}") if use_flow else "")
                + ("_depth" if use_depth else "")
                + (f"_streams{S}" if S > 1 else "")
                + ("_artifact" if args.engine == "artifact" else "")
                + ("_fused" if args.fused else "")
            ),
            "value": round(best, 2),
            "unit": "frames/sec/chip",
            "vs_baseline": round(best / 60.0, 3),
        }
        # the sources below ship frames host->device through this
        # harness's ~5 MB/s tunnel each step; the _device row is the
        # faithful product-pipeline number (frames already in HBM)
        if args.source == "video":
            row["note"] = (
                "harness-tunnel-bound (video decode + per-frame H2D "
                "over ~5 MB/s); see the _device row for the "
                "product-pipeline number"
            )
        elif args.source == "ram":
            row["note"] = (
                "per-frame H2D over the harness tunnel partially "
                "overlapped with compute; see the _device row"
            )
        if args.weights == "packed" and args.source != "video" \
                and args.engine != "artifact":
            row["weights"] = "packed"  # see --weights help / flatpack.py
        # fixture disclosure: deviations from the production TrackerConfig
        # made for random-init realism (see NOTES_ROUND4.md "Fixture
        # realism") — a reader of this row must be able to tell the
        # number excludes the exact-decode tie-fallback cost
        row["fixture"] = (
            "decode_tie_fallback=False (random speckle masks near-tie "
            "top-2 components ~every frame; trained checkpoints flag "
            "~0.25% — production default ON)"
        )
        if use_flow:
            row["fixture"] += (
                f"; {args.flow} update_block/flow2 head weights scaled "
                "0.02x so the frozen random-init provider emits bounded "
                "~±3 px flow instead of garbage (same compute graph)"
            )
        if use_flow:
            row["note"] = (
                f"flow-conditioned config: +{T - 1} frozen {args.flow} "
                "forwards per frame (reference pairs are (current, "
                "prev_i) — not cacheable across frames) on top of the "
                "RGB-only pipeline the 60 fps north star is defined for"
            )
        if use_depth:
            row["note"] = (row.get("note", "") + (
                "; depth-conditioned (BASELINE config 4): precomputed "
                "depth maps as a 4th input channel, synthetic uint8 "
                "stand-ins here"
            )).lstrip("; ")
            row["fixture"] += (
                "; head Conv_0 depth-channel slice scaled 0.02x so the "
                "random-init depth pathway does not fragment the masks "
                "into worst-case speckle (same compute graph; decode "
                "runs its production tier — trained-checkpoint mask "
                "statistics, cf. the ~2% train-side depth delta)"
            )
        if S > 1:
            row["note"] = (
                f"AGGREGATE fps across {S} lockstep video streams on one "
                "chip (chip is compute-saturated at 1 stream, so "
                "aggregate ~= single-stream; multi-chip scale-out via "
                "stream_shards)"
            )
        if args.engine == "artifact":
            row["note"] = (
                "serving from the exported StableHLO artifact "
                "(no model code/checkpoint) — overhead vs the live "
                "engine's _device row"
            )
        print(json.dumps(row))
        return

    if args.mode == "train":
        # training throughput, README flagship recipe (JIGSAWS multiframe:
        # batch 4, nll+soft_jaccard 0.7/0.3, class wts [1,1000x4], Adam
        # differential LRs, train_base_model) — f32, device-resident batch
        from mfcnet_tpu.train.schedule import make_schedule
        from mfcnet_tpu.train.state import TrainState, multiframe_optimizer
        from mfcnet_tpu.train.steps import make_multiframe_train_step

        T, C, H, W = 3, 5, args.height, args.width
        B = args.batch
        use_flow = args.flow != "none"
        use_depth = args.depth
        # remat: full-scale batch-4 training does not fit 16 GB HBM
        # without encoder/decoder-block rematerialization
        model = get_multiframe_segmentation_model(
            "TernausNetMulti-Basic", num_classes=C, num_input_frames=T,
            remat=True, add_optflow_inputs=use_flow,
            add_depth_inputs=use_depth,
        )
        init_kw = {}
        if use_depth:
            init_kw["depth"] = np.zeros((1, T, H, W, 1), np.float32)
        variables = jit_init(
            model, jax.random.PRNGKey(0),
            np.zeros((1, T, H, W, 3), np.float32), **init_kw,
        )
        tx = multiframe_optimizer(
            make_schedule("StepDecay", 1e-4, 20, 100), T,
            train_base_model=True, base_pretrained_loaded=True,
        )
        state = TrainState.create(
            model.apply, variables["params"], tx,
            variables.get("batch_stats", {}),
        )
        flow_fn = None
        if use_flow:
            # frozen full-res provider inside the step, reference default
            # RAFT (configs/config_multiframe.py:75, src/engine.py:39-53).
            # fused_update stays OFF: MEASURED NEGATIVE at train scale
            # (r5): the tracker's 5.5x iteration win is specific to
            # 30x40 tokens where XLA's convs are relayout-bound; the
            # train step's full-res 8 x 4800 tokens exceed the kernel's
            # VMEM stack (needs 4-way batch chunking) and XLA's convs
            # are efficient at 60x80 — 0.928 vs 0.977 steps/s.
            # FIXTURE (same as the e2e rows, disclosed in the row): the
            # production provider is frozen PRETRAINED (the reference
            # loads raft_large weights) and emits bounded flow; a
            # random-init head emits garbage that forces the patch
            # lookup's exact-fallback cond every iteration — scale
            # update_block/flow2 so the step measures the real path.
            import flax

            if args.flow == "RAFT":
                from mfcnet_tpu.models.raft import (
                    RAFT, make_raft_flow_fn,
                )

                fmodel = RAFT(iters=12)
                fvars = jit_init(
                    fmodel, jax.random.PRNGKey(1),
                    np.zeros((1, H, W, 3), np.float32),
                    np.zeros((1, H, W, 3), np.float32),
                )
                fv = flax.core.unfreeze(fvars)
                fl2 = fv["params"]["update_block"]["flow2"]
                fl2["kernel"] = fl2["kernel"] * 0.02
                fl2["bias"] = fl2["bias"] * 0.02
                flow_fn = make_raft_flow_fn(
                    basic=True, variables=fv, input_hw=(H, W),
                )
            else:
                from mfcnet_tpu.cli.train_multiframe_detection import (
                    build_flow_fn,
                )

                flow_fn = build_flow_fn(
                    args.flow, "TernausNetMulti-Basic", (H, W),
                )
        step = make_multiframe_train_step(
            model, ["nll", "soft_jaccard"], [0.7, 0.3], C,
            class_weights=[1, 1000, 1000, 1000, 1000],
            train_base_model=True,
            # bf16 = mixed precision (f32 master params/opt/BN stats)
            compute_dtype=args.dtype,
            flow_fn=flow_fn,
        )
        rng = np.random.RandomState(0)
        batch = {
            "frames": jax.device_put(
                rng.rand(B, T, H, W, 3).astype(np.float32)
            ),
            "mask": jax.device_put(
                rng.randint(0, C, (B, H, W)).astype(np.int32)
            ),
        }
        if use_depth:
            batch["depth"] = jax.device_put(
                rng.rand(B, T, H, W, 1).astype(np.float32)
            )
        state, parts = step(state, batch)  # compile
        float(list(parts.values())[0])
        if args.profile:
            from mfcnet_tpu.utils.profiling import trace

            with trace(args.profile):
                for _ in range(3):
                    state, parts = step(state, batch)
                float(list(parts.values())[0])
        n = max(5, args.frames // 10)
        best = 0.0
        for _ in range(args.trials):
            t0 = time.perf_counter()
            for _ in range(n):
                state, parts = step(state, batch)
            float(list(parts.values())[0])  # drain the tunnel queue
            best = max(best, n / (time.perf_counter() - t0))
        row = {
            "metric": (
                f"mfcnet_train_step_{H}x{W}_b{B}_{args.dtype}"
                + (("_flowFFPP" if args.flow == "FlowFormerPlusPlus"
                    else f"_flow{args.flow}") if use_flow else "")
                + ("_depth" if use_depth else "")
            ),
            "value": round(best * B * T, 2),
            "unit": "frames/sec/chip",
            "vs_baseline": round(best, 3),
            "note": "value = frame-windows/s x T frames; vs_baseline = "
                    "optimizer steps/s",
        }
        if use_flow and args.flow == "RAFT":
            row["fixture"] = (
                "RAFT update_block/flow2 head weights scaled 0.02x: "
                "the production provider is frozen PRETRAINED and "
                "emits bounded flow; random-init garbage flow forces "
                "the patch lookup's exact-fallback cond every "
                "iteration (same compute graph; same fixture as the "
                "e2e rows)"
            )
        row.update(mfu_fields(step, (state, batch), B * T, best * B * T))
        print(json.dumps(row))
        return

    if args.mode == "incremental" and args.record_detail != "none" \
            and args.weights == "closure":
        # Driver-window armor for the headline. The closure-form step's
        # serialized executable is ~416 MB (weights baked as XLA
        # constants) and this harness's backend takes 200-500 s to
        # compile/load it per process — highly variable with server
        # load (r04: the headline ate 486 s of the 600 s window and all
        # detail rows starved). Plan: (1) measure the PACKED form
        # in-process first (~40-120 s, small executable) as a
        # guaranteed headline; (2) attempt the closure form in a
        # BOUNDED subprocess sized so the detail rows keep a reserve;
        # (3) print whichever landed (closure preferred — it is the
        # real product number) and run the detail rows on the rest.
        args.weights = "packed"
        args._closure_attempt = True

    T, C, H, W = 3, 5, args.height, args.width
    B = args.batch
    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", num_classes=C, num_input_frames=T
    )
    frames0 = np.zeros((1, T, H, W, 3), np.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), frames0)
    stamp("model init done")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cvars = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        variables,
    )
    if args.weights == "packed":
        from mfcnet_tpu.utils.flatpack import (
            pack_variables, unpack_variables,
        )

        packed, pack_spec = pack_variables(cvars)
        jax.block_until_ready(packed)

        def get_cvars(bufs):
            return unpack_variables(bufs, pack_spec)
    else:
        packed = ()

        def get_cvars(bufs):
            return cvars

    if args.mode == "incremental":
        # s2d ring buffer of per-frame class maps; one base fwd per new
        # frame; args.chunk frames per device launch via lax.scan. The
        # buffer lives in the space-to-depth domain end to end (see
        # MultiFrameHead): base output folds via a one-hot strided conv,
        # the fusion head reads the buffer through a channel-permuted
        # packed kernel, and softmax/argmax run per phase — zero layout
        # transposes per frame. Outputs are identical to the plain path
        # (parity-tested in tests/test_models.py).
        K = max(1, args.chunk)
        F = 4
        Hb, Wb = H // F, W // F

        def _d2s1(y):
            # (B, Hb, Wb, 16) single-channel unfold
            return y.reshape(B, Hb, Wb, F, F).transpose(
                0, 1, 3, 2, 4
            ).reshape(B, H, W)

        def one_frame(cv, buf, new_frame):
            seg_new = model.apply(
                cv, new_frame, method="base_forward_s2d"
            )  # (B, Hb, Wb, 16*C)
            buf = jnp.concatenate(
                [seg_new, buf[..., : (T - 1) * 16 * C]], axis=-1
            )  # newest first
            logits = model.apply(
                cv, buf, method="fuse_s2d", orig_hw=(H, W)
            )  # (B, Hb, Wb, 16*C)
            # decode-adjacent work stays on device: per-frame class mask +
            # the two tip heatmaps are all the tracker's host decode needs
            p = jax.nn.softmax(
                logits.reshape(B, Hb, Wb, 16, C).astype(jnp.float32),
                axis=-1,
            )
            mask = _d2s1(jnp.argmax(p, axis=-1).astype(jnp.uint8))
            return buf, (mask, _d2s1(p[..., 2]), _d2s1(p[..., 4]))

        @jax.jit
        def step(seg_buf, frames_k, *bufs):
            cv = get_cvars(bufs)
            return jax.lax.scan(
                lambda b, f: one_frame(cv, b, f), seg_buf, frames_k
            )

        seg_buf = jnp.zeros((B, Hb, Wb, T * 16 * C), dtype)
        frames_k = jnp.zeros((K, B, H, W, 3), dtype)
        seg_buf, out = step(seg_buf, frames_k, *packed)  # compile
        float(out[0][0, 0, 0, 0])
        stamp("step compiled")
        example_args = (seg_buf, frames_k) + tuple(packed)

        def run(n):
            nonlocal seg_buf
            iters = max(1, n // K)
            t0 = time.perf_counter()
            for _ in range(iters):
                seg_buf, out = step(seg_buf, frames_k, *packed)
            # force completion with a scalar readback — block_until_ready
            # alone does not drain the remote execution queue on the axon
            # tunnel backend
            float(out[0][0, 0, 0, 0])
            return (time.perf_counter() - t0) * (n / (iters * K))
    else:
        @jax.jit
        def step(frames, *bufs):
            logits = model.apply(get_cvars(bufs), frames)
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        frames = jnp.zeros((B, T, H, W, 3), dtype)
        out = step(frames, *packed)
        float(out[0, 0, 0, 0])
        stamp("step compiled")
        example_args = (frames,) + tuple(packed)

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = step(frames, *packed)
            float(out[0, 0, 0, 0])  # force completion (see above)
            return time.perf_counter() - t0

    run(10)  # warmup
    stamp("warmup done")
    if args.profile:
        from mfcnet_tpu.utils.profiling import trace

        with trace(args.profile):
            run(min(args.frames, 50))
    trial_fps = [
        round(args.frames * B / run(args.frames), 2)
        for _ in range(args.trials)
    ]
    stamp(f"trials done: {trial_fps}")
    fps = max(trial_fps)
    headline = {
        "metric": (
            f"mfcnet_3frame_{H}x{W}_inference_{args.mode}_{args.dtype}"
            + (f"_b{B}" if B > 1 else "")
        ),
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 60.0, 3),
        # variance record: a single number can't distinguish environment
        # noise from a regression (r04's 113.6 vs r03's 120.7 was
        # unclassifiable) — every trial's fps goes on the record
        "trials": args.trials,
        "trial_fps": trial_fps,
        "spread_pct": round(
            100.0 * (max(trial_fps) - min(trial_fps)) / max(trial_fps), 1
        ),
    }
    frames_per_call = K * B if args.mode == "incremental" else B
    headline.update(mfu_fields(step, example_args, frames_per_call, fps))
    stamp("mfu/cost-analysis done")
    if args.mode == "full" and B == 1:
        # reference semantics (T base forwards per frame), single window:
        # the latency-bound configuration. Batched windows meet the gate;
        # the incremental mode (output-bit-identical, what a tracker
        # actually runs) is the product metric — docs/PERFORMANCE.md.
        headline["note"] = (
            "single-window latency config (MXU underfed at b=1); "
            "--batch 16 meets the 60 fps gate under the same semantics, "
            "and the incremental mode is output-bit-identical at ~2x"
        )
    if args.weights == "packed":
        headline["weights"] = "packed"
        headline["note"] = (headline.get("note", "") + (
            "; weights passed as shape-grouped stacked args "
            "(utils/flatpack.py) so the executable is ~7 MB instead of "
            "~416 MB — required to fit the driver's bench window on "
            "this tunnel harness; costs ~4% fps vs the closure form's "
            "compile-time weight prep"
        )).lstrip("; ")
    if getattr(args, "_closure_attempt", False):
        # driver-window armor step 2 (see the block near the top of
        # main): the packed headline above is the guaranteed result;
        # now attempt the closure-form headline in a bounded
        # subprocess, reserving ~3 x 75 s for the detail rows.
        import subprocess
        import sys

        if args.detail_budget:
            reserve = 3 * 75.0 + 20.0
            sub_timeout = (args.detail_budget
                           - (time.perf_counter() - t_start) - reserve)
        else:
            sub_timeout = 2100.0  # unbudgeted (builder full sweeps)
        if sub_timeout > 60:
            cmd = [sys.executable, __file__, "--record_detail", "none",
                   "--weights", "closure", "--dtype", args.dtype,
                   "--mode", "incremental", "--frames",
                   str(args.frames), "--trials", str(args.trials)]
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=sub_timeout,
                )
                closure = json.loads(
                    proc.stdout.strip().splitlines()[-1]
                )
                closure["packed_fps"] = headline["value"]
                headline = closure
                stamp("closure headline subprocess done")
            except Exception as e:
                print(
                    f"[headline] closure-form subprocess did not fit "
                    f"({sub_timeout:.0f}s): {e}; keeping the packed-"
                    f"form headline", file=sys.stderr,
                )
        else:
            print(
                f"[headline] no budget for the closure-form attempt "
                f"({sub_timeout:.0f}s left after reserve); keeping "
                f"the packed-form headline", file=sys.stderr,
            )
    # headline FIRST: the detail runs below take ~30 min and a driver
    # timeout must not cost the headline line
    print(json.dumps(headline), flush=True)
    run_detail_rows(args, [headline], t_start)


def run_detail_rows(args, results, t_start):
    """Measure the other BASELINE configs in subprocesses and merge the
    rows into BENCH_DETAIL.json. 'fast' = 3 cheap packed-weights rows
    under a hard wall-clock budget (the driver's default invocation MUST
    exit 0 inside its window — round 3's full sweep hit the window and
    recorded rc=124; round 4's closure-form rows starved it); 'full' =
    the complete sweep over every BASELINE.md config (builder
    sessions)."""
    import json
    import subprocess
    import sys
    import time

    if args.record_detail == "none":
        return

    fast_rows = [
        ["--mode", "full", "--frames", "60", "--trials", "2"],
        ["--mode", "full", "--frames", "64", "--trials", "2",
         "--batch", "16"],
        ["--mode", "e2e", "--source", "device", "--frames", "200",
         "--trials", "2"],
    ]
    full_rows = fast_rows + [
        ["--mode", "e2e", "--frames", "60", "--trials", "1"],
        ["--mode", "e2e", "--source", "ram", "--frames", "60",
         "--trials", "1"],
        ["--mode", "e2e", "--source", "device", "--flow", "RAFT",
         "--frames", "100", "--trials", "2"],
        ["--mode", "e2e", "--source", "device", "--flow",
         "FlowFormerPlusPlus", "--frames", "60", "--trials", "2"],
        ["--mode", "e2e", "--source", "device", "--flow", "RAFT",
         "--depth", "true", "--frames", "100", "--trials", "2"],
        ["--mode", "e2e", "--source", "device", "--streams", "4",
         "--frames", "100", "--trials", "2"],
        ["--mode", "e2e", "--source", "device",
         "--engine", "artifact", "--frames", "100", "--trials", "2"],
        ["--mode", "single", "--model", "UNet", "--frames", "100",
         "--trials", "2"],
        ["--mode", "single", "--model", "TernausNet16",
         "--frames", "100", "--trials", "2"],
        ["--mode", "single", "--model", "ResUNet", "--frames", "100",
         "--trials", "2"],
        ["--mode", "flowgen", "--flow", "RAFT", "--frames", "48",
         "--trials", "2"],
        ["--mode", "train", "--frames", "100", "--trials", "2",
         "--dtype", "float32"],
        ["--mode", "train", "--frames", "100", "--trials", "2",
         "--dtype", "bfloat16"],
        ["--mode", "train", "--frames", "60", "--trials", "2",
         "--dtype", "bfloat16", "--flow", "RAFT"],
        ["--mode", "train", "--frames", "60", "--trials", "2",
         "--dtype", "bfloat16", "--flow", "RAFT", "--depth", "true"],
    ]
    rows = fast_rows if args.record_detail == "fast" else full_rows
    budget = args.detail_budget

    results = list(results)
    for extra in rows:
        if budget:
            left = budget - (time.perf_counter() - t_start)
            if left < 45:
                print(
                    f"[detail] budget exhausted "
                    f"({budget:.0f}s): skipping {extra}",
                    file=sys.stderr,
                )
                continue
            # fast mode: cap each row so one server-slow compile cannot
            # starve the remaining rows (r5 shakedown: row 1 cold-compiled
            # for 373 s and rows 2-3 never ran); warm-cache rows take
            # 30-120 s, and a row that can't fit 180 s won't fit at all
            row_timeout = min(180 if args.record_detail == "fast"
                              else 2100, left)
        else:
            row_timeout = 2100  # cold remat-train compile > 20 min
        cmd = [sys.executable, __file__, "--record_detail", "none",
               "--dtype", args.dtype] + extra
        for attempt in (1, 2):  # the remote compile service can flake
            if budget and budget - (time.perf_counter() - t_start) < 45:
                break
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=row_timeout,
                )
                line = proc.stdout.strip().splitlines()[-1]
                results.append(json.loads(line))
                print(f"[detail] {line}", file=sys.stderr)
                break
            except Exception as e:  # detail is best-effort
                print(
                    f"[detail] {extra[1]} attempt {attempt} "
                    f"failed: {e}", file=sys.stderr,
                )
    import pathlib

    out_path = pathlib.Path(__file__).parent / "BENCH_DETAIL.json"
    if args.record_detail == "fast" and out_path.exists():
        # MERGE into the committed full-sweep record by metric name
        # instead of truncating it to the fast subset; refreshed rows
        # get a 'recorded' stamp so stale vs fresh is explicit
        try:
            old = {
                r["metric"]: r
                for r in json.loads(out_path.read_text())
            }
        except Exception:
            old = {}
        stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        for r in results:
            r["recorded"] = stamp
            old[r["metric"]] = r
        results = list(old.values())
    out_path.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
