"""Tracking from frozen serving artifacts (serve.ArtifactEngine).

The deployment configuration: video CLI / track_on_* driven by an
exported StableHLO artifact instead of model code + checkpoint. Rows must
be bit-identical to the live InferenceEngine pipeline on the same
weights.
"""

import numpy as np
import pytest


def _tiny_and_artifact(tmp_path, mode):
    import jax

    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.serve import (
        export_incremental, export_serving, save_exported,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", 5, 3, scale=0.1
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, 3, 64, 64, 3), np.float32),
    )
    meta = {
        "serving_mode": mode, "num_classes": 5, "num_input_frames": 3,
        "input_height": 64, "input_width": 64, "compute_dtype": "float32",
        "add_depth_inputs": False,
    }
    if mode == "incremental":
        exported, spec = export_incremental(
            model, variables, height=64, width=64, num_frames=3,
            num_classes=5, dtype="float32",
        )
        meta["state"] = {
            k: [list(s), d] for k, (s, d) in spec.items()
        }
    else:
        exported = export_serving(
            model, variables, height=64, width=64, num_frames=3,
            dtype="float32",
        )
    path = tmp_path / f"{mode}.stablehlo"
    save_exported(path, exported, meta=meta)
    return model, variables, path


@pytest.mark.parametrize("mode", ["incremental", "full"])
def test_artifact_rows_match_live_engine(tmp_path, mode):
    from mfcnet_tpu.data.synthetic import make_synthetic_frames
    from mfcnet_tpu.serve import ArtifactEngine
    from mfcnet_tpu.track.tracker import (
        TrackerConfig, track_on_frames,
    )

    model, variables, path = _tiny_and_artifact(tmp_path, mode)
    frames = make_synthetic_frames(num_frames=7, height=64, width=64,
                                   seed=4)
    cfg = TrackerConfig(
        num_input_frames=3, num_classes=5, input_height=64,
        input_width=64, dtype="float32", mode=mode, overlay=False,
    )
    rows_live, _ = track_on_frames(
        frames, model, variables, cfg, tmp_path / "live", name="v"
    )
    rows_art, _ = track_on_frames(
        frames, None, None, cfg, tmp_path / "art", name="v",
        engine=ArtifactEngine(path, cfg),
    )
    np.testing.assert_allclose(rows_art, rows_live, equal_nan=True)


def test_artifact_streams_match_live_engine(tmp_path):
    """B=2 lockstep streams through ONE incremental artifact (symbolic
    batch) vs the live batched engine: per-stream rows identical."""
    from mfcnet_tpu.data.synthetic import make_synthetic_frames
    from mfcnet_tpu.serve import ArtifactEngine
    from mfcnet_tpu.track.tracker import (
        InferenceEngine, TrackerConfig, track_on_frame_streams,
    )

    model, variables, path = _tiny_and_artifact(tmp_path, "incremental")
    streams = [
        make_synthetic_frames(num_frames=6, height=64, width=64, seed=s)
        for s in (21, 22)
    ]
    cfg = TrackerConfig(
        num_input_frames=3, num_classes=5, input_height=64,
        input_width=64, dtype="float32", mode="incremental",
        overlay=False,
    )
    rows_live, _ = track_on_frame_streams(
        streams, model, variables, cfg, tmp_path / "live",
        names=["a", "b"],
        engine=InferenceEngine(model, variables, cfg, num_streams=2),
    )
    rows_art, _ = track_on_frame_streams(
        streams, None, None, cfg, tmp_path / "art", names=["a", "b"],
        engine=ArtifactEngine(path, cfg, num_streams=2),
    )
    for ra, rl in zip(rows_art, rows_live):
        np.testing.assert_allclose(ra, rl, equal_nan=True)


def test_artifact_depth_rows_match_live_engine(tmp_path):
    """Depth-channel artifacts (incremental, non-s2d ring buffer) through
    the tracker: rows identical to the live engine."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_frames
    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.serve import (
        ArtifactEngine, export_incremental, save_exported,
    )
    from mfcnet_tpu.track.tracker import TrackerConfig, track_on_frames
    from mfcnet_tpu.utils.jitinit import jit_init

    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", 5, 3, scale=0.1, add_depth_inputs=True,
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, 3, 64, 64, 3), np.float32),
        depth=np.zeros((1, 3, 64, 64, 1), np.float32),
    )
    exported, spec = export_incremental(
        model, variables, height=64, width=64, num_frames=3,
        num_classes=5, dtype="float32", add_depth_inputs=True,
    )
    path = tmp_path / "d.stablehlo"
    save_exported(path, exported, meta={
        "serving_mode": "incremental", "num_classes": 5,
        "num_input_frames": 3, "input_height": 64, "input_width": 64,
        "compute_dtype": "float32", "add_depth_inputs": True,
        "state": {k: [list(s), d] for k, (s, d) in spec.items()},
    })
    frames = make_synthetic_frames(num_frames=6, height=64, width=64,
                                   seed=11)
    rng = np.random.default_rng(12)
    depth = [rng.integers(0, 256, (64, 64), dtype=np.uint8)
             for _ in frames]
    cfg = TrackerConfig(
        num_input_frames=3, num_classes=5, input_height=64,
        input_width=64, dtype="float32", mode="incremental",
        overlay=False, add_depth_inputs=True,
    )
    rows_live, _ = track_on_frames(
        frames, model, variables, cfg, tmp_path / "live", name="v",
        depth_frames=depth,
    )
    rows_art, _ = track_on_frames(
        frames, None, None, cfg, tmp_path / "art", name="v",
        depth_frames=depth, engine=ArtifactEngine(path, cfg),
    )
    np.testing.assert_allclose(rows_art, rows_live, equal_nan=True)


def test_artifact_engine_rejects_mismatch(tmp_path):
    from mfcnet_tpu.serve import ArtifactEngine
    from mfcnet_tpu.track.tracker import TrackerConfig

    _, _, path = _tiny_and_artifact(tmp_path, "incremental")
    bad = TrackerConfig(
        num_input_frames=3, num_classes=5, input_height=32,
        input_width=64, dtype="float32", mode="incremental",
    )
    with pytest.raises(ValueError, match="input_height"):
        ArtifactEngine(path, bad)


@pytest.mark.parametrize("mode", ["incremental", "full"])
def test_artifact_device_decode_matches_live_engine(tmp_path, mode):
    """--decode device through the artifact engine (the deployment
    configuration keeps the 18-floats-per-frame transfer discipline):
    rows identical to the live engine's device-decode run."""
    from mfcnet_tpu.data.synthetic import make_synthetic_frames
    from mfcnet_tpu.serve import ArtifactEngine
    from mfcnet_tpu.track.tracker import TrackerConfig, track_on_frames

    model, variables, path = _tiny_and_artifact(tmp_path, mode)
    frames = make_synthetic_frames(num_frames=7, height=64, width=64,
                                   seed=9)
    cfg = TrackerConfig(
        num_input_frames=3, num_classes=5, input_height=64,
        input_width=64, dtype="float32", mode=mode, overlay=False,
        decode="device",
    )
    rows_live, _ = track_on_frames(
        frames, model, variables, cfg, tmp_path / "live", name="v"
    )
    rows_art, _ = track_on_frames(
        frames, None, None, cfg, tmp_path / "art", name="v",
        engine=ArtifactEngine(path, cfg),
    )
    np.testing.assert_allclose(rows_art, rows_live, equal_nan=True)


def test_video_cli_artifact_matches_checkpoint_run(tmp_path):
    """End to end: train-format checkpoint -> export CLI -> video CLI
    --artifact; CSV bit-identical to the model+checkpoint run."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, multiframe_optimizer
    from mfcnet_tpu.utils.checkpoint import save_checkpoint
    from mfcnet_tpu.utils.jitinit import jit_init

    make_synthetic_video(tmp_path / "vids" / "a.mp4", num_frames=6,
                         height=64, width=64)
    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", 5, 3, scale=0.1
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, 3, 32, 32, 3), np.float32),
    )
    tx = multiframe_optimizer(make_schedule("Constant", 1e-4, 1, 1), 3,
                              False, False)
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)

    from mfcnet_tpu.cli.export_model import main as export_main

    art = tmp_path / "m.stablehlo"
    export_main([
        "--model_type", "TernausNetMulti-Basic",
        "--num_input_frames", "3",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
        "--serving_mode", "incremental",
        "--load_wts_model", str(ck),
        "--output", str(art),
        "--validate", "false",
    ])

    from mfcnet_tpu.cli.test_multiframe_segmentation_on_videos import main

    common = [
        "--videos_dir", str(tmp_path / "vids"),
        "--expt_savedir", str(tmp_path),
        "--input_height", "32",
        "--input_width", "32",
    ]
    fps_ck = main(common + [
        "--expt_name", "ckrun",
        "--model_type", "TernausNetMulti-Basic",
        "--load_wts_model", str(ck),
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
    ])
    fps_art = main(common + [
        "--expt_name", "artrun",
        "--artifact", str(art),
    ])
    assert len(fps_ck) == len(fps_art) == 1
    rows_ck = np.loadtxt(
        tmp_path / "ckrun" / "video_tracking_results" / "a_tracked.csv",
        delimiter=",",
    )
    rows_art = np.loadtxt(
        tmp_path / "artrun" / "video_tracking_results" / "a_tracked.csv",
        delimiter=",",
    )
    np.testing.assert_allclose(rows_art, rows_ck, equal_nan=True)


def test_video_cli_artifact_parallel_videos(tmp_path):
    """--artifact --parallel_videos 2: batched artifact serving; CSVs
    identical to the sequential artifact run."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video

    for n in ("a", "b"):
        make_synthetic_video(tmp_path / "vids" / f"{n}.mp4",
                             num_frames=5, height=64, width=64)
    _, _, art = _tiny_and_artifact(tmp_path, "incremental")

    from mfcnet_tpu.cli.test_multiframe_segmentation_on_videos import main

    common = [
        "--videos_dir", str(tmp_path / "vids"),
        "--expt_savedir", str(tmp_path),
        "--input_height", "64",
        "--input_width", "64",
        "--artifact", str(art),
    ]
    main(common + ["--expt_name", "seq"])
    main(common + ["--expt_name", "par", "--parallel_videos", "2"])
    for n in ("a", "b"):
        seq = np.loadtxt(
            tmp_path / "seq" / "video_tracking_results" / f"{n}_tracked.csv",
            delimiter=",",
        )
        par = np.loadtxt(
            tmp_path / "par" / "video_tracking_results" / f"{n}_tracked.csv",
            delimiter=",",
        )
        np.testing.assert_allclose(par, seq, equal_nan=True)


@pytest.mark.parametrize("model_type,decode", [
    ("TernausNet16", "host"),
    ("TernausNet16", "device"),
    ("UNet", "host"),
])
def test_singleframe_video_cli_artifact_matches_checkpoint_run(
    tmp_path, model_type, decode
):
    """Single-frame artifact through the single-frame video CLI: CSV
    bit-identical to the model+checkpoint run — BOTH output-adapter
    families (TernausNet emits log-probs; UNet emits raw logits, the
    family where the artifact must replicate the CLI's exact
    log_softmax-in-compute-dtype + exp-in-f32 math)."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import get_tooltip_segmentation_model
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, singleframe_optimizer
    from mfcnet_tpu.utils.checkpoint import save_checkpoint
    from mfcnet_tpu.utils.jitinit import jit_init

    make_synthetic_video(tmp_path / "vids" / "a.mp4", num_frames=5,
                         height=64, width=64)
    model = get_tooltip_segmentation_model(model_type, 5, scale=0.1)
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
    )
    state = TrainState.create(
        model.apply, variables["params"],
        singleframe_optimizer(make_schedule("Constant", 1e-4, 1, 1)),
        variables.get("batch_stats", {}),
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)

    from mfcnet_tpu.cli.export_model import main as export_main

    art = tmp_path / "sf.stablehlo"
    export_main([
        "--task", "singleframe",
        "--model_type", model_type,
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
        "--load_wts_model", str(ck),
        "--output", str(art),
        "--validate", "false",
    ])

    from mfcnet_tpu.cli.test_toolpose_segmentation_on_videos import main

    common = [
        "--videos_dir", str(tmp_path / "vids"),
        "--expt_savedir", str(tmp_path),
        "--input_height", "32",
        "--input_width", "32",
    ]
    main(common + [
        "--expt_name", "ckrun",
        "--model_type", model_type,
        "--load_wts_model", str(ck),
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
        "--decode", decode,
    ])
    main(common + ["--expt_name", "artrun", "--artifact", str(art),
                   "--decode", decode])
    rows_ck = np.loadtxt(
        tmp_path / "ckrun" / "video_tracking_results" / "a_tracked.csv",
        delimiter=",",
    )
    rows_art = np.loadtxt(
        tmp_path / "artrun" / "video_tracking_results" / "a_tracked.csv",
        delimiter=",",
    )
    np.testing.assert_allclose(rows_art, rows_ck, equal_nan=True)


def test_video_cli_requires_model_or_artifact(tmp_path):
    from mfcnet_tpu.cli.test_multiframe_segmentation_on_videos import main

    with pytest.raises(SystemExit, match="artifact"):
        main([
            "--videos_dir", str(tmp_path),
            "--expt_savedir", str(tmp_path),
            "--expt_name", "x",
        ])


def test_artifact_engine_rejects_flow_flag_mismatch(tmp_path):
    """A flow-less artifact served under a flow-enabled config (or vice
    versa) is a silent model-semantics swap — it must raise like every
    other header/config mismatch."""
    from mfcnet_tpu.serve import ArtifactEngine
    from mfcnet_tpu.serve.export import LoadedServing, load_exported
    from mfcnet_tpu.track.tracker import TrackerConfig

    _, _, path = _tiny_and_artifact(tmp_path, "full")
    loaded = load_exported(path)
    meta = dict(loaded.meta)
    meta["add_optflow_inputs"] = False
    relabeled = LoadedServing(meta, loaded.exported)

    cfg = TrackerConfig(
        num_input_frames=3, num_classes=5, input_height=64,
        input_width=64, overlay=False, mode="full",
        add_optflow_inputs=True,
    )
    with pytest.raises(ValueError, match="add_optflow_inputs"):
        ArtifactEngine(relabeled, cfg)
