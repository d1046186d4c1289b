"""Video tracker end-to-end test on a synthetic video (CPU, tiny model)."""

import numpy as np
import pytest


def test_track_on_video_end_to_end(tmp_path):
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import TrackerConfig, track_on_video
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 64, 64, 3, 5
    video = make_synthetic_video(
        tmp_path / "vid" / "demo.mp4", num_frames=10, height=H, width=W
    )

    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, T, H, W, 3), np.float32)
    )
    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32", mode="incremental",
    )
    rows, fps = track_on_video(
        video, model, variables, cfg, tmp_path / "out"
    )
    assert rows.shape == (10, 12)
    # first T-1 frames have no window -> all NaN
    assert np.all(np.isnan(rows[: T - 1]))
    csv = tmp_path / "out" / "demo_tracked.csv"
    mp4 = tmp_path / "out" / "demo_tracked.mp4"
    assert csv.exists() and mp4.exists()
    loaded = np.loadtxt(csv, delimiter=",")
    assert loaded.shape == (10, 12)


def test_track_on_frames_ram_and_device_sources(tmp_path):
    """track_on_frames (bench --mode e2e --source ram|device): identical
    CSV rows from host-numpy frames and pre-device_put frames, engine
    reuse across calls, and agreement with track_on_video when the video
    frames are bit-identical (lossless writer not guaranteed by mp4, so
    video agreement is checked structurally via the RAM path only)."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_frames
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import (
        InferenceEngine,
        TrackerConfig,
        track_on_frames,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 64, 64, 3, 5
    frames = make_synthetic_frames(num_frames=8, height=H, width=W, seed=9)
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(3), np.zeros((1, T, H, W, 3), np.float32)
    )
    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32", mode="incremental", overlay=False,
    )
    rows_ram, fps = track_on_frames(
        frames, model, variables, cfg, tmp_path / "ram", name="ram"
    )
    assert rows_ram.shape == (8, 12) and fps > 0
    assert (tmp_path / "ram" / "ram_tracked.csv").exists()
    assert np.all(np.isnan(rows_ram[: T - 1]))

    # device-resident source through a reused engine: identical rows
    engine = InferenceEngine(model, variables, cfg)
    dev_frames = [jax.device_put(f) for f in frames]
    rows_dev, _ = track_on_frames(
        dev_frames, model, variables, cfg, tmp_path / "dev", name="dev",
        engine=engine,
    )
    np.testing.assert_allclose(rows_ram, rows_dev, equal_nan=True)
    rows_dev2, _ = track_on_frames(
        dev_frames, model, variables, cfg, tmp_path / "dev2", name="dev2",
        engine=engine,
    )
    np.testing.assert_allclose(rows_dev, rows_dev2, equal_nan=True)


def test_fused_dispatch_identical(tmp_path):
    """fused_dispatch=True (ingest+fuse as one jitted call per frame)
    must produce identical masks/heats to the two-dispatch engine."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_frames
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 64, 64, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(6), np.zeros((1, T, H, W, 3), np.float32)
    )
    frames = make_synthetic_frames(num_frames=7, height=H, width=W,
                                   seed=13)
    engines = {
        fused: InferenceEngine(model, variables, TrackerConfig(
            num_input_frames=T, num_classes=C, input_height=H,
            input_width=W, dtype="float32", mode="incremental",
            overlay=False, fused_dispatch=fused,
        ))
        for fused in (False, True)
    }
    for t, frame in enumerate(frames):
        outs = {f: e.step(frame) for f, e in engines.items()}
        assert (outs[False] is None) == (outs[True] is None)
        if outs[False] is None:
            continue
        np.testing.assert_array_equal(outs[True][0], outs[False][0])
        np.testing.assert_array_equal(outs[True][1], outs[False][1])


def test_incremental_and_full_modes_agree(tmp_path):
    """The ring-buffer tracker must produce the same CSV as full recompute."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import TrackerConfig, track_on_video
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 64, 64, 3, 5
    video = make_synthetic_video(
        tmp_path / "vid" / "demo2.mp4", num_frames=8, height=H, width=W,
        seed=5,
    )
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(2), np.zeros((1, T, H, W, 3), np.float32)
    )
    rows = {}
    for mode in ("incremental", "full"):
        cfg = TrackerConfig(
            num_input_frames=T, num_classes=C, input_height=H,
            input_width=W, dtype="float32", mode=mode, overlay=False,
        )
        rows[mode], _ = track_on_video(
            video, model, variables, cfg, tmp_path / mode
        )
    np.testing.assert_allclose(
        rows["incremental"], rows["full"], equal_nan=True
    )


def test_engine_probs_identical_between_modes():
    """Compare raw per-frame device probabilities between modes, including
    the warmup frames (the incremental ring buffer must ingest every frame
    from the first one)."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 32, 32, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(7), np.zeros((1, T, H, W, 3), np.float32)
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, H, W, 3), dtype=np.uint8)

    engines = {
        mode: InferenceEngine(
            model, variables,
            TrackerConfig(num_input_frames=T, num_classes=C,
                          input_height=H, input_width=W, dtype="float32",
                          mode=mode),
        )
        for mode in ("incremental", "full")
    }
    for t in range(6):
        outs = {m: e.step(frames[t]) for m, e in engines.items()}
        assert (outs["incremental"] is None) == (outs["full"] is None)
        if outs["incremental"] is not None:
            np.testing.assert_allclose(
                outs["incremental"][1], outs["full"][1], atol=2e-6,
                err_msg=f"frame {t}",
            )


def test_engine_packed_weights_identical():
    """weights='packed' (shape-grouped stacked-arg variables —
    utils/flatpack.py, the driver-window-sized executables) must match
    the closure-constant default, in both engine modes, incl. a flow
    provider exercising the packed flow variables. Equality is
    tight-allclose, not bitwise: XLA fuses constant-weight and
    param-weight programs differently (reassociation-level drift only;
    integer outputs like the argmax mask must still be equal a.e.)."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.models.raft import RAFT
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 32, 32, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(7), np.zeros((1, T, H, W, 3), np.float32)
    )
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (6, H, W, 3), dtype=np.uint8)

    for mode in ("incremental", "full"):
        cfg = TrackerConfig(
            num_input_frames=T, num_classes=C, input_height=H,
            input_width=W, dtype="float32", mode=mode,
        )
        ref = InferenceEngine(model, variables, cfg)
        pk = InferenceEngine(model, variables, cfg, weights="packed")
        for t in range(6):
            a, b = ref.step(frames[t]), pk.step(frames[t])
            assert (a is None) == (b is None)
            if a is not None:
                for x, y in zip(a, b):
                    xf = np.asarray(x).astype(np.float64)
                    yf = np.asarray(y).astype(np.float64)
                    if xf.dtype == yf.dtype and np.issubdtype(
                        np.asarray(x).dtype, np.integer
                    ):
                        # class masks: reassociation can flip argmax only
                        # on exact ties; demand near-total agreement
                        assert (xf != yf).mean() < 1e-3
                    else:
                        # f16 outputs (shipped tip heats): 1 ulp ~ 1e-3
                        tol = 2e-3 if np.asarray(x).dtype == np.float16 \
                            else 5e-6
                        np.testing.assert_allclose(
                            xf, yf, atol=tol, rtol=1e-5
                        )

    # flow provider: packed flow variables path
    fmodel = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    fvariables = jit_init(
        fmodel, jax.random.PRNGKey(8),
        np.zeros((1, T, H, W, 3), np.float32),
        optflow=np.zeros((1, T - 1, H, W, 2), np.float32),
    )
    flow_model = RAFT(iters=1)
    flow_vars = jit_init(
        flow_model, jax.random.PRNGKey(9),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
    )
    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H,
        input_width=W, dtype="float32", mode="incremental",
        add_optflow_inputs=True,
    )
    ref = InferenceEngine(
        fmodel, fvariables, cfg, flow_model=flow_model,
        flow_variables=flow_vars,
    )
    pk = InferenceEngine(
        fmodel, fvariables, cfg, flow_model=flow_model,
        flow_variables=flow_vars, weights="packed",
    )
    for t in range(5):
        a, b = ref.step(frames[t]), pk.step(frames[t])
        assert (a is None) == (b is None)
        if a is not None:
            for x, y in zip(a, b):
                xf = np.asarray(x).astype(np.float64)
                yf = np.asarray(y).astype(np.float64)
                if np.issubdtype(np.asarray(x).dtype, np.integer):
                    assert (xf != yf).mean() < 1e-3
                else:
                    tol = 2e-3 if np.asarray(x).dtype == np.float16 \
                        else 5e-6
                    np.testing.assert_allclose(
                        xf, yf, atol=tol, rtol=1e-5
                    )


@pytest.mark.parametrize("T", [2, 5])
def test_engine_modes_agree_nondefault_window(T):
    """Temporal-window scaling (reference --num_input_frames,
    configs/config_multiframe.py:20-21): the incremental s2d ring buffer's
    (t, (sy, sx, c)) channel permutation and newest-first shifting must
    hold for any T, not just the default 3."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, C = 32, 32, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(11),
        np.zeros((1, T, H, W, 3), np.float32),
    )
    engines = {
        mode: InferenceEngine(
            model, variables,
            TrackerConfig(num_input_frames=T, num_classes=C,
                          input_height=H, input_width=W, dtype="float32",
                          mode=mode),
        )
        for mode in ("incremental", "full")
    }
    assert engines["incremental"]._use_s2d  # the fast path is under test
    rng = np.random.default_rng(T)
    frames = rng.integers(0, 255, (T + 4, H, W, 3), dtype=np.uint8)
    compared = 0
    for t in range(T + 4):
        outs = {m: e.step(frames[t]) for m, e in engines.items()}
        assert (outs["incremental"] is None) == (outs["full"] is None)
        if outs["incremental"] is not None:
            np.testing.assert_array_equal(
                outs["incremental"][0], outs["full"][0],
                err_msg=f"T={T} frame {t} class mask",
            )
            # heats ship as f16; the two modes' f32 values differ only at
            # reassociation level (~3e-7, measured), but that can straddle
            # an f16 rounding boundary -> one-ulp (~1e-4 at p~0.2) steps
            np.testing.assert_allclose(
                outs["incremental"][1], outs["full"][1], atol=1.5e-4,
                err_msg=f"T={T} frame {t}",
            )
            compared += 1
    assert compared == 5  # warmup is T-1 frames


def test_tracker_with_optical_flow(tmp_path):
    """Flow-enabled tracking (reference v3 flow path: half-res RAFT,
    x2 upscale): runs end to end, modes agree."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.models.raft import RAFT
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 64, 64, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(3),
        np.zeros((1, T, H, W, 3), np.float32),
        optflow=np.zeros((1, T - 1, H, W, 2), np.float32),
    )
    flow_model = RAFT(iters=1)
    flow_vars = jit_init(
        flow_model, jax.random.PRNGKey(4),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
    )
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (5, H, W, 3), dtype=np.uint8)
    engines = {
        mode: InferenceEngine(
            model, variables,
            TrackerConfig(num_input_frames=T, num_classes=C,
                          input_height=H, input_width=W, dtype="float32",
                          mode=mode, add_optflow_inputs=True),
            flow_model=flow_model, flow_variables=flow_vars,
        )
        for mode in ("incremental", "full")
    }
    for t in range(5):
        outs = {m: e.step(frames[t]) for m, e in engines.items()}
        assert (outs["incremental"] is None) == (outs["full"] is None)
        if outs["incremental"] is not None:
            np.testing.assert_allclose(
                outs["incremental"][1], outs["full"][1], atol=5e-4,
                err_msg=f"frame {t}",
            )


def test_tracker_flow_provider_without_split_encoders():
    """Regression: the incremental engine must keep working for flow
    providers WITHOUT RAFT-style split encoders (UnFlow; FlowFormer++
    gained split encoders in round 5). The feature-ring optimization
    hard-depended on ``flow_from_features`` and crashed at engine
    construction for UnFlow; providers without it now keep a raw-frame
    ring and run the stateless flow_for_window per fuse — incremental
    and full modes must agree like they do for RAFT."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.models.unflow import UnFlow
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 128, 128, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(3),
        np.zeros((1, T, H, W, 3), np.float32),
        optflow=np.zeros((1, T - 1, H, W, 2), np.float32),
    )
    flow_model = UnFlow(corr_impl="shifts")
    flow_vars = jit_init(
        flow_model, jax.random.PRNGKey(4),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
    )
    assert not hasattr(flow_model, "flow_from_features")
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 255, (4, H, W, 3), dtype=np.uint8)
    engines = {
        mode: InferenceEngine(
            model, variables,
            TrackerConfig(num_input_frames=T, num_classes=C,
                          input_height=H, input_width=W, dtype="float32",
                          mode=mode, add_optflow_inputs=True),
            flow_model=flow_model, flow_variables=flow_vars,
        )
        for mode in ("incremental", "full")
    }
    compared = 0
    for t in range(4):
        outs = {m: e.step(frames[t]) for m, e in engines.items()}
        assert (outs["incremental"] is None) == (outs["full"] is None)
        if outs["incremental"] is not None:
            np.testing.assert_array_equal(
                outs["incremental"][0], outs["full"][0],
                err_msg=f"mask frame {t}",
            )
            np.testing.assert_allclose(
                outs["incremental"][1], outs["full"][1], atol=5e-4,
                err_msg=f"frame {t}",
            )
            compared += 1
    assert compared == 4 - (T - 1)


@pytest.mark.parametrize("mode,decode", [
    ("incremental", "host"),
    ("full", "host"),
    ("incremental", "device"),
])
def test_engine_spatial_sharded_matches_unsharded(mode, decode):
    """InferenceEngine(spatial_shards=4): the batch-1 latency-scaling path
    — image height sharded over a 1-D 'spatial' mesh, GSPMD splitting
    every conv with halo exchanges — produces the same masks/heatmaps as
    the unsharded engine (covers both the s2d incremental ring buffer,
    whose H/4 axis is the sharded one, and the full recompute path)."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 64, 32, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(7), np.zeros((1, T, H, W, 3), np.float32)
    )
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (6, H, W, 3), dtype=np.uint8)

    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32", mode=mode, decode=decode,
    )
    ref = InferenceEngine(model, variables, cfg)
    shd = InferenceEngine(model, variables, cfg, spatial_shards=4)
    for t in range(6):
        a = ref.step(frames[t])
        b = shd.step(frames[t])
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a[0], b[0], err_msg=f"mask frame {t}")
        np.testing.assert_allclose(
            np.asarray(a[1], np.float32), np.asarray(b[1], np.float32),
            atol=1e-3, err_msg=f"aux frame {t}",
        )


@pytest.mark.parametrize("mode,decode", [
    ("incremental", "host"),
    ("incremental", "device"),
    ("full", "host"),
])
def test_multistream_matches_single_stream(tmp_path, mode, decode):
    """track_on_frame_streams: B videos tracked concurrently by one
    batched engine produce exactly the per-stream CSV rows of B
    independent single-stream engines — in both decode paths and both
    engine modes, and identically through the prestacked (lockstep
    (B,H,W,3) batches) input layout."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import (
        TrackerConfig,
        track_on_frame_streams,
        track_on_frames,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C, B, N = 64, 32, 3, 5, 2, 7
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(7), np.zeros((1, T, H, W, 3), np.float32)
    )
    rng = np.random.default_rng(9)
    streams = [
        rng.integers(0, 255, (N, H, W, 3), dtype=np.uint8) for _ in range(B)
    ]

    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32", mode=mode, decode=decode, overlay=False,
    )
    ref_rows = [
        track_on_frames(
            s, model, variables, cfg, tmp_path / f"ref{b}", name=f"s{b}"
        )[0]
        for b, s in enumerate(streams)
    ]

    got_rows, agg_fps = track_on_frame_streams(
        streams, model, variables, cfg, tmp_path / "multi",
        names=[f"s{b}" for b in range(B)],
    )
    assert agg_fps > 0
    for b in range(B):
        np.testing.assert_array_equal(
            got_rows[b], ref_rows[b], err_msg=f"stream {b}"
        )
        csv = tmp_path / "multi" / f"s{b}_tracked.csv"
        assert csv.exists()

    # prestacked lockstep layout: same rows
    stacked = [
        np.stack([streams[b][i] for b in range(B)]) for i in range(N)
    ]
    got2, _ = track_on_frame_streams(
        stacked, model, variables, cfg, tmp_path / "multi2",
        names=[f"s{b}" for b in range(B)], prestacked=True,
    )
    for b in range(B):
        np.testing.assert_array_equal(got2[b], got_rows[b])


def test_multistream_single_stream_delegation(tmp_path):
    """track_on_frame_streams with B=1 (both input layouts) delegates to
    the single-stream driver and matches track_on_frames."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import (
        TrackerConfig,
        track_on_frame_streams,
        track_on_frames,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C, N = 64, 32, 3, 5, 6
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(7), np.zeros((1, T, H, W, 3), np.float32)
    )
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (N, H, W, 3), dtype=np.uint8)
    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32", overlay=False,
    )
    ref, _ = track_on_frames(
        frames, model, variables, cfg, tmp_path / "ref", name="s0"
    )
    got, _ = track_on_frame_streams(
        [frames], model, variables, cfg, tmp_path / "a", names=["s0"]
    )
    np.testing.assert_array_equal(got[0], ref)
    got2, _ = track_on_frame_streams(
        [frames[i][None] for i in range(N)], model, variables, cfg,
        tmp_path / "b", names=["s0"], prestacked=True,
    )
    np.testing.assert_array_equal(got2[0], ref)


def test_multistream_unequal_lengths(tmp_path):
    """Streams of different lengths: shorter streams are padded
    device-side (repeat-last-frame) and the padded steps discarded, so
    every stream's rows equal its own independent single-stream run."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import (
        TrackerConfig,
        track_on_frame_streams,
        track_on_frames,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 64, 32, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(7), np.zeros((1, T, H, W, 3), np.float32)
    )
    rng = np.random.default_rng(13)
    lengths = (7, 4, 2)  # incl. one shorter than the warmup window
    streams = [
        rng.integers(0, 255, (n, H, W, 3), dtype=np.uint8) for n in lengths
    ]
    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32", overlay=False,
    )
    refs = [
        track_on_frames(
            s, model, variables, cfg, tmp_path / f"r{b}", name=f"s{b}"
        )[0]
        for b, s in enumerate(streams)
    ]
    got, _ = track_on_frame_streams(
        streams, model, variables, cfg, tmp_path / "m",
        names=[f"s{b}" for b in range(len(streams))],
    )
    for b, (n, ref) in enumerate(zip(lengths, refs)):
        assert got[b].shape == (n, 12)
        np.testing.assert_array_equal(got[b], ref, err_msg=f"stream {b}")


@pytest.mark.parametrize("B,streams_sh,spatial_sh", [
    (4, 4, 1),   # pure stream sharding: one stream per device group
    (2, 2, 4),   # pod-serving layout: streams x height on a (2,4) mesh
])
def test_engine_stream_sharded_matches_unsharded(B, streams_sh, spatial_sh):
    """InferenceEngine(num_streams=B, stream_shards=S[, spatial_shards]):
    the stream axis rides a 'data' mesh axis (composable with height
    sharding) and outputs equal the unsharded batched engine.

    Pure stream sharding is bitwise identical (per-stream compute is
    untouched). The combined streams x height mesh changes conv split
    boundaries, so reductions reassociate at ~1e-6 — rare argmax TIES can
    flip on isolated pixels (measured: 1 pixel in 6 x 2 x 64 x 32 on this
    fixture); the mask assertion therefore allows a <=0.1% tie budget."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 64, 32, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(7), np.zeros((1, T, H, W, 3), np.float32)
    )
    rng = np.random.default_rng(21)
    frames = rng.integers(0, 255, (6, B, H, W, 3), dtype=np.uint8)

    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32",
    )
    ref = InferenceEngine(model, variables, cfg, num_streams=B)
    shd = InferenceEngine(
        model, variables, cfg, num_streams=B,
        stream_shards=streams_sh, spatial_shards=spatial_sh,
    )
    for t in range(6):
        a = ref.step(frames[t])
        b = shd.step(frames[t])
        assert (a is None) == (b is None)
        if a is None:
            continue
        mismatch = float((a[0] != b[0]).mean())
        if spatial_sh == 1:
            assert mismatch == 0.0, f"mask frame {t}: {mismatch}"
        else:
            # combined streams x height mesh: conv splits reassociate
            # reductions (~1e-6), so isolated argmax TIES may flip
            assert mismatch <= 1e-3, f"mask frame {t}: {mismatch}"
        np.testing.assert_allclose(
            np.asarray(a[1], np.float32), np.asarray(b[1], np.float32),
            atol=2e-3, err_msg=f"aux frame {t}",
        )


def test_multistream_with_optical_flow_matches_single(tmp_path):
    """Batched flow: the engine runs all B*(T-1) flow pairs as one
    provider forward; per-stream outputs equal independent single-stream
    flow engines."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.models.raft import RAFT
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C, B = 64, 64, 3, 5, 2
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(3),
        np.zeros((1, T, H, W, 3), np.float32),
        optflow=np.zeros((1, T - 1, H, W, 2), np.float32),
    )
    flow_model = RAFT(iters=1)
    flow_vars = jit_init(
        flow_model, jax.random.PRNGKey(4),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
    )
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 255, (5, B, H, W, 3), dtype=np.uint8)
    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32", add_optflow_inputs=True,
    )
    singles = [
        InferenceEngine(model, variables, cfg, flow_model=flow_model,
                        flow_variables=flow_vars)
        for _ in range(B)
    ]
    multi = InferenceEngine(model, variables, cfg, flow_model=flow_model,
                            flow_variables=flow_vars, num_streams=B)
    for t in range(5):
        refs = [singles[b].step(frames[t, b]) for b in range(B)]
        got = multi.step(frames[t])
        assert (got is None) == (refs[0] is None)
        if got is None:
            continue
        for b in range(B):
            np.testing.assert_array_equal(
                refs[b][0], got[0][b], err_msg=f"mask frame {t} stream {b}"
            )
            np.testing.assert_allclose(
                np.asarray(refs[b][1], np.float32),
                np.asarray(got[1][b], np.float32),
                atol=1e-3, err_msg=f"aux frame {t} stream {b}",
            )


def test_engine_spatial_sharded_with_flow(tmp_path):
    """spatial_shards with the flow provider in the loop: RAFT's one-hot
    window sampling + correlation under height sharding must still match
    the unsharded engine (the flow path is the gnarliest GSPMD consumer:
    einsum one-hot gathers, instance norm, GRU iterations)."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.models.raft import RAFT
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 64, 64, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(3),
        np.zeros((1, T, H, W, 3), np.float32),
        optflow=np.zeros((1, T - 1, H, W, 2), np.float32),
    )
    flow_model = RAFT(iters=1)
    flow_vars = jit_init(
        flow_model, jax.random.PRNGKey(4),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
    )
    rng = np.random.default_rng(17)
    frames = rng.integers(0, 255, (5, H, W, 3), dtype=np.uint8)
    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32", add_optflow_inputs=True,
    )
    ref = InferenceEngine(model, variables, cfg, flow_model=flow_model,
                          flow_variables=flow_vars)
    shd = InferenceEngine(model, variables, cfg, flow_model=flow_model,
                          flow_variables=flow_vars, spatial_shards=4)
    for t in range(5):
        a = ref.step(frames[t])
        b = shd.step(frames[t])
        assert (a is None) == (b is None)
        if a is None:
            continue
        # flow in the loop amplifies reassociation; allow a tiny tie
        # budget on the argmax mask
        assert float((a[0] != b[0]).mean()) <= 1e-3, f"mask frame {t}"
        np.testing.assert_allclose(
            np.asarray(a[1], np.float32), np.asarray(b[1], np.float32),
            atol=2e-3, err_msg=f"aux frame {t}",
        )


def test_engine_put_no_host_roundtrip():
    """Device-resident frames (bench --source device) must pass through
    step_async without a device->host->device round trip: on an
    unsharded engine _put is jnp.asarray, a no-op returning the SAME
    jax.Array object."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 32, 32, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, T, H, W, 3), np.float32)
    )
    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32",
    )
    engine = InferenceEngine(model, variables, cfg)
    x = jax.device_put(np.zeros((H, W, 3), np.uint8))
    assert engine._put(x, 0) is x


def test_threaded_iter_semantics():
    """_ThreadedIter: yields all items in order, re-raises producer
    exceptions at the consumer, and close() stops the producer promptly
    instead of draining a long stream."""
    from mfcnet_tpu.track.tracker import _ThreadedIter

    # order + completeness
    assert list(_ThreadedIter(iter(range(50)), depth=4)) == list(range(50))

    # producer exception surfaces at the consumer
    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = _ThreadedIter(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)

    # early close stops the producer after at most ~queue-depth items
    produced = []

    def long_gen():
        for i in range(100000):
            produced.append(i)
            yield i

    it = _ThreadedIter(long_gen(), depth=2)
    next(it)
    next(it)
    it.close()
    assert len(produced) < 100


def test_keypoint_tracker_grows_past_frame_count_hint():
    """CAP_PROP_FRAME_COUNT is metadata and routinely wrong: more frames
    than hinted must not crash (storage grows), fewer must keep the
    reference's NaN-padded hint-length CSV shape."""
    from mfcnet_tpu.track.tracker import KeypointTracker, TrackerConfig

    cfg = TrackerConfig(input_height=32, input_width=32, overlay=False)
    mask = np.zeros((32, 32), np.uint8)
    heat = np.zeros((32, 32), np.float32)

    tr = KeypointTracker(2, cfg)  # hint undercounts: 6 frames arrive
    tr.skip()
    tr.skip()
    for _ in range(4):
        tr.update(mask, heat, heat)
    assert tr.count == 6
    assert len(tr.rows) == 6

    tr2 = KeypointTracker(8, cfg)  # hint overcounts: 3 frames arrive
    for _ in range(3):
        tr2.update(mask, heat, heat)
    assert len(tr2.rows) == 8
    assert np.isnan(tr2.rows[3:]).all()

    tr3 = KeypointTracker(0, cfg)  # zero/unknown hint
    tr3.skip()
    tr3.update(mask, heat, heat)
    assert len(tr3.rows) == 2


def test_update_device_replicates_left_prev_bug():
    """The device-decode tracker must keep the same (buggy, when
    cfg.replicate_left_prev_bug) previous-tip bookkeeping as the host
    path, or host- and device-decode CSVs diverge on left 2-tip
    assignment (reference :299 stores cy into cx_prev for the left side
    and never updates cy_prev)."""
    from mfcnet_tpu.track.tracker import KeypointTracker, TrackerConfig

    def one_frame(bug):
        cfg = TrackerConfig(
            input_height=64, input_width=64, overlay=False,
            decode="device", replicate_left_prev_bug=bug,
        )
        tr = KeypointTracker(4, cfg)
        # [side][tip1, tip2, base][x, y, valid]; both sides 2 tips
        kps = np.array([
            [[10.0, 10.0, 1], [30.0, 12.0, 1], [20.0, 20.0, 1]],
            [[40.0, 40.0, 1], [50.0, 42.0, 1], [45.0, 45.0, 1]],
        ])
        row = tr.update_device(kps)
        return tr, row

    tr, row = one_frame(bug=True)
    # host semantics: left cx_prev holds the Y values, cy_prev stays 0
    assert np.allclose(tr.left.cx_prev, row[1:4:2])
    assert np.allclose(tr.left.cy_prev, [0.0, 0.0])
    # right side is bookkept correctly regardless
    assert np.allclose(tr.right.cx_prev, row[4:8:2])
    assert np.allclose(tr.right.cy_prev, row[5:8:2])

    tr, row = one_frame(bug=False)
    assert np.allclose(tr.left.cx_prev, row[0:4:2])
    assert np.allclose(tr.left.cy_prev, row[1:4:2])


def test_staged_fetch_loop_midstream_warmup_keeps_all_frames():
    """A None-handles step arriving while a chunk is staged AND another
    is pending must not drop the staged chunk (fetch before re-staging)."""
    import jax.numpy as jnp

    from mfcnet_tpu.track.tracker import _staged_fetch_loop

    consumed, skipped = [], []

    def seq():
        for i in range(3):  # stages (0,1) at K=2, then 2 pending
            yield i, (np.full((2, 2), i, np.uint8), np.full((3,), i, np.float32))
        yield "warmup", None  # mid-stream None with staged + pending
        for i in range(3, 5):
            yield i, (np.full((2, 2), i, np.uint8), np.full((3,), i, np.float32))

    _staged_fetch_loop(
        seq(),
        on_skip=skipped.append,
        consume=lambda p, m, a, h, extras: consumed.append((p, int(a[0]))),
        need_mask=True, K=2, jnp=jnp,
    )
    assert consumed == [(i, i) for i in range(5)]
    assert skipped == ["warmup"]


def test_flow_feature_ring_matches_stateless():
    """The incremental engine's cached-feature flow
    (outputs.flow_from_feature_ring over a ring of flow_ingest results)
    computes the same quantity as the stateless flow_for_window — same
    ops, each previous frame's encoders run when that frame arrived —
    so the two agree to float-reassociation level."""
    import jax
    import jax.numpy as jnp

    from mfcnet_tpu.models.raft import RAFT
    from mfcnet_tpu.track.outputs import (
        flow_for_window,
        flow_from_feature_ring,
        flow_ingest,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, B = 64, 64, 3, 2
    flow_model = RAFT(iters=2)
    flow_vars = jit_init(
        flow_model, jax.random.PRNGKey(4),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
    )
    rng = np.random.default_rng(11)
    frames = jnp.asarray(
        rng.normal(size=(B, T, H, W, 3)).astype(np.float32)
    )
    want = np.asarray(flow_for_window(frames, flow_model, flow_vars))

    feats = [
        flow_ingest(frames[:, t], flow_model, flow_vars)
        for t in range(T)
    ]
    feat_buf = jnp.stack([f for f, _, _ in feats], axis=1)
    net, inp = feats[0][1], feats[0][2]
    got = np.asarray(flow_from_feature_ring(
        feat_buf, net, inp, (H, W), flow_model, flow_vars
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_flow_feature_ring_matches_stateless_ffpp():
    """FlowFormer++ gained RAFT-style split encoders in round 5 (its
    twins fnet features are per-image, its raw context tensor is the
    per-window cacheable context — models/flowformerpp.py): the
    feature-ring path must equal the stateless flow_for_window, and the
    split __call__ must equal the pre-split monolithic forward (pinned
    vs the torch oracle in tests/test_flow.py; here ring vs stateless)."""
    import jax
    import jax.numpy as jnp

    from mfcnet_tpu.models.flowformerpp import FlowFormerPP
    from mfcnet_tpu.track.outputs import (
        flow_for_window,
        flow_from_feature_ring,
        flow_ingest,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, B = 64, 64, 3, 2
    flow_model = FlowFormerPP(iters=2)
    assert hasattr(flow_model, "flow_from_features")
    flow_vars = jit_init(
        flow_model, jax.random.PRNGKey(4),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
    )
    rng = np.random.default_rng(12)
    frames = jnp.asarray(
        rng.normal(size=(B, T, H, W, 3)).astype(np.float32)
    )
    want = np.asarray(flow_for_window(frames, flow_model, flow_vars))

    feats = [
        flow_ingest(frames[:, t], flow_model, flow_vars)
        for t in range(T)
    ]
    feat_buf = jnp.stack([f for f, _, _ in feats], axis=1)
    ctx, placeholder = feats[0][1], feats[0][2]
    got = np.asarray(flow_from_feature_ring(
        feat_buf, ctx, placeholder, (H, W), flow_model, flow_vars
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_engine_spatial_sharded_with_flow_matches_unsharded():
    """Spatial sharding + flow-conditioned incremental tracking: the
    flow-provider FEATURE ring lives at 1/16 resolution whose height
    need not divide spatial_shards (here 96/16 = 6 rows over 4 shards),
    so the engine must REPLICATE the flow state under the mesh instead
    of sharding it (review finding: sharding it raised at construction
    for exactly this shape class). Masks/aux must match the unsharded
    flow engine."""
    import jax

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.models.raft import RAFT
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig
    from mfcnet_tpu.utils.jitinit import jit_init

    H, W, T, C = 96, 32, 3, 5
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(7),
        np.zeros((1, T, H, W, 3), np.float32),
        optflow=np.zeros((1, T - 1, H, W, 2), np.float32),
    )
    flow_model = RAFT(iters=1)
    flow_vars = jit_init(
        flow_model, jax.random.PRNGKey(4),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
        np.zeros((1, H // 2, W // 2, 3), np.float32),
    )
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (5, H, W, 3), dtype=np.uint8)

    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H, input_width=W,
        dtype="float32", mode="incremental", add_optflow_inputs=True,
    )
    ref = InferenceEngine(model, variables, cfg, flow_model=flow_model,
                          flow_variables=flow_vars)
    shd = InferenceEngine(model, variables, cfg, flow_model=flow_model,
                          flow_variables=flow_vars, spatial_shards=4)
    for t in range(5):
        a = ref.step(frames[t])
        b = shd.step(frames[t])
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a[0], b[0], err_msg=f"mask frame {t}")
        np.testing.assert_allclose(
            np.asarray(a[1], np.float32), np.asarray(b[1], np.float32),
            atol=1e-3, err_msg=f"aux frame {t}",
        )
