"""AOT serving-export tests (mfcnet_tpu.serve).

Pins: artifact == live model numerics, symbolic-batch reuse across batch
sizes, depth/flow graph plumbing, header integrity, and the export CLI's
self-validation. Runs on the CPU backend; the artifact's platform list
must therefore include 'cpu' for Exported.call to accept it.
"""

import numpy as np
import pytest


def _tiny(add_depth=False):
    import jax

    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.utils.jitinit import jit_init

    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", 5, 3, scale=0.1,
        add_depth_inputs=add_depth,
    )
    kwargs = {}
    if add_depth:
        kwargs["depth"] = np.zeros((1, 3, 32, 32, 1), np.float32)
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, 3, 32, 32, 3), np.float32), **kwargs,
    )
    return model, variables


def test_export_roundtrip_symbolic_batch(tmp_path):
    import jax

    from mfcnet_tpu.serve import (
        export_serving, load_exported, make_serving_fn, save_exported,
    )

    model, variables = _tiny()
    exported = export_serving(
        model, variables, height=32, width=32, num_frames=3,
        dtype="float32", batch=None,
    )
    path = tmp_path / "m.stablehlo"
    header = save_exported(path, exported, meta={"model_type": "tiny"})
    assert header["model_type"] == "tiny"
    assert "cpu" in header["platforms"]

    loaded = load_exported(path)
    assert loaded.meta["fn_name"] == exported.fun_name
    live = jax.jit(make_serving_fn(model, variables, dtype="float32"))
    rng = np.random.default_rng(0)
    # one artifact, two batch sizes (symbolic batch dim)
    for B in (1, 2):
        frames = rng.integers(0, 256, (B, 3, 32, 32, 3), dtype=np.uint8)
        got = np.asarray(loaded(frames))
        want = np.asarray(live(frames))
        assert got.shape == (B, 32, 32, 5)
        np.testing.assert_allclose(got, want, atol=1e-6)
        # softmax output: rows sum to 1
        np.testing.assert_allclose(
            got.sum(-1), np.ones((B, 32, 32)), atol=1e-5
        )


def test_export_depth_and_fixed_batch(tmp_path):
    import jax

    from mfcnet_tpu.serve import (
        export_serving, load_exported, make_serving_fn, save_exported,
    )

    model, variables = _tiny(add_depth=True)
    exported = export_serving(
        model, variables, height=32, width=32, num_frames=3,
        dtype="float32", add_depth_inputs=True, batch=2,
    )
    path = tmp_path / "d.stablehlo"
    save_exported(path, exported)
    loaded = load_exported(path)
    live = jax.jit(make_serving_fn(
        model, variables, dtype="float32", add_depth_inputs=True
    ))
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 3, 32, 32, 3), dtype=np.uint8)
    depth = rng.integers(0, 256, (2, 3, 32, 32), dtype=np.uint8)
    np.testing.assert_allclose(
        np.asarray(loaded(frames, depth)),
        np.asarray(live(frames, depth)),
        atol=1e-6,
    )
    # fixed batch: wrong batch size must be rejected by the artifact
    bad = rng.integers(0, 256, (1, 3, 32, 32, 3), dtype=np.uint8)
    with pytest.raises(Exception):
        loaded(bad, depth[:1])


def test_export_with_flow_provider(tmp_path):
    """In-graph flow plumbing (half-res provider, x2 upscale, /0.5) with a
    stub provider — validates the graph shape without RAFT's compile
    cost. Reference semantics:
    test_multiframe_segmentation_on_videos_v3.py:264-271."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.serve import (
        export_serving, load_exported, make_serving_fn, save_exported,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    class StubFlow(nn.Module):
        @nn.compact
        def __call__(self, a, b):
            return nn.Conv(2, (3, 3))(jnp.concatenate([a, b], axis=-1))

    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", 5, 3, scale=0.1,
        add_optflow_inputs=True,
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, 3, 32, 32, 3), np.float32),
        optflow=np.zeros((1, 2, 32, 32, 2), np.float32),
    )
    flow = StubFlow()
    flow_vars = jit_init(
        flow, jax.random.PRNGKey(1),
        np.zeros((1, 16, 16, 3), np.float32),
        np.zeros((1, 16, 16, 3), np.float32),
    )
    exported = export_serving(
        model, variables, height=32, width=32, num_frames=3,
        dtype="float32", flow_model=flow, flow_variables=flow_vars,
        batch=None,
    )
    path = tmp_path / "f.stablehlo"
    save_exported(path, exported)
    loaded = load_exported(path)
    live = jax.jit(make_serving_fn(
        model, variables, dtype="float32",
        flow_model=flow, flow_variables=flow_vars,
    ))
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (2, 3, 32, 32, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        np.asarray(loaded(frames)), np.asarray(live(frames)), atol=1e-6
    )


def test_export_incremental_matches_live_engine(tmp_path):
    """The incremental artifact (explicit ring-buffer state, one base
    forward per frame) must reproduce the live InferenceEngine frame for
    frame — same class masks, same tip heatmaps, same warmup contract."""
    import jax

    from mfcnet_tpu.serve import (
        export_incremental, load_exported, save_exported, zero_state,
    )
    from mfcnet_tpu.track.tracker import InferenceEngine, TrackerConfig

    model, variables = _tiny()
    T, H, W = 3, 32, 32
    exported, state_spec = export_incremental(
        model, variables, height=H, width=W, num_frames=T,
        num_classes=5, dtype="float32",
    )
    path = tmp_path / "inc.stablehlo"
    save_exported(path, exported, meta={
        "serving_mode": "incremental",
        "state": {k: [list(s), d] for k, (s, d) in state_spec.items()},
    })
    loaded = load_exported(path)

    cfg = TrackerConfig(
        num_input_frames=T, num_classes=5, input_height=H, input_width=W,
        dtype="float32", mode="incremental", overlay=False,
    )
    engine = InferenceEngine(model, variables, cfg)
    state = zero_state(loaded.meta, batch=1)
    rng = np.random.default_rng(5)
    fused = 0
    for t in range(T + 3):
        frame = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        out = engine.step(frame)
        *state, probs = loaded(*state, frame[None])
        if t < T - 1:
            assert out is None  # warmup contract matches
            continue
        fused += 1
        mask_e, heats_e = out
        probs = np.asarray(probs)[0]
        np.testing.assert_array_equal(
            probs.argmax(-1).astype(np.uint8), mask_e
        )
        # engine ships tip heats quantized to f16
        np.testing.assert_allclose(
            np.stack([probs[..., 2], probs[..., 4]], -1),
            np.asarray(heats_e, np.float32), atol=1e-3,
        )
    assert fused == 4


def test_export_cli_incremental(tmp_path):
    import jax

    from mfcnet_tpu.serve import load_exported, zero_state
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, multiframe_optimizer
    from mfcnet_tpu.utils.checkpoint import save_checkpoint

    model, variables = _tiny()
    tx = multiframe_optimizer(
        make_schedule("Constant", 1e-4, 1, 1), 3, False, False
    )
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)

    from mfcnet_tpu.cli.export_model import main

    out = tmp_path / "inc.stablehlo"
    rc = main([
        "--model_type", "TernausNetMulti-Basic",
        "--num_input_frames", "3",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
        "--serving_mode", "incremental",
        "--load_wts_model", str(ck),
        "--output", str(out),
        "--validate", "true",  # CLI replays T+1 frames vs the live step
    ])
    assert rc == 0
    loaded = load_exported(out)
    assert loaded.meta["serving_mode"] == "incremental"
    # dynamic batch: serve 2 streams in lockstep from zero state
    st = zero_state(loaded.meta, batch=2)
    frames = np.zeros((2, 32, 32, 3), np.uint8)
    *st, probs = loaded(*st, frames)
    assert np.asarray(probs).shape == (2, 32, 32, 5)


def test_export_incremental_non_s2d_without_depth(tmp_path):
    """H not divisible by 4 disables the s2d fast path; the incremental
    export must still work with a seg_buf-only state and must NOT invent
    a depth channel for a depth-less model."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from mfcnet_tpu.models import MultiFrameSegmenter
    from mfcnet_tpu.serve import (
        export_incremental, load_exported, save_exported, zero_state,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    class StubBase(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.softmax(nn.Conv(5, (3, 3))(x))

    H, W, T = 30, 32, 3
    model = MultiFrameSegmenter(
        base=StubBase(), num_classes=5, num_frames=T,
        variant="basic", base_output="identity",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, T, H, W, 3), np.float32),
    )
    exported, spec = export_incremental(
        model, variables, height=H, width=W, num_frames=T,
        num_classes=5, dtype="float32",
    )
    assert list(spec) == ["seg_buf"]  # no depth buffer
    path = tmp_path / "ns2d.stablehlo"
    save_exported(path, exported, meta={
        "state": {k: [list(s), d] for k, (s, d) in spec.items()},
    })
    loaded = load_exported(path)
    from mfcnet_tpu.serve import make_incremental_step

    live, _ = make_incremental_step(
        model, variables, height=H, width=W, num_frames=T,
        num_classes=5, dtype="float32",
    )
    live = jax.jit(live)
    state_a = zero_state(loaded.meta)
    state_l = list(state_a)
    rng = np.random.default_rng(8)
    for _ in range(T + 1):
        frame = rng.integers(0, 256, (1, H, W, 3), dtype=np.uint8)
        *state_a, got = loaded(*state_a, frame)
        *state_l, want = live(*state_l, frame)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )


def test_export_incremental_other_base_family(tmp_path):
    """The incremental exporter is generic over the multiframe zoo (it
    only uses MultiFrameSegmenter's base_forward*/fuse_* methods) — smoke
    a second base family end to end."""
    import jax

    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.serve import (
        export_incremental, load_exported, save_exported, zero_state,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    model = get_multiframe_segmentation_model(
        "UNetMulti-Basic", 5, 3, scale=0.1
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, 3, 32, 32, 3), np.float32),
    )
    exported, spec = export_incremental(
        model, variables, height=32, width=32, num_frames=3,
        num_classes=5, dtype="float32",
    )
    path = tmp_path / "unet.stablehlo"
    save_exported(path, exported, meta={
        "serving_mode": "incremental",
        "state": {k: [list(s), d] for k, (s, d) in spec.items()},
    })
    loaded = load_exported(path)
    state = zero_state(loaded.meta)
    rng = np.random.default_rng(9)
    for t in range(4):
        frame = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
        *state, probs = loaded(*state, frame)
    probs = np.asarray(probs)
    assert probs.shape == (1, 32, 32, 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_export_bfloat16_roundtrip(tmp_path):
    """bfloat16 compute (the CLI default) through export/load: artifact
    matches the live bf16 function exactly (same graph, same casts)."""
    import jax

    from mfcnet_tpu.serve import (
        export_serving, load_exported, make_serving_fn, save_exported,
    )

    model, variables = _tiny()
    exported = export_serving(
        model, variables, height=32, width=32, num_frames=3,
        dtype="bfloat16", batch=1,
    )
    path = tmp_path / "bf16.stablehlo"
    save_exported(path, exported)
    loaded = load_exported(path)
    live = jax.jit(make_serving_fn(model, variables, dtype="bfloat16"))
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (1, 3, 32, 32, 3), dtype=np.uint8)
    got = np.asarray(loaded(frames))
    want = np.asarray(live(frames))
    assert got.dtype == np.float32  # probs always f32
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_singleframe_cli(tmp_path):
    """Single-frame model export: checkpoint -> artifact -> probs, with
    the registry's per-family output adapter (TernausNet emits log-probs)
    baked in. TAPNet is rejected (host attmap pipeline)."""
    import jax

    from mfcnet_tpu.models import get_tooltip_segmentation_model
    from mfcnet_tpu.serve import load_exported
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, singleframe_optimizer
    from mfcnet_tpu.utils.checkpoint import save_checkpoint
    from mfcnet_tpu.utils.jitinit import jit_init

    model = get_tooltip_segmentation_model("TernausNet16", 5, scale=0.1)
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
    )
    state = TrainState.create(
        model.apply, variables["params"],
        singleframe_optimizer(make_schedule("Constant", 1e-4, 1, 1)),
        variables.get("batch_stats", {}),
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)

    from mfcnet_tpu.cli.export_model import main

    out = tmp_path / "sf.stablehlo"
    rc = main([
        "--task", "singleframe",
        "--model_type", "TernausNet16",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
        "--load_wts_model", str(ck),
        "--output", str(out),
        "--validate", "true",
    ])
    assert rc == 0
    loaded = load_exported(out)
    assert loaded.meta["task"] == "singleframe"
    assert loaded.meta["output_mode"] == "log_probs"
    frames = np.zeros((2, 32, 32, 3), np.uint8)
    probs = np.asarray(loaded(frames))
    assert probs.shape == (2, 32, 32, 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    with pytest.raises(SystemExit, match="TAPNet"):
        main([
            "--task", "singleframe",
            "--model_type", "TAPNet16",
            "--load_wts_model", str(ck),
            "--output", str(tmp_path / "t.stablehlo"),
        ])


def test_load_rejects_non_artifact(tmp_path):
    from mfcnet_tpu.serve import load_exported

    bad = tmp_path / "junk.bin"
    bad.write_bytes(b"definitely not an artifact")
    with pytest.raises(ValueError, match="magic"):
        load_exported(bad)


def test_export_cli_end_to_end(tmp_path):
    import jax

    from mfcnet_tpu.serve import load_exported
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, multiframe_optimizer
    from mfcnet_tpu.utils.checkpoint import save_checkpoint
    from mfcnet_tpu.utils.jitinit import jit_init

    model, variables = _tiny()
    tx = multiframe_optimizer(
        make_schedule("Constant", 1e-4, 1, 1), 3, False, False
    )
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)

    from mfcnet_tpu.cli.export_model import main

    out = tmp_path / "serve" / "m.stablehlo"
    rc = main([
        "--model_type", "TernausNetMulti-Basic",
        "--num_input_frames", "3",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
        "--load_wts_model", str(ck),
        "--output", str(out),
        "--validate", "true",  # CLI cross-checks artifact vs live model
    ])
    assert rc == 0 and out.exists()
    loaded = load_exported(out)
    assert loaded.meta["model_type"] == "TernausNetMulti-Basic"
    assert loaded.meta["epoch"] == 1
    frames = np.zeros((3, 3, 32, 32, 3), np.uint8)
    probs = np.asarray(loaded(frames))  # dynamic batch: B=3 works
    assert probs.shape == (3, 32, 32, 5)
