"""Optical-flow subsystem tests: RAFT, UnFlow, warp border mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfcnet_tpu.utils.jitinit import jit_init


def test_grid_sample_border_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as tF

    from mfcnet_tpu.ops.warp import grid_sample_bilinear

    rng = np.random.default_rng(3)
    B, H, W, C = 2, 9, 11, 3
    img = rng.standard_normal((B, H, W, C), dtype=np.float32)
    gx = rng.uniform(-1.4, 1.4, (B, 7, 8)).astype(np.float32)
    gy = rng.uniform(-1.4, 1.4, (B, 7, 8)).astype(np.float32)
    got = np.asarray(
        grid_sample_bilinear(
            jnp.asarray(img), jnp.asarray(gx), jnp.asarray(gy),
            align_corners=False, padding_mode="border",
        )
    )
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))
    want = tF.grid_sample(
        torch.from_numpy(np.moveaxis(img, -1, 1).copy()), grid,
        mode="bilinear", padding_mode="border", align_corners=False,
    ).numpy()
    want = np.moveaxis(want, 1, -1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_unflow_forward_shape():
    from mfcnet_tpu.models.unflow import UnFlow

    model = UnFlow(corr_impl="shifts")
    a = jnp.zeros((1, 64, 64, 3))
    variables = jit_init(model, jax.random.PRNGKey(0), a, a)
    flow = jax.jit(lambda v, a, b: model.apply(v, a, b))(variables, a, a)
    assert flow.shape == (1, 64, 64, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


def test_raft_forward_shape():
    from mfcnet_tpu.models.raft import RAFT

    model = RAFT(iters=2)
    a = jnp.zeros((1, 64, 64, 3))
    variables = jit_init(model, jax.random.PRNGKey(0), a, a)
    flow = jax.jit(lambda v, a, b: model.apply(v, a, b))(variables, a, a)
    assert flow.shape == (1, 64, 64, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


def test_raft_flow_fn_contract():
    from mfcnet_tpu.models.raft import make_raft_flow_fn

    fn = make_raft_flow_fn(basic=True, iters=1)
    frames = jnp.zeros((1, 3, 64, 64, 3))
    flow = jax.jit(fn)(frames)
    assert flow.shape == (1, 2, 64, 64, 2)


@pytest.mark.parametrize("basic", [True, False])
def test_raft_flow_fn_batched_equals_pair_loop(basic):
    """make_raft_flow_fn runs all T-1 pairs as one batched solve with the
    shared frame-0 encoders computed once; it must equal the reference's
    per-pair loop (src/engine.py:39-53) to float-reassociation level."""
    from mfcnet_tpu.models.raft import RAFT, make_raft_flow_fn

    T, H, W = 3, 64, 64
    rngn = np.random.default_rng(7)
    frames = jnp.asarray(
        rngn.uniform(-1, 1, (2, T, H, W, 3)).astype(np.float32)
    )
    model = RAFT(iters=2)
    z = jnp.zeros((1, H, W, 3))
    variables = jit_init(model, jax.random.PRNGKey(0), z, z)
    fn = make_raft_flow_fn(
        basic=basic, iters=2, variables=variables, input_hw=(H, W)
    )
    got = np.asarray(jax.jit(fn)(frames))

    f0 = frames[:, 0]
    want = []
    for i in range(1, T):
        fi = frames[:, i]
        a, b = (fi, f0) if basic else (f0, fi)
        want.append(model.apply(variables, a, b))
    want = np.asarray(jnp.stack(want, axis=1))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_unflow_flow_fn_batched_equals_pair_loop():
    from mfcnet_tpu.models.unflow import UnFlow, make_unflow_flow_fn

    T, H, W = 3, 64, 64
    rngn = np.random.default_rng(8)
    frames = jnp.asarray(
        rngn.uniform(0, 1, (1, T, H, W, 3)).astype(np.float32)
    )
    model = UnFlow()
    z = jnp.zeros((1, H, W, 3))
    variables = jit_init(model, jax.random.PRNGKey(0), z, z)
    fn = make_unflow_flow_fn(basic=True, variables=variables)
    got = np.asarray(jax.jit(fn)(frames))
    want = []
    for i in range(1, T):
        want.append(model.apply(variables, frames[:, i], frames[:, 0]))
    want = np.asarray(jnp.stack(want, axis=1))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_ffpp_flow_fn_batched_equals_pair_loop():
    from mfcnet_tpu.models.flowformerpp import (
        FlowFormerPP,
        make_ffpp_flow_fn,
    )

    T, H, W = 3, 64, 64
    rngn = np.random.default_rng(9)
    frames = jnp.asarray(
        rngn.uniform(-1, 1, (1, T, H, W, 3)).astype(np.float32)
    )
    model = FlowFormerPP(iters=1, enc_dims=(16, 32), enc_depths=(2, 2),
                         latent_dim=16, query_dim=8)
    z = jnp.zeros((1, H, W, 3))
    variables = jit_init(model, jax.random.PRNGKey(0), z, z)
    fn = make_ffpp_flow_fn(basic=True, variables=variables, model=model)
    got = np.asarray(jax.jit(fn)(frames))
    scaled = frames * (0.225 / 0.5)
    want = []
    for i in range(1, T):
        want.append(model.apply(variables, scaled[:, i], scaled[:, 0]))
    want = np.asarray(jnp.stack(want, axis=1))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_flowformerpp_forward_shape():
    from mfcnet_tpu.models.flowformerpp import FlowFormerPP

    model = FlowFormerPP(iters=1, enc_dims=(16, 32), enc_depths=(2, 2),
                         latent_dim=16, query_dim=8)
    a = jnp.zeros((1, 64, 64, 3))
    variables = jit_init(model, jax.random.PRNGKey(0), a, a)
    flow = jax.jit(lambda v, a, b: model.apply(v, a, b))(variables, a, a)
    assert flow.shape == (1, 64, 64, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


def test_flowformerpp_gradient():
    """Gradients flow through the full FFPP stack (encoders, perceiver,
    decoder) and are finite — guards the stop_gradient placement
    (only coords1 is detached per iteration, decoder.py:309)."""
    from mfcnet_tpu.models.flowformerpp import FlowFormerPP

    model = FlowFormerPP(iters=2, enc_dims=(16, 32), enc_depths=(2, 2),
                         latent_dim=16, query_dim=8)
    a = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = jit_init(model, jax.random.PRNGKey(0), a, a)

    def loss_fn(params):
        flow = model.apply({"params": params}, a, a + 0.01)
        return jnp.mean(jnp.square(flow))

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # every major subtree must receive nonzero gradient
    gnorms = {
        k: float(
            sum(jnp.sum(jnp.abs(g)) for g in
                jax.tree_util.tree_leaves(grads[k]))
        )
        for k in grads
    }
    for key in ("feat_encoder", "context_encoder", "cost_perceiver",
                "update_block", "decoder_cross"):
        assert gnorms[key] > 0, f"zero grad in {key}: {gnorms}"


def test_flowformerpp_realistic_resolution_lowering():
    """The full-size model jit-lowers at the reference's working resolution
    (480x640 -> 60x80 tokens) with full default dims — catches shape and
    padding bugs that only appear off the toy sizes. (Lowering only: XLA
    compilation of the 23M-entry cost volume is exercised on the real chip
    by the flow CLI, not in CPU CI.)"""
    from mfcnet_tpu.models.flowformerpp import FlowFormerPP

    model = FlowFormerPP(iters=1)
    a = jax.ShapeDtypeStruct((1, 480, 640, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 480, 640, 3)),
                           jnp.zeros((1, 480, 640, 3)))
    )
    lowered = jax.jit(
        lambda v, x, y: model.apply(v, x, y)
    ).lower(variables, a, a)
    assert "480" in str(lowered.out_info.shape) or tuple(
        lowered.out_info.shape
    ) == (1, 480, 640, 2)


def test_build_flow_fn_loads_converted_weights(tmp_path):
    """--load_wts_flow_model on the train/infer CLIs: build_flow_fn must
    run the frozen provider with the CONVERTED weights, not a random
    init (the reference loads pretrained flow implicitly —
    train_multiframe_detection.py:77-93 — so a weightless provider
    silently trains the fusion head against noise flow)."""
    from mfcnet_tpu.cli.train_multiframe_detection import build_flow_fn
    from mfcnet_tpu.models.unflow import UnFlow, make_unflow_flow_fn
    from mfcnet_tpu.utils.checkpoint import save_params

    m = UnFlow()
    d = np.zeros((1, 64, 64, 3), np.float32)
    variables = jit_init(m, jax.random.PRNGKey(11), d, d)
    path = tmp_path / "unflow.msgpack"
    save_params(path, variables["params"])

    fn = build_flow_fn(
        "UnFlow", "TernausNetMulti-Basic", (64, 64),
        weights_path=str(path),
    )
    frames = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 64, 64, 3)),
        np.float32,
    )
    got = np.asarray(fn(frames))
    want = np.asarray(
        make_unflow_flow_fn(basic=True, variables=variables)(frames)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_build_flow_fn_raft_checkpoint_payload_with_batch_stats(tmp_path):
    """RAFT (the default --optflow_model) through build_flow_fn with a
    checkpoint-style weights file, the exact shape tools/parity_check.py
    --save writes ({'params','batch_stats','opt_state','step'}).

    Two regressions pinned at once: (1) _load used to drop the
    batch_stats collection, so RAFT's BatchNorm context encoder
    (use_running_average=True) raised ScopeCollectionNotFound at the
    first flow forward; (2) it passed the whole checkpoint payload to
    from_state_dict against a bare params template, which raised
    ValueError on the documented parity_check --save workflow."""
    from flax import serialization

    from mfcnet_tpu.cli.train_multiframe_detection import build_flow_fn
    from mfcnet_tpu.models.raft import RAFT, make_raft_flow_fn

    m = RAFT(iters=2)
    d = np.zeros((1, 64, 64, 3), np.float32)
    variables = dict(jit_init(m, jax.random.PRNGKey(5), d, d))
    # perturb the running stats so the test FAILS if they are silently
    # replaced by init stats (mean 0 / var 1) instead of loaded
    variables["batch_stats"] = jax.tree.map(
        lambda x: x + 0.37, variables["batch_stats"]
    )
    path = tmp_path / "raft_ckpt.msgpack"
    path.write_bytes(serialization.msgpack_serialize({
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables["batch_stats"]),
        "opt_state": {}, "step": 0,
    }))

    fn = build_flow_fn(
        "RAFT", "TernausNetMulti-Basic", (64, 64), weights_path=str(path)
    )
    frames = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(6), (1, 3, 64, 64, 3)),
        np.float32,
    )
    got = np.asarray(fn(frames))
    want = np.asarray(
        make_raft_flow_fn(basic=True, variables=variables)(frames)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_raft_fused_update_bf16_envelope():
    """RAFT(fused_update=True) — the engine's bf16 product path through
    the fused Pallas update kernel — stays within a sub-pixel envelope
    of the exact f32 XLA path on the same weights. (Exact f32-mode
    kernel parity is pinned separately in tests/test_ops.py; this pins
    the bf16 matmul precision envelope end to end through
    flow_from_features, 6 iterations.)"""
    from mfcnet_tpu.models.raft import RAFT

    exact = RAFT(iters=6)
    fused = RAFT(iters=6, fused_update=True, fused_dtype="bfloat16")
    d = np.zeros((1, 64, 64, 3), np.float32)
    variables = jit_init(exact, jax.random.PRNGKey(0), d, d)

    rng = np.random.default_rng(8)
    img1 = jnp.asarray(rng.random((2, 64, 64, 3), np.float32)) * 2 - 1
    img2 = jnp.asarray(rng.random((2, 64, 64, 3), np.float32)) * 2 - 1
    want = np.asarray(exact.apply(variables, img1, img2))
    got = np.asarray(fused.apply(variables, img1, img2))
    assert got.shape == want.shape
    err = np.abs(got - want)
    # random-init flow magnitudes are O(1) px; bf16 matmuls across 6
    # recurrent iterations stay well under a pixel
    assert err.max() < 0.5, f"max flow drift {err.max():.3f} px"
    assert np.median(err) < 0.05, f"median drift {np.median(err):.4f}"


def test_fused_update_in_frozen_flow_train_step():
    """The bf16 train step with a frozen RAFT provider routed through
    the fused Pallas update kernel (build_flow_fn fused_update=True —
    VERDICT r4 item 3): gradients must compute (the provider is frozen,
    its inputs are data, so the kernel's missing VJP is never needed),
    and the losses must stay within the bf16 envelope of the XLA-conv
    provider's step on identical weights and batch."""
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.models.raft import make_raft_flow_fn
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, multiframe_optimizer
    from mfcnet_tpu.train.steps import make_multiframe_train_step

    B, T, C, H, W = 2, 3, 5, 64, 64
    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, T, H, W, 3), np.float32),
        optflow=np.zeros((1, T - 1, H, W, 2), np.float32),
    )
    d = np.zeros((1, H, W, 3), np.float32)
    from mfcnet_tpu.models.raft import RAFT

    flow_vars = jit_init(RAFT(iters=2), jax.random.PRNGKey(1), d, d)
    rng = np.random.RandomState(0)
    batch = {
        "frames": rng.rand(B, T, H, W, 3).astype(np.float32),
        "mask": rng.randint(0, C, (B, H, W)).astype(np.int32),
    }
    losses = {}
    for fused in (False, True):
        flow_fn = make_raft_flow_fn(
            basic=True, iters=2, variables=flow_vars, input_hw=(H, W),
            fused_update=fused,
        )
        tx = multiframe_optimizer(
            make_schedule("StepDecay", 1e-4, 20, 100), T,
            train_base_model=True, base_pretrained_loaded=True,
        )
        state = TrainState.create(
            model.apply, variables["params"], tx,
            variables.get("batch_stats", {}),
        )
        step = make_multiframe_train_step(
            model, ["nll"], [1.0], C, train_base_model=True,
            compute_dtype="bfloat16", flow_fn=flow_fn,
            # donate=False: the two loop iterations share the init
            # buffers; donation would delete them after the first step
            donate=False,
        )
        state, parts = step(state, batch)
        losses[fused] = float(parts["loss_total"])
        assert np.isfinite(losses[fused])
    # same batch, same weights: only the provider's update-iteration
    # matmul precision differs -> losses agree to bf16 envelope
    assert abs(losses[True] - losses[False]) < 0.05 * (
        1.0 + abs(losses[False])
    ), losses


def test_lookup_corr_blocked_matches_per_level():
    """Block-diagonal all-levels lookup == the per-level lookup (zeros
    padding, channel order, x-slow-axis layout) on random pyramids and
    coords incl. out-of-range centers."""
    from mfcnet_tpu.models.raft import (
        build_blocked_pyramid,
        build_corr_pyramid,
        lookup_corr,
        lookup_corr_blocked,
    )

    rng = np.random.default_rng(23)
    B, H8, W8, C = 2, 12, 16, 32
    f1 = jnp.asarray(rng.standard_normal((B, H8, W8, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H8, W8, C)), jnp.float32)
    pyramid = build_corr_pyramid(f1, f2, 4)
    coords = jnp.asarray(
        rng.uniform(-3, max(H8, W8) + 2, (B, H8, W8, 2)), jnp.float32
    )
    want = np.asarray(lookup_corr(pyramid, coords, 4))
    bd, offs = build_blocked_pyramid(pyramid)
    got = np.asarray(lookup_corr_blocked(bd, offs, coords, 4))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_lookup_corr_patches_matches_per_level():
    """The static-patch lookup (build_patch_pyramid +
    lookup_corr_patches — round 5's iteration-invariant reformulation)
    == lookup_corr exactly: in-patch displacements take the shift-blend
    path, out-of-patch displacements must trigger the exact einsum
    fallback cond. Covers uneven pooled sizes (floor-halving), border
    tokens (zeros padding), and every integer-shift mask value."""
    from mfcnet_tpu.models.raft import (
        build_corr_pyramid,
        build_patch_pyramid,
        lookup_corr,
        lookup_corr_patches,
    )

    rng = np.random.default_rng(31)
    B, H8, W8, C = 2, 12, 17, 32  # odd W: floor-halved pooled levels
    f1 = jnp.asarray(rng.standard_normal((B, H8, W8, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H8, W8, C)), jnp.float32)
    pyramid = build_corr_pyramid(f1, f2, 4)
    patches = build_patch_pyramid(pyramid, (H8, W8))

    jj, ii = np.meshgrid(np.arange(W8), np.arange(H8), indexing="xy")
    base = np.broadcast_to(
        np.stack([jj, ii], -1).astype(np.float32), (B, H8, W8, 2)
    )
    # sub-pixel displacements spanning all shift masks (-1, 0, 1)
    for seed, amp in ((0, 0.45), (1, 0.99)):
        d = rng.uniform(-amp, amp, (B, H8, W8, 2)).astype(np.float32)
        coords = jnp.asarray(base + d)
        want = np.asarray(lookup_corr(pyramid, coords, 4))
        got = np.asarray(
            lookup_corr_patches(patches, pyramid, coords, 4)
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    # out-of-patch displacement -> exact fallback (still equal)
    d = rng.uniform(-6, 6, (B, H8, W8, 2)).astype(np.float32)
    coords = jnp.asarray(base + d)
    want = np.asarray(lookup_corr(pyramid, coords, 4))
    got = np.asarray(lookup_corr_patches(patches, pyramid, coords, 4))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_fused_update_step_batch_chunking_identical():
    """fused_update_step's VMEM-budget batch chunking (the frozen-flow
    TRAIN step's full-res token counts blow the 100 MB scoped-vmem
    stack in one invocation) must produce exactly the unchunked
    outputs — the kernel is per-token, so splitting the batch axis is
    value-neutral."""
    from mfcnet_tpu.models.raft import RAFT
    from mfcnet_tpu.ops.raft_update_pallas import (
        fused_update_step,
        pack_update_weights,
    )

    d = np.zeros((1, 64, 64, 3), np.float32)
    variables = jit_init(RAFT(iters=1), jax.random.PRNGKey(0), d, d)
    ub = variables["params"]["update_block"]
    packed = pack_update_weights(ub, jnp.float32)
    rng = np.random.default_rng(5)
    B, H8, W8 = 4, 8, 8
    corr = jnp.asarray(
        rng.standard_normal((B, H8, W8, 324)), jnp.float32
    )
    inp = jnp.asarray(
        rng.standard_normal((B, H8, W8, 128)), jnp.float32
    )
    net = jnp.asarray(jnp.tanh(jnp.asarray(
        rng.standard_normal((B, H8, W8, 128)), jnp.float32
    )))
    flow = jnp.asarray(
        rng.standard_normal((B, H8, W8, 2)), jnp.float32
    )
    args = (ub, packed, corr, inp, net, flow)
    n1, d1 = fused_update_step(*args, compute_dtype=jnp.float32)
    n2, d2 = fused_update_step(
        *args, compute_dtype=jnp.float32, max_tokens=H8 * W8
    )  # forces one-sample chunks
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
