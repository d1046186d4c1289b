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
