"""Model zoo shape/behavior tests + sharded train-step smoke tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
from mfcnet_tpu.models import (
    get_multiframe_segmentation_model,
    get_tooltip_segmentation_model,
)
from mfcnet_tpu.parallel import make_mesh, shard_batch
from mfcnet_tpu.train.schedule import make_schedule
from mfcnet_tpu.train.state import TrainState, multiframe_optimizer
from mfcnet_tpu.train.steps import (
    make_multiframe_eval_step,
    make_multiframe_train_step,
)

H, W, C, T = 32, 32, 5, 3
TINY_STAGES = ((4,), (8,), (8, 8), (16, 16), (16, 16))


def _mf_model_and_vars(variant="Basic", optflow=False, depth=False):
    base = TernausNet16(num_classes=C, num_filters=4, stage_convs=TINY_STAGES)
    model = MultiFrameSegmenter(
        base=base,
        num_classes=C,
        num_frames=T,
        variant=variant.lower(),
        base_output="exp",
    )
    rng = jax.random.PRNGKey(0)
    frames = jnp.zeros((1, T, H, W, 3), jnp.float32)
    kwargs = {}
    if optflow:
        kwargs["optflow"] = jnp.zeros((1, T - 1, H, W, 2), jnp.float32)
    if depth:
        kwargs["depth"] = jnp.zeros((1, T, H, W, 1), jnp.float32)
    from mfcnet_tpu.utils.jitinit import jit_init
    variables = jit_init(model, rng, frames, **kwargs)
    return model, variables


def test_ternausnet16_output_is_log_probs():
    model = TernausNet16(num_classes=C, num_filters=4, stage_convs=TINY_STAGES)
    assert get_tooltip_segmentation_model("TernausNet16", num_classes=C) is not None
    x = jnp.zeros((2, H, W, 3))
    from mfcnet_tpu.utils.jitinit import jit_init
    variables = jit_init(model, jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, H, W, C)
    np.testing.assert_allclose(
        np.exp(np.asarray(y)).sum(-1), 1.0, atol=1e-4
    )


def test_ternausnet_remat_is_transparent():
    """remat=True: identical param tree, bit-identical forward, identical
    gradients — only the backward's activation storage changes (encoder +
    decoder blocks recomputed)."""
    plain = TernausNet16(
        num_classes=C, num_filters=4, stage_convs=TINY_STAGES
    )
    rem = TernausNet16(
        num_classes=C, num_filters=4, stage_convs=TINY_STAGES, remat=True
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, H, W, 3).astype(np.float32)
    )
    v = plain.init(jax.random.PRNGKey(0), x)
    v2 = rem.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v2
    )

    ya = plain.apply(v, x)
    yb = rem.apply(v, x)  # same params drive both
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))

    def loss(m, params):
        return (m.apply({"params": params}, x) ** 2).mean()

    ga = jax.grad(lambda p: loss(plain, p))(v["params"])
    gb = jax.grad(lambda p: loss(rem, p))(v["params"])
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
        )

    # TAPNet path: same transparency guarantee
    from mfcnet_tpu.models.tapnet import TAPNet16

    tp = TAPNet16(num_classes=C, stage_convs=TINY_STAGES, width_mult=0.1)
    tr = TAPNet16(
        num_classes=C, stage_convs=TINY_STAGES, width_mult=0.1, remat=True
    )
    att = jnp.zeros((2, H, W, 1), jnp.float32)
    vt = tp.init(jax.random.PRNGKey(1), x, att)
    vt2 = tr.init(jax.random.PRNGKey(1), x, att)
    assert jax.tree_util.tree_structure(vt) == jax.tree_util.tree_structure(
        vt2
    )
    np.testing.assert_array_equal(
        np.asarray(tp.apply(vt, x, att)), np.asarray(tr.apply(vt, x, att))
    )
    gta = jax.grad(
        lambda p: (tp.apply({"params": p}, x, att) ** 2).mean()
    )(vt["params"])
    gtb = jax.grad(
        lambda p: (tr.apply({"params": p}, x, att) ** 2).mean()
    )(vt["params"])
    for a, b in zip(jax.tree.leaves(gta), jax.tree.leaves(gtb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
        )


@pytest.mark.parametrize(
    "variant,optflow,depth",
    [("Basic", False, False), ("Basic", True, True), ("Large", True, True)],
)
def test_multiframe_forward_shapes(variant, optflow, depth):
    model, variables = _mf_model_and_vars(variant, optflow, depth)
    frames = jnp.zeros((2, T, H, W, 3))
    kwargs = {}
    if optflow:
        kwargs["optflow"] = jnp.zeros((2, T - 1, H, W, 2))
    if depth:
        kwargs["depth"] = jnp.zeros((2, T, H, W, 1))
    y = model.apply(variables, frames, **kwargs)
    assert y.shape == (2, H, W, C)


def test_fuse_precomputed_matches_full_forward():
    """Incremental tracker path == full forward given the same seg maps."""
    model, variables = _mf_model_and_vars("Basic")
    rng = np.random.default_rng(1)
    frames = jnp.asarray(
        rng.standard_normal((1, T, H, W, 3), dtype=np.float32)
    )
    full = model.apply(variables, frames)
    flat = frames.reshape(T, H, W, 3)
    seg = model.apply(variables, flat, method="base_forward")
    seg = seg.reshape(1, T, H, W, C)
    fused = model.apply(variables, seg, method="fuse_precomputed")
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(fused), atol=1e-5, rtol=1e-5
    )


def test_train_step_runs_sharded_and_loss_decreases():
    mesh = make_mesh(8)
    model, variables = _mf_model_and_vars("Basic")
    sched = make_schedule("StepDecay", 1e-3, 10, 10)
    tx = multiframe_optimizer(
        sched, T, train_base_model=False, base_pretrained_loaded=False
    )
    state = TrainState.create(
        model.apply,
        variables["params"],
        tx,
        variables.get("batch_stats", {}),
    )
    step = make_multiframe_train_step(
        model,
        ["nll", "soft_jaccard"],
        [0.7, 0.3],
        C,
        class_weights=[1.0, 1000.0, 1000.0, 1000.0, 1000.0],
        donate=False,
    )
    rng = np.random.default_rng(0)
    batch = {
        "frames": rng.standard_normal((8, T, H, W, 3)).astype(np.float32),
        "mask": rng.integers(0, C, (8, H, W)).astype(np.int32),
    }
    with jax.set_mesh(mesh):
        sbatch = shard_batch(mesh, batch)
        state, logs0 = step(state, sbatch)
        for _ in range(2):
            state, logs = step(state, sbatch)
    assert np.isfinite(float(logs["loss_total"]))
    assert float(logs["loss_total"]) < float(logs0["loss_total"])
    # base was frozen: its params must be unchanged
    base0 = jax.tree.leaves(variables["params"]["base"])
    base1 = jax.tree.leaves(state.params["base"])
    for a, b in zip(base0, base1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mixed_precision_train_step():
    """compute_dtype='bfloat16': master params/opt state/BN stats stay
    f32, the loss is computed on f32 log-probs, training still learns,
    and the first-step loss matches f32 training to bf16 tolerance."""
    model, variables = _mf_model_and_vars("Basic")
    sched = make_schedule("Constant", 1e-3, 1, 1)

    def fresh_state():
        tx = multiframe_optimizer(
            sched, T, train_base_model=True, base_pretrained_loaded=False
        )
        return TrainState.create(
            model.apply, variables["params"], tx,
            variables.get("batch_stats", {}),
        )

    kwargs = dict(
        class_weights=[1.0, 1000.0, 1000.0, 1000.0, 1000.0],
        train_base_model=True, donate=False,
    )
    step16 = make_multiframe_train_step(
        model, ["nll", "soft_jaccard"], [0.7, 0.3], C,
        compute_dtype="bfloat16", **kwargs,
    )
    step32 = make_multiframe_train_step(
        model, ["nll", "soft_jaccard"], [0.7, 0.3], C, **kwargs,
    )
    rng = np.random.default_rng(2)
    batch = {
        "frames": rng.standard_normal((2, T, H, W, 3)).astype(np.float32),
        "mask": rng.integers(0, C, (2, H, W)).astype(np.int32),
    }
    s32, logs32 = step32(fresh_state(), batch)
    s16, logs0 = step16(fresh_state(), batch)
    np.testing.assert_allclose(
        float(logs0["loss_total"]), float(logs32["loss_total"]), rtol=0.05
    )
    for leaf in jax.tree.leaves(s16.params) + jax.tree.leaves(
        s16.batch_stats
    ):
        assert leaf.dtype == jnp.float32
    losses = [float(logs0["loss_total"])]
    for _ in range(3):
        s16, logs = step16(s16, batch)
        losses.append(float(logs["loss_total"]))
    assert all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0]


def test_sharded_train_step_matches_single_device():
    """GSPMD data parallelism is numerically transparent: one train step on
    the same batch — 8-way sharded vs single device — yields the same loss
    and the same updated parameters (the gradient all-reduce and global
    batch statistics that replace the reference's DataParallel +
    InPlaceABNSync collectives change only the reduction layout, within
    float tolerance)."""
    import optax

    model, variables = _mf_model_and_vars("Basic")

    def fresh_state():
        # SGD so the param delta IS the gradient (first-step Adam divides
        # by |g|, amplifying near-zero-gradient reduction-order noise into
        # +-lr sign flips — not a parallelism defect)
        return TrainState.create(
            model.apply, variables["params"], optax.sgd(1e-2),
            variables.get("batch_stats", {}),
        )

    step = make_multiframe_train_step(
        model, ["nll", "soft_jaccard"], [0.7, 0.3], C,
        class_weights=[1.0, 1000.0, 1000.0, 1000.0, 1000.0],
        train_base_model=True, donate=False,
    )
    rng = np.random.default_rng(1)
    batch = {
        "frames": rng.standard_normal((8, T, H, W, 3)).astype(np.float32),
        "mask": rng.integers(0, C, (8, H, W)).astype(np.int32),
    }

    s_single, logs_single = step(fresh_state(), batch)

    mesh = make_mesh(8)
    with jax.set_mesh(mesh):
        s_shard, logs_shard = step(fresh_state(), shard_batch(mesh, batch))

    np.testing.assert_allclose(
        float(logs_single["loss_total"]), float(logs_shard["loss_total"]),
        rtol=1e-5,
    )
    pa = jax.tree.leaves(jax.device_get(s_single.params))
    pb = jax.tree.leaves(jax.device_get(s_shard.params))
    assert len(pa) == len(pb)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
    # BN statistics were reduced over the GLOBAL batch in both cases
    sa = jax.tree.leaves(jax.device_get(s_single.batch_stats))
    sb = jax.tree.leaves(jax.device_get(s_shard.batch_stats))
    for a, b in zip(sa, sb):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_eval_step_metrics():
    model, variables = _mf_model_and_vars("Basic")
    sched = make_schedule("Constant", 1e-3, 10, 10)
    tx = multiframe_optimizer(sched, T, False, False)
    state = TrainState.create(
        model.apply, variables["params"], tx, variables.get("batch_stats", {})
    )
    eval_step = make_multiframe_eval_step(
        model, ["nll"], [1.0], ["iou", "dice"], C
    )
    batch = {
        "frames": np.zeros((1, T, H, W, 3), np.float32),
        "mask": np.zeros((1, H, W), np.int32),
    }
    log_probs, parts = eval_step(state, batch)
    assert log_probs.shape == (1, H, W, C)
    assert parts["iou_per_class"].shape == (1, C - 1)
    assert np.isfinite(float(parts["loss_total"]))


def test_train_step_with_frozen_raft_flow_in_loop():
    """The reference computes frozen-flow per frame pair inside the train
    loop (src/engine.py:39-53); here the flow model runs inside the jitted
    step. One step, finite loss, flow model params untouched."""
    from mfcnet_tpu.models.raft import make_raft_flow_fn
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16

    base = TernausNet16(num_classes=C, num_filters=4, stage_convs=TINY_STAGES)
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    rng = jax.random.PRNGKey(0)
    frames0 = jnp.zeros((1, T, H, W, 3), jnp.float32)
    optflow0 = jnp.zeros((1, T - 1, H, W, 2), jnp.float32)
    from mfcnet_tpu.utils.jitinit import jit_init
    variables = jit_init(model, rng, frames0, optflow=optflow0)

    flow_fn = make_raft_flow_fn(basic=True, iters=1, input_hw=(H, W))
    sched = make_schedule("Constant", 1e-3, 1, 1)
    tx = multiframe_optimizer(sched, T, False, False)
    state = TrainState.create(
        model.apply, variables["params"], tx, variables.get("batch_stats", {})
    )
    step = make_multiframe_train_step(
        model, ["nll"], [1.0], C, flow_fn=flow_fn, donate=False
    )
    rngn = np.random.default_rng(0)
    batch = {
        "frames": rngn.standard_normal((1, T, H, W, 3)).astype(np.float32),
        "mask": rngn.integers(0, C, (1, H, W)).astype(np.int32),
    }
    state, logs = step(state, batch)
    assert np.isfinite(float(logs["loss_total"]))


def test_fuse_s2d_streaming_parity():
    """The s2d ring-buffer streaming path (base_forward_s2d + fuse_s2d)
    must reproduce the standard fuse_precomputed logits exactly (the
    space-to-depth fold/packed kernels are the same math reassociated)."""
    import numpy as np
    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.ops.fastconv import from_s2d, s2d_via_conv
    from mfcnet_tpu.utils.jitinit import jit_init

    T, C, H, W = 3, 5, 64, 64
    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", num_classes=C, num_input_frames=T,
        scale=0.25,
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, T, H, W, 3), np.float32)
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 1, (T, 1, H, W, 3)).astype(np.float32)
    )
    # standard path
    seg = jnp.stack(
        [
            model.apply(variables, frames[t], method="base_forward")
            for t in range(T)
        ],
        axis=1,
    )
    want = model.apply(variables, seg, method="fuse_precomputed")
    # streaming s2d path
    buf = jnp.concatenate(
        [
            model.apply(variables, frames[t], method="base_forward_s2d")
            for t in range(T)
        ],
        axis=-1,
    )
    got = from_s2d(
        model.apply(variables, buf, method="fuse_s2d", orig_hw=(H, W)),
        4, H, W,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_multiframe_head_train_bn_matches_flax_batchnorm():
    """MultiFrameHead's train path implements BN manually (the eval path
    folds BN into s2d-domain affines); its semantics must match flax
    nn.BatchNorm (f32 stats, 0.9/0.1 running update) exactly."""
    import numpy as np
    from flax import linen as nn
    from mfcnet_tpu.models.mfcnet import MultiFrameHead

    T, C, H, W = 3, 5, 16, 16
    head = MultiFrameHead(C, T)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, H, W, T * C)).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, train=True)

    y, upd = head.apply(x=x, variables=variables, train=True,
                        mutable=["batch_stats"])

    # flax-BN oracle applied with the same params on conv_0's output
    from mfcnet_tpu.ops.fastconv import fast_conv_same

    k0 = variables["params"]["Conv_0"]["kernel"]
    c0 = fast_conv_same(x, k0)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    bn_vars = {
        "params": {
            "scale": variables["params"]["BatchNorm_0"]["scale"],
            "bias": variables["params"]["BatchNorm_0"]["bias"],
        },
        "batch_stats": {
            "mean": variables["batch_stats"]["BatchNorm_0"]["mean"],
            "var": variables["batch_stats"]["BatchNorm_0"]["var"],
        },
    }
    _, bn_upd = bn.apply(bn_vars, c0, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["BatchNorm_0"]["mean"]),
        np.asarray(bn_upd["batch_stats"]["mean"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["BatchNorm_0"]["var"]),
        np.asarray(bn_upd["batch_stats"]["var"]), rtol=1e-6,
    )
    # and train-vs-eval consistency: eval with the updated stats stays
    # finite and shaped
    ev = head.apply(
        {"params": variables["params"],
         "batch_stats": upd["batch_stats"]}, x, train=False
    )
    assert ev.shape == (2, H, W, C)
    assert bool(jnp.all(jnp.isfinite(ev)))
