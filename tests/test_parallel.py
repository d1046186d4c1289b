"""Mesh/sharding helpers: multi-host entry points on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from mfcnet_tpu.parallel import (
    data_sharding,
    init_distributed,
    make_mesh,
    shard_batch,
    shard_host_local_batch,
)


def test_init_distributed_single_process_noop():
    idx, count = init_distributed()
    assert (idx, count) == (0, 1)


def test_shard_host_local_batch_matches_shard_batch():
    """Single-process degenerate case: the per-host assembly path
    (jax.make_array_from_process_local_data) produces the same global
    values and the same axis-0 sharding as plain shard_batch."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    batch = {
        "frames": rng.standard_normal((8, 3, 16, 16, 3)).astype(np.float32),
        "mask": rng.integers(0, 5, (8, 16, 16)).astype(np.int32),
    }
    a = shard_batch(mesh, batch)
    b = shard_host_local_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert b[k].sharding == data_sharding(mesh, batch[k].ndim)
        # really distributed: one shard per device, batch/8 rows each
        assert len(b[k].addressable_shards) == 8
        assert b[k].addressable_shards[0].data.shape[0] == 1

    # a jitted reduction over the assembled batch works under the mesh
    with jax.set_mesh(mesh):
        total = jax.jit(lambda x: jnp.sum(x))(b["frames"])
    np.testing.assert_allclose(
        float(total), batch["frames"].sum(), rtol=1e-5
    )


def test_dataloader_process_sharding_equal_steps_disjoint():
    """DataLoader(shard=(rank, count)): identical global shuffle per
    process, strided disjoint slices, and — critically — the SAME number
    of samples/batches on every rank (each train step is a global SPMD
    program; a rank with an extra batch would deadlock the pod). The
    global permutation is truncated to a multiple of count, so up to
    count-1 samples per epoch are dropped instead."""
    from mfcnet_tpu.data.loader import DataLoader

    class _DS:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return {"idx": np.asarray([i])}

    seen = []
    lens = []
    for rank in range(3):
        dl = DataLoader(_DS(), 2, shuffle=True, seed=7, num_workers=1,
                        shard=(rank, 3))
        got = [int(v) for b in dl for v in b["idx"][:, 0]]
        lens.append(len(dl))
        seen.append(set(got))
        # every rank: exactly floor(23/3) = 7 samples
        assert len(got) == 23 // 3
    # identical batch counts across ranks (the deadlock invariant)
    assert len(set(lens)) == 1
    assert not (seen[0] & seen[1]) and not (seen[1] & seen[2]) \
        and not (seen[0] & seen[2])
    # 21 of 23 covered; the 2 surplus of the shuffled permutation dropped
    assert len(seen[0] | seen[1] | seen[2]) == 21
    # drop_last trims to full local batches, still rank-uniform
    for bs in (2, 3):
        lens = []
        for rank in range(3):
            dl = DataLoader(_DS(), bs, shuffle=True, seed=7, num_workers=1,
                            shard=(rank, 3), drop_last=True)
            got = [int(v) for b in dl for v in b["idx"][:, 0]]
            assert len(got) == len(dl) * bs
            lens.append(len(dl))
        assert len(set(lens)) == 1


# ---------------------------------------------------------------------------
# Spatial partitioning (data x spatial mesh)
# ---------------------------------------------------------------------------

def _tiny_mf_model(h=64, w=32, c=5, t=3):
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.utils.jitinit import jit_init

    base = TernausNet16(
        num_classes=c, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=c, num_frames=t,
        variant="basic", base_output="exp",
    )
    frames = jnp.zeros((1, t, h, w, 3), jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), frames)
    return model, variables


def test_spatial_sharded_forward_matches_single_device():
    """Forward pass with H sharded 4-way (and batch 2-way) over a (2, 4)
    data x spatial mesh equals the single-device forward: GSPMD splits
    every conv spatially and inserts the halo exchanges, changing only
    the compute layout. This is the batch-1 latency-scaling path the
    reference cannot express at all (its only parallelism is
    DataParallel batch scatter, scripts/train_multiframe_detection.py:
    107-110)."""
    from mfcnet_tpu.parallel import shard_multiframe_batch, spatial_sharding

    h, w, c, t = 64, 32, 5, 3
    model, variables = _tiny_mf_model(h, w, c, t)
    rng = np.random.default_rng(3)
    frames = rng.standard_normal((2, t, h, w, 3)).astype(np.float32)

    fwd = jax.jit(lambda v, x: model.apply(v, x))
    ref = np.asarray(fwd(variables, frames))

    mesh = make_mesh(8, ("data", "spatial"), shape=(2, 4))
    batch = shard_multiframe_batch(mesh, {"frames": frames})
    sharded_in = batch["frames"]
    assert sharded_in.sharding == spatial_sharding(mesh, 5, 2)
    # really split: each device holds a (1, t, h/4, w, 3) block
    assert sharded_in.addressable_shards[0].data.shape == (1, t, h // 4, w, 3)
    with jax.set_mesh(mesh):
        out = np.asarray(fwd(variables, sharded_in))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_spatial_sharded_train_step_matches_single_device():
    """One SGD train step on a (2, 4) data x spatial mesh yields the same
    loss/params/BN stats as the unsharded step — spatial partitioning is
    numerically transparent end-to-end (loss reductions and BN statistics
    become cross-axis collectives)."""
    import optax

    from mfcnet_tpu.parallel import shard_multiframe_batch
    from mfcnet_tpu.train.state import TrainState
    from mfcnet_tpu.train.steps import make_multiframe_train_step

    h, w, c, t = 64, 32, 5, 3
    model, variables = _tiny_mf_model(h, w, c, t)

    def fresh_state():
        return TrainState.create(
            model.apply, variables["params"], optax.sgd(1e-2),
            variables.get("batch_stats", {}),
        )

    step = make_multiframe_train_step(
        model, ["nll", "soft_jaccard"], [0.7, 0.3], c,
        class_weights=[1.0, 1000.0, 1000.0, 1000.0, 1000.0],
        train_base_model=True, donate=False,
    )
    rng = np.random.default_rng(11)
    batch = {
        "frames": rng.standard_normal((4, t, h, w, 3)).astype(np.float32),
        "mask": rng.integers(0, c, (4, h, w)).astype(np.int32),
    }

    s_single, logs_single = step(fresh_state(), batch)

    mesh = make_mesh(8, ("data", "spatial"), shape=(2, 4))
    with jax.set_mesh(mesh):
        s_shard, logs_shard = step(
            fresh_state(), shard_multiframe_batch(mesh, batch)
        )

    np.testing.assert_allclose(
        float(logs_single["loss_total"]), float(logs_shard["loss_total"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_single.params)),
        jax.tree.leaves(jax.device_get(s_shard.params)),
    ):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_single.batch_stats)),
        jax.tree.leaves(jax.device_get(s_shard.batch_stats)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_sharded_train_step_with_ema_and_grad_accum():
    """EMA params + optax.MultiSteps state survive the sharded (mesh)
    train step: the EMA blends only on the real update (2nd micro-step)
    and matches the unsharded run."""
    import optax

    from mfcnet_tpu.train.state import TrainState
    from mfcnet_tpu.train.steps import make_multiframe_train_step

    h, w, c, t = 32, 32, 5, 3
    model, variables = _tiny_mf_model(h, w, c, t)
    # SGD inside MultiSteps: this pins the state MECHANICS (accumulation
    # gating + EMA blend under GSPMD); Adam's m/(sqrt(v)+eps) would
    # amplify all-reduce reassociation noise on near-zero gradients into
    # percent-level update diffs and only obscure that
    tx = optax.MultiSteps(optax.sgd(1e-2), every_k_schedule=2)

    def fresh_state():
        return TrainState.create(
            model.apply, variables["params"], tx,
            variables.get("batch_stats", {}), ema_decay=0.5,
        )

    step = make_multiframe_train_step(
        model, ["nll"], [1.0], c,
        class_weights=[1.0] * c, train_base_model=True, donate=False,
    )
    rng = np.random.default_rng(3)
    batches = [
        {
            "frames": rng.standard_normal((8, t, h, w, 3)).astype(
                np.float32
            ),
            "mask": rng.integers(0, c, (8, h, w)).astype(np.int32),
        }
        for _ in range(2)
    ]

    s_single = fresh_state()
    for b in batches:
        s_single, _ = step(s_single, b)

    mesh = make_mesh(8)
    s_shard = fresh_state()
    with jax.set_mesh(mesh):
        for b in batches:
            s_shard, _ = step(s_shard, shard_batch(mesh, b))

    p0 = jax.tree.leaves(variables["params"])
    for init, pa, ea, eb in zip(
        p0,
        jax.tree.leaves(jax.device_get(s_shard.params)),
        jax.tree.leaves(jax.device_get(s_shard.ema_params)),
        jax.tree.leaves(jax.device_get(s_single.ema_params)),
    ):
        # exactly ONE real update after 2 micro-batches: ema = (p0+p1)/2
        # (within the sharded run — same arrays, so near-exact)
        np.testing.assert_allclose(ea, 0.5 * (init + pa), atol=1e-5,
                                   rtol=1e-4)
        # single vs sharded: SGD updates differ only by the gradient
        # all-reduce's reduction order
        np.testing.assert_allclose(ea, eb, atol=2e-5, rtol=1e-4)


def test_shard_multiframe_batch_degenerates_on_data_mesh():
    """With a 1-D data mesh shard_multiframe_batch == shard_batch."""
    from mfcnet_tpu.parallel import shard_multiframe_batch

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    batch = {
        "frames": rng.standard_normal((8, 3, 16, 16, 3)).astype(np.float32),
        "mask": rng.integers(0, 5, (8, 16, 16)).astype(np.int32),
    }
    a = shard_batch(mesh, batch)
    b = shard_multiframe_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding


def test_spatial_sharded_train_step_with_flow():
    """Frozen flow-in-the-loop training on the data x spatial mesh: the
    flow provider (RAFT's one-hot window sampling, instance norm, GRU)
    runs inside the sharded jitted step and the result matches the
    unsharded step."""
    import optax

    from mfcnet_tpu.models.raft import RAFT
    from mfcnet_tpu.parallel import shard_multiframe_batch
    from mfcnet_tpu.train.state import TrainState
    from mfcnet_tpu.train.steps import make_multiframe_train_step
    from mfcnet_tpu.utils.jitinit import jit_init

    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16

    h, w, c, t = 64, 32, 5, 3
    base = TernausNet16(
        num_classes=c, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=c, num_frames=t,
        variant="basic", base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, t, h, w, 3), np.float32),
        optflow=np.zeros((1, t - 1, h, w, 2), np.float32),
    )

    flow_model = RAFT(iters=1)
    flow_vars = jit_init(
        flow_model, jax.random.PRNGKey(1),
        np.zeros((1, h, w, 3), np.float32),
        np.zeros((1, h, w, 3), np.float32),
    )

    def flow_fn(frames):
        B, T = frames.shape[0], frames.shape[1]
        a = jnp.repeat(frames[:, :1], T - 1, axis=1).reshape(
            (B * (T - 1),) + frames.shape[2:]
        )
        b = frames[:, 1:].reshape((B * (T - 1),) + frames.shape[2:])
        fl = flow_model.apply(flow_vars, b, a)
        return fl.reshape((B, T - 1) + fl.shape[1:])

    def fresh_state():
        return TrainState.create(
            model.apply, variables["params"], optax.sgd(1e-2),
            variables.get("batch_stats", {}),
        )

    step = make_multiframe_train_step(
        model, ["nll"], [1.0], c,
        class_weights=[1.0] * c,
        train_base_model=True, flow_fn=flow_fn, donate=False,
    )
    rng = np.random.default_rng(23)
    batch = {
        "frames": rng.standard_normal((4, t, h, w, 3)).astype(np.float32),
        "mask": rng.integers(0, c, (4, h, w)).astype(np.int32),
    }
    s_single, logs_single = step(fresh_state(), batch)

    mesh = make_mesh(8, ("data", "spatial"), shape=(2, 4))
    with jax.set_mesh(mesh):
        s_shard, logs_shard = step(
            fresh_state(), shard_multiframe_batch(mesh, batch)
        )
    np.testing.assert_allclose(
        float(logs_single["loss_total"]), float(logs_shard["loss_total"]),
        rtol=1e-4,
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_single.params)),
        jax.tree.leaves(jax.device_get(s_shard.params)),
    ):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)
