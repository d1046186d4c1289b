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
