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


def test_dataloader_process_sharding_disjoint_cover():
    """DataLoader(shard=(rank, count)): identical global shuffle per
    process, strided disjoint slices, joint coverage of the dataset."""
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
        assert len(got) == (23 - rank + 2) // 3
    assert seen[0] | seen[1] | seen[2] == set(range(23))
    assert not (seen[0] & seen[1]) and not (seen[1] & seen[2])
    assert sum(len(s) for s in seen) == 23
    # drop_last trims to full local batches
    dl = DataLoader(_DS(), 2, shuffle=True, seed=7, num_workers=1,
                    shard=(0, 3), drop_last=True)
    got = [int(v) for b in dl for v in b["idx"][:, 0]]
    assert len(got) == len(dl) * 2
