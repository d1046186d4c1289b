"""Device mesh + sharding helpers (replaces the reference's nn.DataParallel)."""

from mfcnet_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    init_distributed,
    shard_host_local_batch,
    spatial_sharding,
    shard_multiframe_batch,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "init_distributed",
    "shard_host_local_batch",
    "spatial_sharding",
    "shard_multiframe_batch",
]
