"""Device mesh and sharding utilities.

The reference's only parallelism is single-process ``nn.DataParallel``
(replicate + scatter/gather per step, scripts/train_multiframe_detection.py:
107-110) plus SyncBatchNorm collectives. The TPU-native equivalent is GSPMD:
one ``jax.sharding.Mesh`` with a ``data`` axis; batches are sharded on axis 0
with a NamedSharding, parameters are replicated, and XLA inserts all needed
collectives (gradient all-reduce, global batch-norm statistics) over ICI
automatically. A ``model`` axis is reserved for spatial/tensor sharding of
the large 480x640 activations if future model scale needs it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    Defaults to a 1-D data-parallel mesh over every visible device. Pass
    ``shape`` (multiplying to n_devices) with matching ``axis_names`` for
    multi-axis layouts, e.g. shape=(4, 2), axis_names=('data', 'model').
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard axis 0 over the data mesh axis, replicate the rest."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a pytree of host arrays with axis-0 data sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch
    )


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     auto: bool = False):
    """Multi-host bootstrap around ``jax.distributed.initialize``.

    Initialization triggers when (a) ``auto=True`` — no-arg initialize,
    which runs JAX's cluster autodetection (TPU pod runtime env); or (b)
    explicit coordinates are given via arguments or env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — also
    set MFCNET_MULTIHOST=1 or pass ``--multihost true`` on the train CLI
    for (a)). Otherwise it is a no-op returning (0, 1) — it does NOT
    autodetect on its own, so a pod launch must opt in. Call once before
    any other jax API on every process; afterwards ``jax.devices()``
    spans the whole pod and :func:`make_mesh` lays the data axis over ICI.

    Returns (process_index, process_count).
    """
    import os

    coordinator_address = (
        coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    auto = auto or os.environ.get("MFCNET_MULTIHOST", "") in ("1", "true")
    if coordinator_address or (num_processes or 0) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif auto:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def shard_host_local_batch(mesh: Mesh, batch):
    """Assemble a GLOBAL axis-0-sharded batch from per-host local shards.

    Multi-host data loading: each process loads ``global_batch /
    process_count`` samples; this stitches them into one global
    jax.Array without gathering through any single host
    (``jax.make_array_from_process_local_data``). With one process it is
    equivalent to :func:`shard_batch`.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            data_sharding(mesh, x.ndim), np.asarray(x)
        ),
        batch,
    )
