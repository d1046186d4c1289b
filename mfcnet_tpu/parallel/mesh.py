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
