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
    if len(shape) > 1 and n_devices == len(jax.devices()):
        # multi-axis mesh over ALL devices: lay axes along the physical
        # ICI topology (halo exchanges and per-group collectives then
        # ride neighbor links instead of arbitrary routes). Falls back
        # to row-major order where no topology is known (CPU/subsets).
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh(tuple(shape), devices=devs)
            return Mesh(arr, axis_names=tuple(axis_names))
        except Exception:
            pass
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


# Height-dimension index per multi-frame batch key, for spatial partitioning.
# frames (B,T,H,W,3) / depth (B,T,H,W,1) -> axis 2; mask (B,H,W) -> axis 1.
_MULTIFRAME_H_AXES = {"frames": 2, "depth": 2, "mask": 1, "image": 1}


def spatial_sharding(
    mesh: Mesh, ndim: int, h_axis: int,
    data_axis: Optional[str] = "data", spatial_axis: str = "spatial",
) -> NamedSharding:
    """Shard axis 0 over ``data`` and the height axis over ``spatial``.

    The reference has no model-parallel axis at all (SURVEY.md §2.5:
    single-process DataParallel only). Spatial partitioning is the
    TPU-native model-parallel dimension for dense-prediction CNNs: the
    480x640 activations dominate memory and FLOPs, so sharding H over a
    mesh axis lets GSPMD split every conv spatially and insert the halo
    exchanges over ICI automatically — no manual ghost-cell code. This is
    what gives single-stream latency scaling (a batch-1 video tracker
    cannot use the data axis) and >HBM image sizes.
    """
    spec = [None] * ndim
    if data_axis is not None and data_axis in mesh.axis_names:
        spec[0] = data_axis
    if h_axis >= ndim:
        raise ValueError(f"h_axis {h_axis} out of range for ndim {ndim}")
    spec[h_axis] = spatial_axis
    return NamedSharding(mesh, P(*spec))


def respec_spatial(x, h_axis: int = 1, min_rows: int = 1):
    """Pin a spatially-shardable activation's height sharding (or its
    replication) inside a jitted step — a no-op without an ambient
    'spatial' mesh axis.

    Why: under a data x spatial mesh, GSPMD propagates shardings through
    the U-Net freely; at the bottleneck the activation height shrinks
    below the spatial axis extent (480/32 = 15 rows over 4 shards at the
    center block) and the propagated choices can disagree between
    producer and consumer — XLA then warns ``[SPMD] Involuntary full
    rematerialization`` and inserts a full replicate + repartition
    (r4 gate artifact, jit(train_step)/.../base/center/ConvReLU_0). This
    constraint makes the decision explicit: keep H on 'spatial' while
    every shard gets at least ``min_rows`` rows (GSPMD pads uneven
    splits — 15 rows over 4 shards is fine), and replicate the H axis
    once H drops below the axis extent (tiny bottleneck tensors are
    cheaper to replicate than to scatter over mostly-empty shards). All
    other axes are left UNCONSTRAINED so the batch/stream sharding
    keeps whatever layout the caller set up.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or "spatial" not in getattr(mesh, "axis_names", ()):
        return x
    n = mesh.shape["spatial"]
    if n <= 1 or h_axis >= x.ndim:
        return x
    U = P.UNCONSTRAINED
    spec = [U] * x.ndim
    H = int(x.shape[h_axis])
    spec[h_axis] = "spatial" if H >= n * min_rows else None
    return jax.lax.with_sharding_constraint(x, P(*spec))


def shard_multiframe_batch(mesh: Mesh, batch: dict):
    """device_put a multi-frame batch dict with data x spatial sharding.

    Keys with a known height axis (frames/depth/mask) are sharded over
    both mesh axes; unknown keys fall back to axis-0 data sharding. With
    a 1-D data mesh this degenerates to :func:`shard_batch` exactly.
    """
    has_spatial = "spatial" in mesh.axis_names
    out = {}
    for key, value in batch.items():
        if has_spatial and key in _MULTIFRAME_H_AXES:
            sh = spatial_sharding(mesh, value.ndim, _MULTIFRAME_H_AXES[key])
        else:
            sh = data_sharding(mesh, value.ndim)
        out[key] = jax.device_put(value, sh)
    return out


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
