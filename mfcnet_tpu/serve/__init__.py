"""Serving: AOT-exported StableHLO inference artifacts (``jax.export``)."""

from mfcnet_tpu.serve.engine import ArtifactEngine
from mfcnet_tpu.serve.export import (
    LoadedServing,
    export_incremental,
    export_serving,
    export_singleframe,
    load_exported,
    make_incremental_step,
    make_serving_fn,
    make_singleframe_serving_fn,
    save_exported,
    zero_state,
)

__all__ = [
    "ArtifactEngine",
    "LoadedServing",
    "export_incremental",
    "export_serving",
    "export_singleframe",
    "load_exported",
    "make_incremental_step",
    "make_serving_fn",
    "make_singleframe_serving_fn",
    "save_exported",
    "zero_state",
]
