"""Serving: AOT-exported StableHLO inference artifacts (``jax.export``)."""

from mfcnet_tpu.serve.export import (
    LoadedServing,
    export_serving,
    load_exported,
    make_serving_fn,
    save_exported,
)

__all__ = [
    "LoadedServing",
    "export_serving",
    "load_exported",
    "make_serving_fn",
    "save_exported",
]
