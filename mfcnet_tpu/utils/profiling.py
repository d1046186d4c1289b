"""Profiling & parity helpers.

The reference's only observability is wall-clock AverageMeters
(src/engine.py:15-16). TPU-native equivalents:
  * ``trace(logdir)`` — jax.profiler trace context for TensorBoard/XProf.
  * ``StepTimer`` — per-step wall-clock with device sync, reporting the
    frames/sec/chip north-star metric.
  * ``parity_mode()`` — forces float32 matmul/conv precision inside the
    context (TPU f32 dots default to bf16 passes; checkpoint-parity
    evaluation within the 1e-3 heatmap budget needs true f32).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard's profile tab)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def parity_mode():
    """float32 matmul precision for exact checkpoint-parity evaluation."""
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "float32")
    try:
        yield
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


class StepTimer:
    """Wall-clock step timer with block_until_ready sync."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self):
        return sum(self.times) / max(1, len(self.times))

    def fps(self, frames_per_step: int = 1):
        return frames_per_step / self.mean if self.times else 0.0
