"""Pallas TPU kernel for the UnFlow correlation cost volume.

The reference implements this as three hand-written CUDA kernels compiled at
runtime with CuPy (models/unflow_correlation.py:10-235): a layout rearrange,
a shared-memory forward with a 32-thread warp reduction, and per-sample
backward kernels. On TPU the same computation maps naturally onto the VPU:

  grid = (B, H, D)  — one program per (batch, output row, dy displacement)
  each program holds one f1 row (W, C) and one padded-f2 row (W+2md, C) in
  VMEM and produces the 21 dx channels of that (row, dy) slice with
  shift-multiply-reduce over the lane (C) axis. Pallas double-buffers the
  row DMAs across grid steps automatically.

The backward pass reuses the XLA shift formulation's autodiff (exact same
math as the reference's gradFirst/gradSecond kernels) via ``jax.vjp`` —
one custom_vjp wires the Pallas forward to that backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_row_kernel(f1_ref, f2_ref, out_ref, *, W, C, D, stride):
    """f1_ref: (1, 1, W, C); f2_ref: (1, 1, W + 2md, C);
    out_ref: (1, 1, 1, D, W) — the dx channels for this (row, dy), W in the
    lane dimension (the last two block dims must be full/aligned on TPU)."""
    f1 = f1_ref[0, 0]  # (W, C)
    inv_c = 1.0 / C
    rows = []
    for dxi in range(D):
        win = f2_ref[0, 0, pl.ds(dxi * stride, W), :]  # (W, C)
        rows.append(jnp.sum(f1 * win, axis=-1) * inv_c)  # (W,)
    out_ref[0, 0, 0] = jnp.stack(rows, axis=0)  # (D, W)


def _correlation_pallas_fwd(f1, f2p, max_displacement: int, stride: int):
    B, H, W, C = f1.shape
    md, s_ = max_displacement, stride
    D = 2 * (md // s_) + 1

    kernel = functools.partial(
        _corr_row_kernel, W=W, C=C, D=D, stride=s_
    )
    interpret = jax.default_backend() not in ("tpu",)
    out5 = pl.pallas_call(
        kernel,
        grid=(B, H, D),
        in_specs=[
            pl.BlockSpec(
                (1, 1, W, C),
                lambda b, y, d: (b, y, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, W + 2 * md, C),
                lambda b, y, d: (b, y + d * s_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, D, W),
            lambda b, y, d: (b, y, d, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D, D, W), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * D * D * W * C,
            bytes_accessed=4 * B * H * D * (W * C * 2 + W * D),
            transcendentals=0,
        ),
    )(f1, f2p)
    # (B, H, Ddy, Ddx, W) -> (B, H, W, Ddy*Ddx), tc = dy_idx * D + dx_idx
    return out5.transpose(0, 1, 4, 2, 3).reshape(B, H, W, D * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas(f1, f2, max_displacement: int = 20, stride: int = 2):
    """Cost volume with the reference's channel layout
    (tc = dy_idx * D + dx_idx); Pallas forward, XLA-autodiff backward."""
    md = max_displacement
    f2p = jnp.pad(
        f2.astype(jnp.float32), ((0, 0), (md, md), (md, md), (0, 0))
    )
    return _correlation_pallas_fwd(
        f1.astype(jnp.float32), f2p, max_displacement, stride
    )


def _fwd(f1, f2, max_displacement, stride):
    return correlation_pallas(f1, f2, max_displacement, stride), (f1, f2)


def _bwd(max_displacement, stride, res, g):
    from mfcnet_tpu.ops.correlation import correlation_shifts

    f1, f2 = res
    _, vjp = jax.vjp(
        lambda a, b: correlation_shifts(a, b, max_displacement, stride),
        f1,
        f2,
    )
    return vjp(g)


correlation_pallas.defvjp(_fwd, _bwd)
