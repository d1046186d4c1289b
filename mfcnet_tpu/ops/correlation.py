"""UnFlow correlation cost volume — the reference's custom CUDA kernel, TPU-native.

Semantics (reference: models/unflow_correlation.py:37-104,282-392): for
feature maps ``f1, f2`` of shape (B, H, W, C) [reference is NCHW], with f2
zero-padded by 20 px, the output has 441 channels indexed
``tc = dy_idx * 21 + dx_idx`` with pixel displacement
``(dx, dy) = ((dx_idx - 10) * 2, (dy_idx - 10) * 2)``:

    out[b, y, x, tc] = (1/C) * sum_c f1[b, y, x, c] * f2[b, y+dy, x+dx, c]

Three implementations:
  * ``impl='shifts'``  — statically unrolled shift-multiply-reduce. Pure XLA,
    autodiff works, bit-exact; best on CPU and the reference for tests.
  * ``impl='mxu'``     — batched matmul of each f1 row against a padded f2
    row for each dy, then banded diagonal extraction. Trades ~8x FLOP
    overcompute for running the contraction on the MXU; fastest on TPU.
  * ``impl='pallas'``  — hand-written Pallas TPU kernel (see
    :mod:`mfcnet_tpu.ops.correlation_pallas`) with a custom VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_spatial(f, pad: int):
    return jnp.pad(f, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def correlation_shifts(f1, f2, max_displacement: int = 20, stride: int = 2):
    """Shift-based cost volume. out channel tc = dy_idx * D + dx_idx."""
    B, H, W, C = f1.shape
    md, s = max_displacement, stride
    D = 2 * (md // s) + 1
    f2p = _pad_spatial(f2, md)
    outs = []
    for dyi in range(D):
        dy = (dyi - md // s) * s
        for dxi in range(D):
            dx = (dxi - md // s) * s
            # window of f2p starting at (md+dy, md+dx) = f2 shifted by (dy,dx)
            win = jax.lax.dynamic_slice(
                f2p, (0, md + dy, md + dx, 0), (B, H, W, C)
            )
            outs.append(jnp.mean(f1 * win, axis=-1))
    return jnp.stack(outs, axis=-1)


def correlation_mxu(f1, f2, max_displacement: int = 20, stride: int = 2):
    """MXU cost volume: per-(y, dy) row matmuls + banded diagonal gather.

    For each dy, P[b, y, x, j] = sum_c f1[b, y, x, c] * f2p[b, y+dy, j, c]
    computed as one big einsum (lands on the MXU); the needed entries are the
    stride-2 band j = x + dx_idx * stride, extracted with a take_along_axis.
    """
    B, H, W, C = f1.shape
    md, s = max_displacement, stride
    D = 2 * (md // s) + 1
    f2p = _pad_spatial(f2, md)  # (B, H+2md, W+2md, C)

    # Rows of f2p needed for dy = (dyi - D//2)*s at output row y:
    # padded row index (y + md) + dy - ... = y + dyi*s. Gather D row-bands.
    # Build (B, D, H, W+2md, C) stack of shifted row views via slicing.
    rows = jnp.stack(
        [f2p[:, dyi * s : dyi * s + H] for dyi in range(D)], axis=1
    )  # (B, D, H, W+2md, C)

    # P[b, d, y, x, j] over j in [0, W+2md)
    P = jnp.einsum(
        "byxc,bdyjc->bdyxj",
        f1,
        rows,
        preferred_element_type=jnp.float32,
        precision="highest",
    )
    # Band: out[b, d, y, x, dxi] = P[b, d, y, x, x + dxi*s]
    j_idx = (
        jnp.arange(W)[:, None] + jnp.arange(D)[None, :] * s
    )  # (W, D)
    band = jnp.take_along_axis(
        P, j_idx[None, None, None, :, :], axis=-1
    )  # (B, D, y, W, D)
    out = jnp.moveaxis(band, 1, 3)  # (B, H, W, Ddy, Ddx)
    return out.reshape(B, H, W, D * D) / C


def correlation_cost_volume(
    f1,
    f2,
    max_displacement: int = 20,
    stride: int = 2,
    impl: str = "auto",
):
    """Dispatch to the best implementation for the current backend."""
    if impl == "auto":
        # measured on v5e at the UnFlow operating point (1, 48, 160, 256):
        # pallas 2.6 ms, mxu-einsum 4.7 ms, shifts fails to compile (441-way
        # unrolled graph) — the Pallas kernel is the TPU default.
        impl = "pallas" if jax.default_backend() == "tpu" else "shifts"
    if impl == "shifts":
        return correlation_shifts(f1, f2, max_displacement, stride)
    if impl == "mxu":
        return correlation_mxu(f1, f2, max_displacement, stride)
    if impl == "pallas":
        from mfcnet_tpu.ops.correlation_pallas import correlation_pallas

        return correlation_pallas(f1, f2, max_displacement, stride)
    raise ValueError(f"unknown correlation impl: {impl}")
