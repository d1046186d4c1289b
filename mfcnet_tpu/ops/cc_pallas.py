"""Pallas TPU kernel: connected-component labeling by segmented min-scans.

Replaces the XLA lowering of the same algorithm
(track/decode_device.connected_components) for the on-device keypoint
decode hot path. The whole label image lives in VMEM for the entire
convergence loop — zero HBM round trips between iterations — and every
operation is an elementwise min/select over statically-shifted copies
(VPU lanes/sublanes), with no gathers:

  * per iteration: 3x3 diagonal min (8-connectivity hand-off), then a
    Hillis-Steele SEGMENTED min-scan (log2 W static shift-doubling
    steps, background pixels as segment resets) along rows, then along
    columns — one iteration fuses a whole straight run in each axis;
  * convergence: in-kernel ``lax.while_loop`` on the VMEM-resident
    labels until a fixpoint.

Measured at (2, 480, 640) int32 on v5e: ~0.6 ms vs ~30 ms for the XLA
associative_scan + gather formulation (see decode_device) — the XLA
version pays ~10 ms/iteration in relayouts and a 7.8 ms gather; here an
iteration is ~60 elementwise VMEM passes at ~1 us each.

Labels follow the XLA reference exactly: each foreground pixel ends with
its component's minimum flat index (row-major), background pixels get
H*W. Parity is pinned against the XLA path in tests/test_decode_device.py
(interpret mode on CPU; the real-TPU path is exercised by bench --mode
e2e --decode device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(v, s: int, axis: int, fill):
    """Static shift by ``s`` (positive = toward higher indices) with fill."""
    size = v.shape[axis]
    if s >= size or -s >= size:
        return jnp.full_like(v, fill)
    pad_shape = list(v.shape)
    pad_shape[axis] = abs(s)
    filler = jnp.full(pad_shape, fill, v.dtype)
    if s > 0:
        body = lax.slice_in_dim(v, 0, size - s, axis=axis)
        return jnp.concatenate([filler, body], axis=axis)
    body = lax.slice_in_dim(v, -s, size, axis=axis)
    return jnp.concatenate([body, filler], axis=axis)


def _seg_scan_min(v, reset, axis: int, reverse: bool, big):
    """Inclusive segmented min-scan via shift doubling.

    After step k, v[i] = min over the up-to-2^k positions ending at i
    that lie within i's run (reset=1 truncates). ``reset`` is int32 0/1 —
    Mosaic rejects shifted/concatenated i1 vectors ("invalid vector
    register cast"), so flags stay in int32 lanes throughout."""
    size = v.shape[axis]
    f = reset  # int32 0/1 (i8 compares are unsupported on this target)
    s = 1
    sign = -1 if reverse else 1
    while s < size:
        vs = _shift(v, sign * s, axis, big)
        fs = _shift(f, sign * s, axis, jnp.int32(1))
        v = jnp.where(f == 1, v, jnp.minimum(v, vs))
        f = jnp.maximum(f, fs)
        s <<= 1
    return v


def _cc_kernel(mask_ref, lab_ref, *, conn: int, H: int, W: int):
    mi = mask_ref[0].astype(jnp.int32)  # int8 0/1 input (VMEM budget)
    fg = mi == 1
    n = jnp.int32(H * W)
    row = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lab0 = jnp.where(fg, row * W + col, n)
    reset = 1 - mi  # int32 flags (see _seg_scan_min)

    def seg_min(l, axis):
        fwd = _seg_scan_min(l, reset, axis, False, n)
        bwd = _seg_scan_min(l, reset, axis, True, n)
        return jnp.where(fg, jnp.minimum(fwd, bwd), n)

    def diag_min(l):
        d = jnp.minimum(
            jnp.minimum(
                _shift(_shift(l, 1, 0, n), 1, 1, n),
                _shift(_shift(l, 1, 0, n), -1, 1, n),
            ),
            jnp.minimum(
                _shift(_shift(l, -1, 0, n), 1, 1, n),
                _shift(_shift(l, -1, 0, n), -1, 1, n),
            ),
        )
        return jnp.where(fg, jnp.minimum(l, d), n)

    def body(carry):
        l, _ = carry
        l2 = l if conn == 4 else diag_min(l)
        l2 = seg_min(l2, 1)
        l2 = seg_min(l2, 0)
        return l2, jnp.any(l2 != l)

    lab, _ = lax.while_loop(
        lambda c: c[1], body, (lab0, jnp.bool_(True))
    )
    lab_ref[0] = lab


@functools.partial(
    jax.jit, static_argnames=("connectivity", "interpret")
)
def connected_components_pallas(mask, connectivity: int = 8,
                                interpret: bool = False):
    """mask: (..., H, W) bool -> int32 labels, same contract as
    decode_device.connected_components. ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU parity tests)."""
    H, W = mask.shape[-2:]
    lead = mask.shape[:-2]
    m = mask.reshape((-1, H, W)).astype(jnp.int8)
    B = m.shape[0]
    out = pl.pallas_call(
        functools.partial(_cc_kernel, conn=connectivity, H=H, W=W),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
        **(
            {}
            if interpret
            else {
                "compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024
                )
            }
        ),
    )(m)
    return out.reshape(mask.shape)
