"""Pallas TPU kernel: fused VGG stage-1 (conv3x3 cin->64, ReLU, conv3x3
64->64, ReLU).

Why: XLA lowers these convs with the contraction on the 128-wide MXU lane
dim — cin=3 uses 3/128 lanes and cin=64 uses 64/128, so stage-1 runs at
~1-16 TFLOP/s effective (measured ~1.9 ms/frame at 480x640 bf16 on v5e,
~26% of the whole flagship pipeline). This kernel rebuilds each conv as an
im2col matmul with the FULL (ky*kx*cin) patch vector on the contraction
dim (72 and 576 — no lane waste), with patches assembled in VMEM via lane
concatenation (never touching HBM) and the intermediate activation kept in
VMEM. Replaces the reference's cuDNN path for this stage
(reference: models/ternausnet.py:116-120, torchvision VGG features).

STATUS (round 2, updated): compiles AND runs on the v5e at 480x640 now —
the row offset is a runtime SMEM scalar and the H-chunk loop is a
lax.scan, so the program contains ONE Mosaic kernel (the earlier
per-chunk static offsets compiled 15 distinct kernels, which OOM-killed
the AOT compile helper; per-grid-step internals also had to fit the
16 MB scoped-VMEM budget => tile_rows<=8 at 480x640).

Measured @480x640 bf16 (in-jit loop, v5e): this kernel 7.1 ms/frame
('patches' variant) / 5.7 ms ('taps' variant) vs plain XLA convs
1.3 ms. The im2col patch assembly — (R,TW,C)->(R*TW,C) relayout
reshapes and 64-lane concats — dominates and runs on the VPU, while
XLA's own conv schedule reaches ~50-60 TFLOP/s on these shapes (its
practical ceiling here; also measured: space-to-depth packing of
stage-1 is a wash at f=2 and 2.3x worse at f=4 because the packed
kernel multiplies 7.1x redundant zeros). The kernel is therefore kept
as a verified demonstration of the fused im2col-in-VMEM approach (and
the compile-shape constraints), NOT wired into the models — the plain
XLA convs are faster. See tests/test_ops.py::test_vgg_stage1_pallas_parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CIN_PAD = 8  # pad the 3 input channels to a sublane-friendly 8


def _kernel(x_ref, ro_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, R,
            TW, W, C1, Himg):
    """x_ref: (1, 1, R+4, TW+4, 8) pre-overlapped input tile (halo 2);
    ro_ref: (1,) SMEM scalar — the H-chunk's start row (runtime value so
    every chunk shares ONE compiled kernel); out_ref: (R, TW, C1) output
    tile. Tiled over both H and W with fully blocked specs — Mosaic's
    compile time explodes on image-wide (600+ col) operands, and
    un-blocked outputs get scoped into VMEM whole."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    # top of this tile in GLOBAL y1-halo coordinates (the boundary mask
    # needs global positions)
    row0 = ro_ref[0] + i * R
    col0 = j * TW

    # --- conv1: (R+2) x (TW+2) region of y1 (halo 1 for conv2) ---
    R1 = R + 2
    T1 = TW + 2
    xs = x_ref[0, 0, :, :, :]  # (R+4, TW+4, 8)
    parts = []
    for dy in range(3):
        for dx in range(3):
            sl = xs[dy : dy + R1, dx : dx + T1, :]
            parts.append(sl.reshape(R1 * T1, _CIN_PAD))
    patches1 = jnp.concatenate(parts, axis=-1)  # (R1*T1, 72)
    y1 = jnp.dot(
        patches1, w1_ref[:, :], preferred_element_type=jnp.float32
    )
    y1 = jnp.maximum(y1 + b1_ref[:, :], 0.0)
    y1 = y1.astype(out_ref.dtype).reshape(R1, T1, C1)
    # conv2's SAME padding sees ZEROS outside the image; the halo ring of
    # y1 holds real conv1-of-padded-x values (nonzero via bias+relu) and
    # must be masked out where it falls outside [0, H) x [0, W)
    r_img = (
        row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (R1, T1, 1), 0)
    )
    c_img = (
        col0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (R1, T1, 1), 1)
    )
    valid = (
        (r_img >= 0) & (r_img < Himg) & (c_img >= 0) & (c_img < W)
    )
    y1 = jnp.where(valid, y1, jnp.zeros_like(y1))

    # --- conv2: the R x TW output tile ---
    parts2 = []
    for dy in range(3):
        for dx in range(3):
            sl = y1[dy : dy + R, dx : dx + TW, :]
            parts2.append(sl.reshape(R * TW, C1))
    patches2 = jnp.concatenate(parts2, axis=-1)  # (R*TW, 9*C1)
    y2 = jnp.dot(
        patches2, w2_ref[:, :], preferred_element_type=jnp.float32
    )
    y2 = jnp.maximum(y2 + b2_ref[:, :], 0.0)
    out_ref[:, :, :] = y2.astype(out_ref.dtype).reshape(R, TW, C1)


def _kernel_taps(x_ref, ro_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                 *, R, TW, W, C1, Himg):
    """Tap-accumulation variant: conv2 = sum of 9 shifted (R,TW,C1) x
    (C1,C1) dot_generals — avoids the (R,TW,C)->(R*TW,C) relayout
    reshapes of the im2col path for the second conv (conv1 keeps the 2D
    patch matmul; its 8-lane pieces are cheap). Measured ~1.25x faster
    than the 'patches' variant on v5e, still ~4x slower than XLA."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = ro_ref[0] + i * R
    col0 = j * TW

    R1 = R + 2
    T1 = TW + 2
    xs = x_ref[0, 0, :, :, :]
    parts = []
    for dy in range(3):
        for dx in range(3):
            sl = xs[dy : dy + R1, dx : dx + T1, :]
            parts.append(sl.reshape(R1 * T1, _CIN_PAD))
    patches1 = jnp.concatenate(parts, axis=-1)  # (R1*T1, 72)
    y1 = jnp.dot(patches1, w1_ref[:, :],
                 preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[:, :], 0.0).reshape(R1, T1, C1)
    r_img = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (R1, T1, 1), 0)
    c_img = col0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (R1, T1, 1), 1)
    valid = (r_img >= 0) & (r_img < Himg) & (c_img >= 0) & (c_img < W)
    y1 = jnp.where(valid, y1, 0.0).astype(out_ref.dtype)

    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = y1[dy : dy + R, dx : dx + TW, :]
            tap = w2_ref[(dy * 3 + dx) * C1 : (dy * 3 + dx + 1) * C1, :]
            p = jax.lax.dot_general(
                sl, tap, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
    y2 = jnp.maximum(acc + b2_ref[0, :], 0.0)
    out_ref[:, :, :] = y2.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows", "tile_cols",
                                             "variant"))
def vgg_stage1_pallas(x, k1, b1, k2, b2, tile_rows: int = 16,
                      tile_cols: int = 128, variant: str = "patches"):
    """relu(conv2(relu(conv1(x)))) for 3x3 SAME convs, NHWC.

    x: (B, H, W, 3); k1: (3, 3, 3, C1); k2: (3, 3, C1, C1). H (W) must be
    a multiple of ``tile_rows`` (``tile_cols``). Returns (B, H, W, C1).
    ``variant``: 'patches' (full im2col matmuls) or 'taps' (conv2 as 9
    accumulated tap matmuls). At 480x640 bf16 use tile_rows<=8 — larger
    tiles exceed the 16 MB scoped-VMEM budget per grid step.
    """
    B, H, W, _ = x.shape
    C1 = k1.shape[-1]
    R = tile_rows
    TW = min(tile_cols, W)
    assert H % R == 0 and W % TW == 0, (H, R, W, TW)

    # pad: 1px halo per conv on each side -> 2; cin 3 -> 8
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, _CIN_PAD - x.shape[-1])))
    # pre-overlapped tiles (B, H/R, W/TW, R+4, TW+4, 8): tiny (~6 MB at
    # 480x640) and lets every pallas operand be a blocked spec
    ri = np.arange(H // R)[:, None] * R + np.arange(R + 4)[None, :]
    ci = np.arange(W // TW)[:, None] * TW + np.arange(TW + 4)[None, :]
    xt = xp[:, ri][:, :, :, ci]  # (B, H/R, R+4, W/TW, TW+4, 8)
    xt = jnp.moveaxis(xt, 3, 2)  # (B, H/R, W/TW, R+4, TW+4, 8)

    def flat_w(k, cin):
        # row index (dy*3 + dx)*cin + c, matching the patch concat order
        kh, kw = k.shape[0], k.shape[1]
        if k.shape[2] < cin:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, cin - k.shape[2]), (0, 0)))
        return k.reshape(kh * kw * cin, k.shape[-1])

    w1 = flat_w(k1, _CIN_PAD).astype(x.dtype)
    w2 = flat_w(k2, C1).astype(x.dtype)
    b1r = b1.reshape(1, C1).astype(jnp.float32)
    b2r = b2.reshape(1, C1).astype(jnp.float32)

    # The AOT compile path scopes each pallas call's full output into
    # VMEM (16 MB); chunk over H so out_chunk stays well under the limit.
    rows_per_chunk = R
    while (rows_per_chunk * 2 * W * C1 * 2 <= 6 * 2**20
           and (H // R) % ((rows_per_chunk * 2) // R) == 0
           and rows_per_chunk * 2 <= H):
        rows_per_chunk *= 2
    Hc = rows_per_chunk
    n_chunks = H // Hc
    tiles_per_chunk = Hc // R

    interpret = jax.default_backend() not in ("tpu",)

    kernel = functools.partial(
        _kernel_taps if variant == "taps" else _kernel,
        R=R, TW=TW, W=W, C1=C1, Himg=H,
    )
    call = pl.pallas_call(
        kernel,
        grid=(tiles_per_chunk, W // TW),
        in_specs=[
            pl.BlockSpec(
                (1, 1, R + 4, TW + 4, _CIN_PAD),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk row offset
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (R, TW, C1), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Hc, W, C1), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Hc * W * (9 * _CIN_PAD + 9 * C1) * C1,
            bytes_accessed=(
                (Hc + 4) * (W + 4) * _CIN_PAD * 2 + Hc * W * C1 * 2
            ),
            transcendentals=0,
        ),
    )

    # one chunk per scan step: the row offset is a runtime SMEM scalar,
    # so all chunks share one Mosaic kernel and one call site (the
    # earlier static-offset python loop compiled n_chunks kernels)
    offs = jnp.arange(n_chunks, dtype=jnp.int32).reshape(n_chunks, 1) * Hc

    def one(xi):
        xc = xi.reshape(n_chunks, tiles_per_chunk, W // TW,
                        R + 4, TW + 4, _CIN_PAD)

        def body(carry, inp):
            xck, off = inp
            return carry, call(xck, off, w1, b1r, w2, b2r)

        _, outs = jax.lax.scan(body, None, (xc, offs))
        return outs.reshape(H, W, C1)

    return jax.vmap(one)(xt)


def reference_stage1(x, k1, b1, k2, b2):
    """Plain-XLA oracle for the kernel (identical math)."""
    from jax import lax

    y = lax.conv_general_dilated(
        x, k1.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1.astype(x.dtype)
    y = jnp.maximum(y, 0)
    y = lax.conv_general_dilated(
        y, k2.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2.astype(x.dtype)
    return jnp.maximum(y, 0)
