"""Pallas TPU direct 3x3 convolution with windowed DMA + tap-pair
packing — the VERDICT r2 item-9 experiment, kept as a verified
demonstration with a DOCUMENTED NEGATIVE RESULT (not wired into models).

Hypothesis: XLA's conv runs the flagship's cin=64 stages at only
~14-15 TFLOP/s bf16 on v5e ((480,640,64->64), (240,320,64->128)), so a
direct kernel that (a) packs TWO taps per matmul to fill all 128
contraction lanes,

  out(y,x) = sum_t  x[y+dy_t, x+dx_t, :] @ w_t
           = sum_pairs  concat(x_t1, x_t2, axis=C) @ concat(w_t1, w_t2)

(4 pairs + 1 single = 5 MXU passes instead of 9 half-empty ones), and
(b) streams row bands + 2 halo rows HBM->VMEM by explicit windowed DMA
(avoiding the im2col relayout traffic that sank the round-2 stage-1
attempt), should recover the headroom.

Measured result (v5e, bf16, bit-exact parity with
lax.conv_general_dilated): (480,640,64->64) 1.48 ms / 15.4 TFLOP/s and
(240,320,64->128) 0.68 ms / 16.7 TFLOP/s — statistically the SAME as
XLA's conv (1.61 ms / 0.73 ms). The control experiments explain why and
close the line for good:

  * a plain XLA matmul of the conv-equivalent shape (307200,128)@(128,64)
    runs at 4.1 TFLOP/s — XLA's conv already beats its own matmul path;
  * (4096,4096)@(4096,4096) reaches 156 TFLOP/s — peak is attainable,
    so the plateau is shape-specific: with N=cout<=128 the weight tile
    occupies a sliver of the MXU and every implementation converges to
    the same N-dim floor (enc1b measured 1.48 ms ~= the analytic
    N-padded MXU floor of ~1.46 ms);
  * therefore the only lever left is changing N itself — which is the
    space-to-depth repacking already shipped for the fusion head
    (ops/fastconv.py), and measured a wash for the encoder (7.1x
    redundant zeros at f=4; docs/PERFORMANCE.md).

Semantics: NHWC, stride 1, SAME; f32 accumulation; fused bias + ReLU.
Parity is pinned in tests/test_ops.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAIRS = ((0, 1), (2, 3), (4, 5), (6, 7))
_SINGLE = 8


def _conv3x3_kernel(x_hbm, w_ref, b_ref, o_ref, xs, sem, *,
                    TH: int, H: int, W: int, cin: int, cout: int,
                    relu: bool):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    # window DMA: TH output rows need TH+2 padded input rows. The HBM
    # window must span the FULL (tile-aligned) last two dims — Mosaic
    # rejects partial slices of tiled dims — so the wrapper pads W+2 to
    # a sublane multiple and cin to a full 128-lane tile; the tap views
    # below slice the logical region back out in VMEM.
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * TH, TH + 2)], xs, sem
    )
    dma.start()
    dma.wait()

    def view(t):
        dy, dx = t // 3, t % 3
        return lax.slice(
            xs[:], (dy, dx, 0), (dy + TH, dx + W, cin)
        ).reshape(TH * W, cin)

    acc = jnp.zeros((TH * W, cout), jnp.float32)
    for t1, t2 in _PAIRS:
        a = jnp.concatenate([view(t1), view(t2)], axis=-1)
        wp = jnp.concatenate(
            [w_ref[t1], w_ref[t2]], axis=0
        )  # (2*cin, cout)
        acc = acc + jnp.dot(a, wp, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(
        view(_SINGLE), w_ref[_SINGLE], preferred_element_type=jnp.float32
    )
    acc = acc + b_ref[0]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype).reshape(TH, W, cout)


def _pick_band(H: int) -> int:
    for th in (60, 48, 40, 32, 24, 16, 8):
        if H % th == 0:
            return th
    return H


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_pallas(x, w, bias=None, relu: bool = False,
                   interpret: bool = False):
    """x (B, H, W, cin) bf16/f32, w (3, 3, cin, cout) -> (B, H, W, cout)
    with SAME padding, stride 1; optional fused bias + ReLU."""
    B, H, W, cin = x.shape
    cout = w.shape[-1]
    TH = _pick_band(H)
    # tile-aligned padding for the HBM window DMA (see kernel docstring)
    wp_cols = (-(W + 2)) % 8
    cpad = (-cin) % 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wp_cols), (0, cpad)))
    wt = w.reshape(9, cin, cout).astype(x.dtype)
    b = (
        jnp.zeros((1, cout), jnp.float32)
        if bias is None else bias.reshape(1, cout).astype(jnp.float32)
    )
    out = pl.pallas_call(
        functools.partial(
            _conv3x3_kernel, TH=TH, H=H, W=W, cin=cin, cout=cout,
            relu=relu,
        ),
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec((9, cin, cout), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, cout), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W + 2 + wp_cols, cin + cpad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        **(
            {}
            if interpret
            else {
                "compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                )
            }
        ),
    )(xp, wt, b)
    return out
