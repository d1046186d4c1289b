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

Measured at (2, 480, 640) int32 on v5e: ~3 ms (incl. dispatch) vs
~30 ms for the XLA associative_scan + gather formulation (see
decode_device) — the XLA version pays ~10 ms/iteration in relayouts and
a 7.8 ms gather; here an iteration is ~60 elementwise VMEM passes.

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


def _seg_scan(v, reset, axis: int, reverse: bool, identity, op):
    """Inclusive SEGMENTED scan (op = min or max) via shift doubling.

    After step k, v[i] = op over the up-to-2^k positions ending at i
    that lie within i's run (reset=1 truncates). Flags are int32 0/1 —
    Mosaic rejects shifted/concatenated i1 vectors ("invalid vector
    register cast") and i8 compares, so flags stay in int32 lanes."""
    size = v.shape[axis]
    f = reset
    s = 1
    sign = -1 if reverse else 1
    while s < size:
        vs = _shift(v, sign * s, axis, identity)
        fs = _shift(f, sign * s, axis, jnp.int32(1))
        v = jnp.where(f == 1, v, op(v, vs))
        f = jnp.maximum(f, fs)
        s <<= 1
    return v


def _propagate(val0, inside, conn: int, op, identity):
    """Fixpoint propagation of ``val0`` (H, W) through ``inside`` regions
    under ``op`` (jnp.minimum for CC labels, jnp.maximum for flood/rank
    spreading): per iteration a diagonal hand-off (8-conn), then
    segmented scans along rows and columns, until nothing changes.
    ``identity`` must be op's neutral element; outside pixels hold it."""
    reset = jnp.where(inside, jnp.int32(0), jnp.int32(1))
    val0 = jnp.where(inside, val0, identity)

    def seg(l, axis):
        fwd = _seg_scan(l, reset, axis, False, identity, op)
        bwd = _seg_scan(l, reset, axis, True, identity, op)
        return jnp.where(inside, op(fwd, bwd), identity)

    def diag(l):
        d = op(
            op(
                _shift(_shift(l, 1, 0, identity), 1, 1, identity),
                _shift(_shift(l, 1, 0, identity), -1, 1, identity),
            ),
            op(
                _shift(_shift(l, -1, 0, identity), 1, 1, identity),
                _shift(_shift(l, -1, 0, identity), -1, 1, identity),
            ),
        )
        return jnp.where(inside, op(l, d), identity)

    def body(carry):
        l, _ = carry
        l2 = l if conn == 4 else diag(l)
        l2 = seg(l2, 1)
        l2 = seg(l2, 0)
        return l2, jnp.any(l2 != l)

    out, _ = lax.while_loop(
        lambda c: c[1], body, (val0, jnp.bool_(True))
    )
    return out


def _cc_kernel(mask_ref, lab_ref, *, conn: int, H: int, W: int):
    mi = mask_ref[0].astype(jnp.int32)  # int8 0/1 input (VMEM budget)
    fg = mi == 1
    n = jnp.int32(H * W)
    row = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lab0 = jnp.where(fg, row * W + col, n)
    lab_ref[0] = _propagate(lab0, fg, conn, jnp.minimum, n)


def _cumsum_2d_excl(v):
    """Row-major EXCLUSIVE prefix sum of an (H, W) int32 image via shift
    doubling (no lax scans, no gathers): per-row inclusive doubling scan,
    then a column doubling scan of row totals for the offsets."""
    H, W = v.shape
    rowscan = v
    s = 1
    while s < W:
        rowscan = rowscan + _shift(rowscan, s, 1, jnp.int32(0))
        s <<= 1
    rowtot = lax.slice_in_dim(rowscan, W - 1, W, axis=1)  # (H, 1)
    # column scan at full lane width — Mosaic cannot concatenate (s, 1)
    # column-vector fills, but sublane shifts of (H, 128) are native
    coltot = jnp.broadcast_to(rowtot, (H, 128))
    s = 1
    while s < H:
        coltot = coltot + _shift(coltot, s, 0, jnp.int32(0))
        s <<= 1
    coltot = lax.slice(coltot, (0, 0), (H, 1))
    # exclusive row offset + exclusive position within the row
    return (coltot - rowtot) + (rowscan - v)


def _flood_cc_cid_kernel(mask_ref, cid_ref, filled_ref, meta_ref, *,
                         H: int, W: int, K: int):
    """Hole filling + labels + dense component ids for ONE class mask,
    entirely in VMEM with ZERO scatters/gathers/sorts:

      1. flood-fill the background from the image border (4-conn max
         propagation) -> interior holes = unreached bg -> filled mask
         (cv2 RETR_EXTERNAL outer-contour semantics);
      2. 8-conn CC labels on the filled mask (min propagation);
      3. component roots -> dense ids in [0, K) via a 2D exclusive
         prefix count of root pixels (shift-doubling cumsum), spread to
         every member (max propagation).

    Outputs: cid (1, H, W) int32 (-1 outside the filled mask), filled
    (1, H, W) int32 0/1, meta (1, 8, 128) f32 with [0, 0] = component
    count (> K means the trailing components aliased into slot K-1 and
    the caller must use the exact XLA fallback)."""
    fg = mask_ref[0].astype(jnp.int32) == 1
    n = jnp.int32(H * W)
    row = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = lax.broadcasted_iota(jnp.int32, (H, W), 1)

    bg = ~fg
    on_border = (
        (row == 0) | (row == H - 1) | (col == 0) | (col == W - 1)
    )
    seed = jnp.where(bg & on_border, jnp.int32(1), jnp.int32(0))
    reach = _propagate(seed, bg, 4, jnp.maximum, jnp.int32(0))
    filled = fg | (bg & (reach == 0))

    lab0 = jnp.where(filled, row * W + col, n)
    lab = _propagate(lab0, filled, 8, jnp.minimum, n)

    is_root = filled & (lab == row * W + col)
    root_i = jnp.where(is_root, 1, 0).astype(jnp.int32)
    rank = _cumsum_2d_excl(root_i)
    nroots = jnp.sum(root_i)
    cid0 = jnp.where(is_root, rank, jnp.int32(-1))
    cid = _propagate(cid0, filled, 8, jnp.maximum, jnp.int32(-1))
    cid_ref[0] = jnp.minimum(cid, K - 1)
    filled_ref[0] = jnp.where(filled, jnp.int32(1), jnp.int32(0))
    mio = lax.broadcasted_iota(jnp.int32, (8, 128), 0) + \
        lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    meta_ref[0] = jnp.where(mio == 0, nroots.astype(jnp.float32), 0.0)


def _onehot_stats_kernel(cid_ref, vals_ref, acc_ref, *, K: int):
    """Accumulate per-component sums as an MXU one-hot matmul:
    acc[v, k] += sum_p vals[v, p] * [cid[p] == k]. Grid dim 1 walks
    pixel chunks of P; cid arrives pre-shaped (P, 1) so the one-hot
    (P, K) needs no in-kernel relayout (Mosaic cannot shape-cast
    lanes into sublanes)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    cid = cid_ref[0]          # (P, 1) int32
    vals = vals_ref[0]        # (5, P) f32
    kio = lax.broadcasted_iota(jnp.int32, (cid.shape[0], K), 1)
    onehot = jnp.where((kio == cid) & (cid >= 0), 1.0, 0.0)
    acc_ref[0, :5] += jnp.dot(
        vals, onehot, preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit, static_argnames=("K", "interpret", "return_cid")
)
def base_stats_pallas(mask, K: int = 256, interpret: bool = False,
                      return_cid: bool = False):
    """mask: (..., H, W) bool class masks -> (stats, ncomp):
    stats (..., 8, K) f32 with rows [pixel count, boundary count, sum w,
    sum w*x, sum w*y] per dense component id of the HOLE-FILLED mask
    (w = 1 interior / 0.5 boundary, x/y in pixels); ncomp (...,) int32
    component count (> K means slot aliasing — use the XLA fallback).
    With ``return_cid`` a third output carries the (..., H, W) int32
    dense-component-id image (-1 outside the filled mask; ids match the
    stats slot axis) — the per-pixel key for component-gated masking.

    Two kernels with an XLA elementwise stage between: hole-fill +
    labels + dense ids (:func:`_flood_cc_cid_kernel`), then value planes
    (boundary/moment weights — XLA fuses these), then the one-hot MXU
    matmul accumulation (:func:`_onehot_stats_kernel`). Replaces XLA's
    scatter-add segment_sum (~8 ms each at this size on v5e)."""
    H, W = mask.shape[-2:]
    lead = mask.shape[:-2]
    m = mask.reshape((-1, H, W)).astype(jnp.int8)
    B = m.shape[0]
    n = H * W
    kw = (
        {}
        if interpret
        else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            )
        }
    )
    cid, filled, meta = pl.pallas_call(
        functools.partial(_flood_cc_cid_kernel, H=H, W=W, K=K),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )(m)
    ncomp = meta[:, 0, 0].astype(jnp.int32)

    # value planes in XLA (elementwise, fused) + the relayouts Mosaic
    # can't do (lanes -> sublanes flattening happens here for free)
    fb = filled == 1
    fp = jnp.pad(fb, ((0, 0), (1, 1), (1, 1)))
    interior4 = (
        fp[:, :-2, 1:-1] & fp[:, 2:, 1:-1]
        & fp[:, 1:-1, :-2] & fp[:, 1:-1, 2:]
    ) & fb
    row = jnp.arange(H, dtype=jnp.float32)[:, None]
    col = jnp.arange(W, dtype=jnp.float32)[None, :]
    ones = jnp.where(fb, 1.0, 0.0)
    bnd = jnp.where(fb & ~interior4, 1.0, 0.0)
    w = jnp.where(interior4, 1.0, 0.5) * ones
    vals = jnp.stack(
        [ones, bnd, w, w * col, w * row], axis=1
    ).reshape(B, 5, n)

    P = 4096
    npad = (-n) % P
    cid_flat = jnp.pad(
        cid.reshape(B, n), ((0, 0), (0, npad)), constant_values=-1
    )[..., None]  # (B, n', 1)
    vals = jnp.pad(vals, ((0, 0), (0, 0), (0, npad)))
    nprime = n + npad
    stats5 = pl.pallas_call(
        functools.partial(_onehot_stats_kernel, K=K),
        grid=(B, nprime // P),
        in_specs=[
            pl.BlockSpec((1, P, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, P), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, K), lambda b, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, K), jnp.float32),
        interpret=interpret,
        **kw,
    )(cid_flat, vals)
    stats = stats5.at[:, 5, 0].set(ncomp.astype(jnp.float32))
    out = (
        stats.reshape(lead + (8, K)),
        ncomp.reshape(lead),
    )
    if return_cid:
        out = out + (cid.reshape(lead + (H, W)),)
    return out


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
