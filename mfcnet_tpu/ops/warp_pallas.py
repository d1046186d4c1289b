"""Pallas TPU kernel for the banded bilinear flow warp.

Third implementation tier of the full-res flow warp (the MFCNet Basic
head's alignment step, reference models/multiframe_model.py:141-170):

  1. gather (ops/warp.py::grid_sample_bilinear): one 2x2-patch-table
     take_along_axis — XLA's TPU gather is index-rate bound at a flat
     ~70M idx/s (tools/warp_probe.py), 7-9 ms at 480x640.
  2. banded one-hot matmuls in XLA
     (ops/warp.py::grid_sample_bilinear_banded): exact, but the
     materialized one-hot operands and band temporaries cost ~1.5 GB of
     HBM traffic — only ~1.3x faster than the gather.
  3. THIS kernel: the same banded math with the one-hots generated
     IN VMEM per tile (iota compares) and consumed immediately by the
     MXU — HBM sees only the band slabs and the output. Column mixing
     is one (TILE, W) @ (W, S*C) matmul per pixel tile; row mixing is a
     VPU weighted 2-hot multiply + one (TILE, S*C) @ (S*C, C) selector
     matmul that performs the segment sum over the slab rows.

Exactness: identical math to tier 2 (bilinear weights folded into the
one-hots, zero-padding semantics from comparisons matching nothing);
the caller guards the band bound and falls back to tier 1 via lax.cond,
so all three tiers agree wherever they are used (pinned in
tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_band_kernel(lo_ref, slab_ref, fx_ref, fy_ref, out_ref,
                      *, W, S, C, TILE, cdt):
    """One (batch, band, pixel-tile) program.

    lo_ref: (nb, 1) SMEM — per-band slab start rows (absolute); this
      program reads its band's entry by grid position.
    slab_ref: (1, 1, W, S*C) VMEM — the band's source slab, W on
      sublanes, (slab row, channel) flattened on lanes.
    fx_ref/fy_ref: (1, 1, TILE, 1) VMEM — source coords for this
      tile's output pixels.
    out_ref: (1, 1, TILE, C) VMEM.
    """
    f32 = jnp.float32
    band_i = pl.program_id(1)
    fx = fx_ref[0, 0]  # (TILE, 1)
    fy = fy_ref[0, 0]

    # columns: the weighted bilinear 2-hot IS the hat function
    # relu(1 - |col - fx|) — weight (1-tx) at floor(fx), tx at
    # floor(fx)+1, zero elsewhere (incl. out of range) in ONE
    # VPU expression instead of two equality tests + blends
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (TILE, W), 1
    ).astype(f32)
    colhot = jnp.maximum(1.0 - jnp.abs(cols - fx), 0.0).astype(cdt)
    tmp = jax.lax.dot_general(
        colhot, slab_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (TILE, S*C) f32: per pixel, every slab row's col-interp sample

    # rows: lane k holds slab row k//C -> absolute row lo + k//C
    lo = lo_ref[band_i, 0].astype(f32)
    lane_row = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE, S * C), 1) // C
    ).astype(f32) + lo
    rowhot = jnp.maximum(
        1.0 - jnp.abs(lane_row - fy), 0.0
    ).astype(cdt)  # (TILE, S*C) hat weights
    mixed = tmp.astype(cdt) * rowhot

    # segment-sum over slab rows: one selector matmul (k -> k % C)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (S * C, C), 0) % C
    out_c = jax.lax.broadcasted_iota(jnp.int32, (S * C, C), 1)
    sel = (lane_c == out_c).astype(cdt)
    out_ref[0, 0] = jax.lax.dot_general(
        mixed, sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(out_ref.dtype)


def _banded_warp_reference(img, fx, fy, bounds, band):
    """Pure-jnp transcription of the kernel's hat math — the autodiff
    backward for :func:`banded_warp_pallas` (pallas_call has no JVP
    rule; the train step differentiates through the Basic head's warp,
    so the kernel needs a custom VJP — same pattern as
    correlation_pallas). Exactly the same weights/zeros semantics as
    the kernel; only used under differentiation."""
    B, H, W, C = img.shape
    Ho = fx.shape[1]
    nb = len(bounds)
    S = max(hi - lo for lo, hi in bounds)
    bounds = tuple((lo, lo + S) for lo, _ in bounds)
    pt = max(0, -min(lo for lo, _ in bounds))
    pb = max(0, max(hi for _, hi in bounds) - H)
    dt = img.dtype
    imgp = jnp.pad(img, ((0, 0), (pt, pb), (0, 0), (0, 0)))
    xs = jnp.arange(W, dtype=jnp.float32)
    outs = []
    for b, (lo, hi) in enumerate(bounds):
        r0, r1 = b * band, min((b + 1) * band, Ho)
        nbp = (r1 - r0) * W
        fx_b = fx[:, r0:r1].reshape(B, nbp, 1)
        fy_b = fy[:, r0:r1].reshape(B, nbp, 1)
        colhot = jnp.maximum(1.0 - jnp.abs(xs - fx_b), 0.0).astype(dt)
        slab = imgp[:, lo + pt : hi + pt]
        slabT = slab.transpose(0, 2, 1, 3).reshape(B, W, S * C)
        tmp = jnp.einsum(
            "bnw,bwk->bnk", colhot, slabT,
            preferred_element_type=jnp.float32,
        ).reshape(B, nbp, S, C)
        abs_rows = jnp.arange(S, dtype=jnp.float32) + lo
        rowhot = jnp.maximum(
            1.0 - jnp.abs(abs_rows - fy_b), 0.0
        ).astype(dt)
        out_b = jnp.einsum(
            "bns,bnsc->bnc", rowhot, tmp.astype(dt),
            preferred_element_type=jnp.float32,
        )
        outs.append(out_b.reshape(B, r1 - r0, W, C).astype(dt))
    return jnp.concatenate(outs, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def banded_warp_pallas(img, fx, fy, bounds, band: int,
                       interpret: bool | None = None):
    """Banded bilinear warp: img (B, H, W, C), fx/fy (B, Ho, W) absolute
    source coords, bounds = static tuple of per-band (lo, hi) slab row
    ranges (see grid_sample_bilinear_banded). Returns (B, Ho, W, C) in
    img.dtype. The caller is responsible for the band-bound guard.
    Pallas forward; XLA-autodiff backward through the identical hat-math
    reference (training differentiates the Basic head's warp)."""
    return _banded_warp_fwd_impl(img, fx, fy, bounds, band, interpret)


def _banded_warp_fwd(img, fx, fy, bounds, band, interpret):
    out = _banded_warp_fwd_impl(img, fx, fy, bounds, band, interpret)
    return out, (img, fx, fy)


def _banded_warp_bwd(bounds, band, interpret, res, g):
    img, fx, fy = res
    _, vjp = jax.vjp(
        lambda i, x, y: _banded_warp_reference(i, x, y, bounds, band),
        img, fx, fy,
    )
    return vjp(g)


banded_warp_pallas.defvjp(_banded_warp_fwd, _banded_warp_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("band", "bounds", "interpret"),
)
def _banded_warp_fwd_impl(img, fx, fy, bounds, band: int,
                          interpret: bool | None = None):
    """The Pallas forward (see banded_warp_pallas)."""
    B, H, W, C = img.shape
    Ho = fx.shape[1]
    if fx.shape[2] != W:
        raise ValueError(
            f"banded_warp_pallas tiles pixels as (band*W) and requires "
            f"the output grid width to equal the image width; got grid "
            f"width {fx.shape[2]} vs image width {W}. Use the XLA "
            f"banded tier (grid_sample_bilinear_banded routes Wo != W "
            f"grids there automatically)."
        )
    nb = len(bounds)
    S = max(hi - lo for lo, hi in bounds)
    bounds = tuple((lo, lo + S) for lo, _ in bounds)  # uniform S
    pt = max(0, -min(lo for lo, _ in bounds))
    pb = max(0, max(hi for _, hi in bounds) - H)
    cdt = img.dtype

    imgp = jnp.pad(img, ((0, 0), (pt, pb), (0, 0), (0, 0)))
    # per-band slabs, W on sublanes, (row, channel) on lanes
    slabs = jnp.stack(
        [imgp[:, lo + pt : hi + pt] for lo, hi in bounds], axis=1
    )  # (B, nb, S, W, C)
    slabs = slabs.transpose(0, 1, 3, 2, 4).reshape(B, nb, W, S * C)
    los = jnp.asarray(
        [lo for lo, _ in bounds], jnp.int32
    ).reshape(nb, 1)

    # pixel coords arranged (B, nb, band*W); Ho may not fill the last
    # band — pad with -1e9 (samples nothing, sliced off after)
    n_pix = nb * band * W
    fx_f = fx.reshape(B, Ho * W)
    fy_f = fy.reshape(B, Ho * W)
    if n_pix != Ho * W:
        pad = n_pix - Ho * W
        fx_f = jnp.pad(fx_f, ((0, 0), (0, pad)), constant_values=-1e9)
        fy_f = jnp.pad(fy_f, ((0, 0), (0, pad)), constant_values=-1e9)
    fx_b = fx_f.reshape(B, nb, band * W, 1)
    fy_b = fy_f.reshape(B, nb, band * W, 1)

    TILE = band * W  # one tile per band (480*32 px at full scale)
    # keep tiles <= ~4096 rows for VMEM; split if needed
    tiles = 1
    while TILE // tiles > 2048 or (TILE % tiles) != 0:
        tiles += 1
    TILE //= tiles

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    kernel = functools.partial(
        _warp_band_kernel, W=W, S=S, C=C, TILE=TILE, cdt=cdt
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nb, tiles),
        in_specs=[
            pl.BlockSpec((nb, 1), lambda b, n, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, W, S * C), lambda b, n, t: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE, 1),
                         lambda b, n, t: (b, n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE, 1),
                         lambda b, n, t: (b, n, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE, C), lambda b, n, t: (b, n, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nb, band * W, C), cdt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(los, slabs, fx_b, fy_b)
    return out.reshape(B, nb * band, W, C)[:, :Ho]
