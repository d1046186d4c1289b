"""Flow warping via bilinear grid sampling (``F.grid_sample`` semantics).

Replicates the reference's flow-alignment path in MFCNet
(reference: models/multiframe_model.py:141-170 ``_warp_single_map`` — grid
sample with ``mode='bilinear', padding_mode='zeros', align_corners=True``
over a normalized mesh grid displaced by optical flow).

TPU-first: the warp is channel-batched — all segmentation/depth channels of
one frame are warped by that frame's flow in a single vectorized gather.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(
    img, grid_x, grid_y, align_corners: bool = True,
    padding_mode: str = "zeros",
):
    """Sample ``img`` at normalized grid coordinates.

    Args:
      img: (B, H, W, C) source.
      grid_x, grid_y: (B, Ho, Wo) normalized coords in [-1, 1]
        (x indexes width, y height — same convention as torch grid_sample).
      align_corners: True → pixel = (g+1)/2*(size-1);
        False → pixel = ((g+1)*size - 1)/2.
      padding_mode: 'zeros' (out-of-bounds corners contribute zero) or
        'border' (coordinates clamped to the edge, torch semantics).

    Returns:
      (B, Ho, Wo, C) sampled output.
    """
    B, H, W, C = img.shape
    if align_corners:
        fx = (grid_x + 1.0) * 0.5 * (W - 1)
        fy = (grid_y + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((grid_x + 1.0) * W - 1.0) * 0.5
        fy = ((grid_y + 1.0) * H - 1.0) * 0.5

    if padding_mode == "border":
        # torch clamps the *unnormalized coordinate* to [0, size-1] before
        # interpolating, so the fractional weights see clamped coords too.
        fx = jnp.clip(fx, 0.0, W - 1)
        fy = jnp.clip(fy, 0.0, H - 1)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]

    # ONE row-gather of a precomputed 2x2-patch table instead of four
    # independent take_along_axis gathers: TPU gathers are index-rate
    # bound, so 4x fewer indices with 4C contiguous values per index is
    # ~4x faster, and the zero-padded table reproduces the per-tap
    # zeros masking exactly. Row (u, v) of the table holds the 2x2
    # patch whose base tap is (y0, x0) = (u - 1, v - 1) of the
    # zero-padded image; bases outside [-1, size-1] have all four taps
    # out of bounds and are masked to zero afterwards ('zeros' mode
    # only — 'border' mode pre-clips fx/fy so bases are always valid).
    Hp, Wp = H + 1, W + 1
    P = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tbl = jnp.concatenate(
        [P[:, :Hp, :Wp], P[:, :Hp, 1:], P[:, 1:, :Wp], P[:, 1:, 1:]],
        axis=-1,
    )  # (B, H+1, W+1, 4C): taps [00, 01(x+1), 10(y+1), 11]
    u0 = jnp.clip(y0, -1, H - 1).astype(jnp.int32) + 1
    v0 = jnp.clip(x0, -1, W - 1).astype(jnp.int32) + 1
    idx = u0 * Wp + v0  # (B, Ho, Wo)
    vals = jnp.take_along_axis(
        tbl.reshape(B, Hp * Wp, 4 * C), idx.reshape(B, -1, 1), axis=1
    ).reshape(*idx.shape, 4, C)
    if padding_mode != "border":
        valid = (
            (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
        )
        vals = vals * valid[..., None, None].astype(img.dtype)
    v00, v01, v10, v11 = (vals[..., k, :] for k in range(4))

    top = v00 * (1.0 - tx) + v01 * tx
    bot = v10 * (1.0 - tx) + v11 * tx
    return top * (1.0 - ty) + bot * ty


def onehot_window_sample(vol, cx, cy, radius: int):
    """Bilinear samples of an integer-offset square window per row, as two
    one-hot MXU matmuls instead of a gather.

    The recurrent flow decoders (RAFT lookup, FFPP encode_flow_token)
    sample a (2r+1)^2 window of integer offsets around a real-valued
    center from each pixel's own cost map. XLA lowers the natural
    ``take_along_axis`` formulation to a TPU gather that costs ~13 ms per
    lookup at 240x320 RAFT scale — 98% of the model's runtime. Here the
    window is selected with WEIGHTED one-hot row/col matrices instead
    (two einsums the MXU eats, ~0.1 ms): the bilinear blend folds into
    the selection as the hat function relu(1 - |pos - center|) — weight
    (1-frac)/frac on the two straddling integers, zero elsewhere. Same
    per-tap weights as a 4-corner formulation, reassociated; the
    earlier integer-patch + corner-blend variant measured ~2x the
    einsums' own time in corner-blend op overhead inside the engine's
    unrolled iteration loop. ``Precision.HIGHEST`` keeps the f32 cost
    values near-exact through the MXU (measured deviation vs the gather
    path ~1e-5). Out-of-range rows/cols produce all-zero weights —
    exactly the ``grid_sample`` zeros-padding semantics both callers
    need.

    Args:
      vol: (N, H, W) per-row source maps (each row samples its own map).
      cx, cy: (N,) pixel-space window centers (x, y).
      radius: window radius r.

    Returns:
      (N, 2r+1, 2r+1): out[n, a, b] = bilinear sample of ``vol[n]`` at
      (x, y) = (cx[n] + a - r, cy[n] + b - r) — the x offset on the SLOW
      axis, matching the torchvision-RAFT / reference-FFPP window
      channel order (flatten the last two axes for the (2r+1)^2 layout).
    """
    import jax

    N, H, W = vol.shape
    r = radius
    K = 2 * r + 1
    # WEIGHTED one-hots: the bilinear blend folds into the selection
    # matrices as the hat function relu(1 - |pos - center|) — weight
    # (1-frac) at floor(center), frac at floor(center)+1, zero
    # elsewhere (incl. out of range = grid_sample zeros padding). Same
    # weights as the integer-patch + 4-corner-blend formulation, just
    # reassociated — and it removes the K x K corner-blend op tail,
    # which profiled at ~2x the einsums themselves inside the engine's
    # unrolled 12-iteration loop (96 tiny slice/blend ops per frame).
    ar = jnp.arange(K, dtype=jnp.float32)
    rows_c = cy[:, None] - r + ar  # (N, K) window-center y per b
    cols_c = cx[:, None] - r + ar  # (N, K) window-center x per a
    # The hats stay float32 even for bf16 volumes: rounding the bilinear
    # FRACTIONS to bf16 (~3 significant digits) would dominate the
    # sampling error, unlike the earlier exact-0/1 one-hot design. The
    # MXU takes mixed f32xbf16 operands under Precision.HIGHEST, so this
    # costs no extra pass; only the fractions' precision changes.
    Ry = jnp.maximum(
        1.0 - jnp.abs(
            rows_c[..., None] - jnp.arange(H, dtype=jnp.float32)
        ), 0.0,
    )  # (N, K, H) float32
    Cx = jnp.maximum(
        1.0 - jnp.abs(
            cols_c[..., None] - jnp.arange(W, dtype=jnp.float32)
        ), 0.0,
    )  # (N, K, W) float32
    t1 = jnp.einsum(
        "nbh,nhw->nbw", Ry, vol,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o = jnp.einsum(
        "nbw,naw->nba", t1, Cx,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, Ky, Kx)
    return o.transpose(0, 2, 1)  # x on the slow axis


def flow_warp(maps, flow, grid_hw=None, align_corners: bool = True,
              banded: bool = True):
    """Warp feature maps by optical flow (MFCNet alignment semantics).

    Equivalent to the reference's per-channel loop
    (models/multiframe_model.py:109-121) but warps all ``C`` channels at once:
    the sampling grid is ``base + flow`` where flow (in pixels) is normalized
    by (size-1)/2 before being added to the mesh grid
    (models/multiframe_model.py:156-162).

    Reference quirk preserved via ``grid_hw``: the reference builds its base
    mesh grid at a fixed 576x720 normalized to [-1, 1] over *that* size and
    then crops it to the input H, W (models/multiframe_model.py:156, 172-185).
    At 480x640 this is NOT an identity grid — zero flow samples at
    ``i*(grid-1 scaled)`` coordinates. Pass ``grid_hw=(576, 720)`` to
    reproduce the reference bit-for-bit (the MFCNet module does so by
    default); pass ``None`` for the corrected identity grid.

    Args:
      maps: (B, H, W, C) channels to warp (seg probs and/or depth).
      flow: (B, H, W, 2) optical flow in pixels; flow[..., 0] = x (width)
        displacement, flow[..., 1] = y.
      grid_hw: optional (grid_h, grid_w) the base mesh grid was built at.

    Returns:
      (B, H, W, C) warped maps.
    """
    import numpy as np

    B, H, W, _ = maps.shape
    gh, gw = (H, W) if grid_hw is None else grid_hw
    if gh < H or gw < W:
        raise ValueError(f"grid_hw {grid_hw} smaller than input {(H, W)}")
    # Base grid value at pixel (i, j): 2*j/(gw-1) - 1, 2*i/(gh-1) - 1,
    # cropped to the first H rows / W cols (identity when grid_hw == (H, W)).
    xs = 2.0 * jnp.arange(W, dtype=jnp.float32) / (gw - 1) - 1.0
    ys = 2.0 * jnp.arange(H, dtype=jnp.float32) / (gh - 1) - 1.0
    base_x = jnp.broadcast_to(xs[None, None, :], (B, H, W))
    base_y = jnp.broadcast_to(ys[None, :, None], (B, H, W))
    gx = base_x + flow[..., 0] / ((W - 1) / 2.0)
    gy = base_y + flow[..., 1] / ((H - 1) / 2.0)
    # fy(i) = i*(H-1)/(gh-1) + flow_y exactly, so the static band centers
    # are the cropped-grid row mapping and max_dy bounds |flow_y| — the
    # banded path is the fast one whenever the flow is vertically
    # bounded, with an exact gather fallback otherwise.
    if not banded:
        return grid_sample_bilinear(
            maps, gx, gy, align_corners=align_corners
        )
    centers = np.arange(H, dtype=np.float64) * (H - 1) / (gh - 1)
    return grid_sample_bilinear_banded(
        maps, gx, gy, align_corners=align_corners,
        max_dy=24, row_center=centers,
    )


def grid_sample_bilinear_banded(
    img, grid_x, grid_y, align_corners: bool = True,
    padding_mode: str = "zeros", band: int = 32, max_dy: int = 16,
    row_center=None, impl: str = "pallas",
):
    """:func:`grid_sample_bilinear` as banded one-hot MXU matmuls —
    exact, with an automatic gather fallback.

    XLA's TPU gather runs at a flat ~70M indices/s regardless of row
    width or dtype (tools/warp_probe.py), making the full-res flow warp
    the single biggest op in flow-conditioned tracking (7.1 ms/frame).
    Optical flow is vertically bounded in practice, so each band of
    ``band`` output rows samples from a static slab of source rows
    (the band's static expected centers ± ``max_dy``); within a band the
    warp is two weighted-one-hot contractions — columns as ONE MXU
    matmul against the slab, rows as a VPU 2-hot reduce — with the
    bilinear weights folded into the one-hots. Samples whose true source
    row leaves the slab would be wrong, so the whole computation guards
    with ONE scalar predicate and falls back to the gather path via
    ``lax.cond`` (out-of-image samples are zero in both paths and are
    excluded from the predicate). Zero-padding semantics come for free:
    out-of-range one-hots match nothing.

    ``row_center``: static per-output-row expected source row (length
    Ho, host floats) — the identity for a plain warp, or the reference's
    cropped 576x720 base-grid mapping (flow_warp passes it); the slab
    follows these centers, so the static grid offset does not consume
    ``max_dy`` budget.
    """
    import numpy as np

    B, H, W, C = img.shape
    Ho, Wo = grid_x.shape[1], grid_x.shape[2]
    if align_corners:
        fx = (grid_x + 1.0) * 0.5 * (W - 1)
        fy = (grid_y + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((grid_x + 1.0) * W - 1.0) * 0.5
        fy = ((grid_y + 1.0) * H - 1.0) * 0.5
    if padding_mode == "border":
        fx = jnp.clip(fx, 0.0, W - 1)
        fy = jnp.clip(fy, 0.0, H - 1)

    if row_center is None:
        row_center = np.arange(Ho, dtype=np.float64) * (
            (H - 1) / max(Ho - 1, 1)
        )
    row_center = np.asarray(row_center, np.float64)

    # ONE scalar guard: every in-image sample's source row must lie
    # within the band slab. Fully out-of-image rows are zero either way.
    c_dev = jnp.asarray(row_center, jnp.float32)[None, :, None]
    dev_ok = jnp.abs(fy - c_dev) <= (max_dy - 1)
    oob = (fy < -1.0) | (fy > float(H))
    ok = jnp.all(dev_ok | oob)

    def gather_path(img, fx_, fy_):
        del fx_, fy_
        return grid_sample_bilinear(
            img, grid_x, grid_y, align_corners=align_corners,
            padding_mode=padding_mode,
        ).astype(img.dtype)  # bf16 inputs: f32 blend weights promote

    # static slab bounds per band (python ints)
    n_bands = -(-Ho // band)
    bounds = []
    for b in range(n_bands):
        lo_r = int(np.floor(row_center[b * band] - max_dy - 1))
        hi_r = int(np.ceil(
            row_center[min((b + 1) * band, Ho) - 1] + max_dy + 2
        ))
        bounds.append((lo_r, hi_r))
    pt = max(0, -min(lo for lo, _ in bounds))
    pb = max(0, max(hi for _, hi in bounds) - H)

    def banded_path(img, fx, fy):
        # the Pallas tier lays pixels out as (band*W) tiles and assumes
        # the output grid width equals the image width; Wo != W grids
        # (legal here and in the XLA tier) route to the XLA banded path
        # instead of tripping a reshape error inside the kernel wrapper
        if impl == "pallas" and Wo == W:
            from mfcnet_tpu.ops.warp_pallas import banded_warp_pallas

            return banded_warp_pallas(
                img, fx, fy, tuple(bounds), band
            )
        dt = img.dtype
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = (fx - x0).astype(dt)
        ty = (fy - y0).astype(dt)
        xs = jnp.arange(W, dtype=jnp.float32)
        imgp = jnp.pad(img, ((0, 0), (pt, pb), (0, 0), (0, 0)))
        outs = []
        for b in range(n_bands):
            r0, r1 = b * band, min((b + 1) * band, Ho)
            nb = (r1 - r0) * Wo
            lo_r, hi_r = bounds[b]
            S = hi_r - lo_r
            slab = imgp[:, lo_r + pt : hi_r + pt]  # (B, S, W, C)
            x0b = x0[:, r0:r1].reshape(B, nb, 1)
            txb = tx[:, r0:r1].reshape(B, nb, 1)
            # columns: weighted 2-hot, one MXU matmul over the slab
            colhot = (
                (xs == x0b).astype(dt) * (1.0 - txb)
                + (xs == x0b + 1.0).astype(dt) * txb
            )  # (B, nb, W)
            slabT = slab.transpose(0, 2, 1, 3).reshape(B, W, S * C)
            tmp = jnp.einsum(
                "bnw,bwk->bnk", colhot, slabT,
                preferred_element_type=jnp.float32,
            ).reshape(B, nb, S, C)
            # rows: weighted 2-hot against the slab's ABSOLUTE row
            # numbers (padded rows are zero; out-of-range matches
            # nothing — exact zeros-padding semantics)
            abs_rows = jnp.arange(S, dtype=jnp.float32) + lo_r
            y0b = y0[:, r0:r1].reshape(B, nb, 1)
            tyb = ty[:, r0:r1].reshape(B, nb, 1)
            rowhot = (
                (abs_rows == y0b).astype(dt) * (1.0 - tyb)
                + (abs_rows == y0b + 1.0).astype(dt) * tyb
            )  # (B, nb, S)
            out_b = jnp.einsum(
                "bns,bnsc->bnc", rowhot,
                tmp.astype(dt),
                preferred_element_type=jnp.float32,
            )
            outs.append(out_b.reshape(B, r1 - r0, Wo, C).astype(dt))
        return jnp.concatenate(outs, axis=1)

    import jax

    return jax.lax.cond(ok, banded_path, gather_path, img, fx, fy)
