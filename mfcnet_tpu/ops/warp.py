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
    lookup at 240x320 RAFT scale — 98% of the model's runtime. Because
    the window offsets are integers, all (2r+1)^2 samples share ONE pair
    of bilinear fractions, so a (2r+2)^2 integer patch fully determines
    the window; the patch is selected with 0/1 one-hot row/col matrices
    (two tiny einsums the MXU eats, ~0.1 ms). ``Precision.HIGHEST``
    keeps the f32 cost values exact through the bf16-multiply MXU path
    (one-hot weights are exactly representable; measured max deviation
    vs the gather path ~8e-6 from f32-synthesis rounding). Out-of-range
    rows/cols produce all-zero one-hots — exactly the ``grid_sample``
    zeros-padding semantics both callers need.

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
    P = 2 * r + 2  # integer patch side (window + 1 for bilinear)
    K = 2 * r + 1
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    tx = (cx - x0)[:, None, None]
    ty = (cy - y0)[:, None, None]
    ar = jnp.arange(P, dtype=jnp.float32)
    rows = y0[:, None] - r + ar  # (N, P)
    cols = x0[:, None] - r + ar
    onehot_rows = (
        rows[..., None] == jnp.arange(H, dtype=jnp.float32)
    ).astype(vol.dtype)  # (N, P, H)
    onehot_cols = (
        cols[..., None] == jnp.arange(W, dtype=jnp.float32)
    ).astype(vol.dtype)  # (N, P, W)
    patch = jnp.einsum(
        "nph,nhw->npw", onehot_rows, vol,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    patch = jnp.einsum(
        "npw,nqw->npq", patch, onehot_cols,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, P, P): [y index, x index]
    v00 = patch[:, :K, :K]
    v01 = patch[:, :K, 1:]   # x + 1
    v10 = patch[:, 1:, :K]   # y + 1
    v11 = patch[:, 1:, 1:]
    top = v00 * (1.0 - tx) + v01 * tx
    bot = v10 * (1.0 - tx) + v11 * tx
    o = top * (1.0 - ty) + bot * ty  # (N, Ky, Kx)
    return o.transpose(0, 2, 1)  # x on the slow axis


def flow_warp(maps, flow, grid_hw=None, align_corners: bool = True):
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
    return grid_sample_bilinear(maps, gx, gy, align_corners=align_corners)
