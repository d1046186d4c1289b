"""RAFT optical flow (raft_large architecture) in Flax.

The reference uses torchvision's ``raft_large(pretrained=True)`` as its
default frozen flow provider (configs/config_multiframe.py:75; loaded at
scripts/train_multiframe_detection.py:77-83). This is a TPU-native
reimplementation of that architecture: residual feature/context encoders
(instance/batch norm), an all-pairs correlation pyramid, and a recurrent
SepConvGRU update loop with convex upsampling.

TPU-first notes:
  * The all-pairs correlation volume is one big batched matmul
    (B, H*W, C) @ (B, C, H*W) on the MXU.
  * Pyramid lookups sample a 10x10 integer patch per pixel with two 0/1
    one-hot einsums on the MXU (ops/warp.py::onehot_window_sample) — XLA
    lowers the naive take_along_axis to a ~13.5 ms gather per lookup.
  * The update loop is a Python loop unrolled into one jit: XLA's DCE
    drops the 11 dead convex-upsample/mask heads (only the last
    iteration's upsampled flow is returned), which a lax.scan could not.
  * Per-image encoders are separate methods so video engines can cache
    ``features`` across frames (flow_from_feature_ring).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    norm: str = "instance"  # 'instance' | 'batch' | 'none'

    def _norm(self, x, train):
        if self.norm == "instance":
            return _instance_norm(x)
        if self.norm == "batch":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        st = self.stride
        y = nn.Conv(self.features, (3, 3), (st, st),
                    padding=((1, 1), (1, 1)))(x)
        y = nn.relu(self._norm(y, train))
        y = nn.Conv(self.features, (3, 3), padding="SAME")(y)
        y = nn.relu(self._norm(y, train))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1),
                        (self.stride, self.stride))(x)
            x = self._norm(x, train)
        return nn.relu(x + y)


class RAFTEncoder(nn.Module):
    """Feature (instance-norm) or context (batch-norm) encoder; output
    stride 8, ``out_features`` channels."""

    out_features: int = 256
    norm: str = "instance"
    widths: Tuple[int, int, int] = (64, 96, 128)

    @nn.compact
    def __call__(self, x, train: bool = False):
        w0 = self.widths[0]
        x = nn.Conv(w0, (7, 7), (2, 2), padding=((3, 3), (3, 3)))(x)
        if self.norm == "instance":
            x = _instance_norm(x)
        elif self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
        x = nn.relu(x)
        for i, w in enumerate(self.widths):
            stride = 1 if i == 0 else 2
            x = ResidualBlock(w, stride, self.norm)(x, train=train)
            x = ResidualBlock(w, 1, self.norm)(x, train=train)
        return nn.Conv(self.out_features, (1, 1))(x)


def all_pairs_correlation(f1, f2):
    """(B, H, W, C) x2 -> (B, H*W, H, W) correlation / sqrt(C)."""
    B, H, W, C = f1.shape
    a = f1.reshape(B, H * W, C)
    b = f2.reshape(B, H * W, C)
    corr = jnp.einsum(
        "bnc,bmc->bnm", a, b, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(C))
    return corr.reshape(B, H * W, H, W)


def _avg_pool2(x):
    """2x2/stride-2 avg pool on the last two axes of (B, N, H, W).

    Matches torch ``F.avg_pool2d(kernel=2, stride=2)``: output floor(H/2) —
    an odd trailing row/col is dropped (e.g. the 15x20 level-3 volume at
    480x640 input)."""
    B, N, H, W = x.shape
    H2, W2 = H // 2, W // 2
    x = x[:, :, : H2 * 2, : W2 * 2].reshape(B, N, H2, 2, W2, 2)
    return x.mean(axis=(3, 5))


def build_corr_pyramid(f1, f2, num_levels: int = 4):
    corr = all_pairs_correlation(f1, f2)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        if pyramid[-1].shape[-2] < 2 or pyramid[-1].shape[-1] < 2:
            break  # tiny inputs: stop before a zero-sized level
        pyramid.append(_avg_pool2(pyramid[-1]))
    return pyramid


def build_blocked_pyramid(pyramid):
    """Pack the correlation pyramid into ONE block-diagonal volume for
    :func:`lookup_corr_blocked`.

    The per-level lookup einsums are op-overhead bound at tracker scale
    (~4.6 ms/frame in-engine for 12 iterations x 4 levels x 2 einsums +
    per-level slicing, vs ~0.05 ms of FLOPs). Packing level l's
    (B, N, Hl, Wl) maps into the (offH_l, offW_l) diagonal block of a
    (B*N, sum_H, sum_W) volume lets ALL levels run as one einsum pair
    per iteration: level-l window one-hots only touch level-l rows/cols,
    so cross-level products are exactly zero. Built once per solve (the
    pyramid is iteration-invariant); iterations pay two einsums total.

    MEASURED NEGATIVE at tracker scale (240x320 half-res, B=2): the
    blocked lookup's 10x padded FLOPs + full-volume HBM reads per
    iteration cost more than the per-level op overhead they save —
    flow-conditioned e2e regressed 42.1 -> 40.0 fps/chip when wired into
    the solve loops, so they use the per-level :func:`lookup_corr`.
    Kept (with its parity test) for larger batch counts, where the
    op-overhead share grows.

    Returns (bd, offsets) with offsets = tuple of (offH, offW, Hl, Wl).
    """
    B = pyramid[0].shape[0]
    n = B * pyramid[0].shape[1]
    offs = []
    oh = ow = 0
    for corr in pyramid:
        Hl, Wl = corr.shape[-2], corr.shape[-1]
        offs.append((oh, ow, Hl, Wl))
        oh += Hl
        ow += Wl
    bd = jnp.zeros((n, oh, ow), pyramid[0].dtype)
    for corr, (o_h, o_w, Hl, Wl) in zip(pyramid, offs):
        bd = bd.at[:, o_h : o_h + Hl, o_w : o_w + Wl].set(
            corr.reshape(n, Hl, Wl)
        )
    return bd, tuple(offs)


def lookup_corr_blocked(bd, offsets, coords, radius: int = 4):
    """:func:`lookup_corr` over a :func:`build_blocked_pyramid` volume —
    identical output channels, one einsum pair for all levels.

    The window selection matrices are bilinear HAT weights
    (relu(1 - |pos - center|)): weight (1-frac)/frac on the two
    straddling integers, zero elsewhere including out of range — the
    same per-tap weights as the 4-corner formulation, reassociated
    (grid_sample zeros-padding semantics preserved).
    """
    import jax

    B, H, W, _ = coords.shape
    K = 2 * radius + 1
    L = len(offsets)
    n = B * H * W
    flat = coords.reshape(n, 2)
    sumH = bd.shape[1]
    sumW = bd.shape[2]
    ar = jnp.arange(K, dtype=jnp.float32) - radius

    ry_blocks, cx_blocks = [], []
    for lvl, (o_h, o_w, Hl, Wl) in enumerate(offsets):
        c = flat / (2.0**lvl)
        rows_c = c[:, 1:2] + ar  # (n, K) window-center y per b
        cols_c = c[:, 0:1] + ar
        # hats against the level's ABSOLUTE block rows/cols
        hrows = jnp.arange(Hl, dtype=jnp.float32)
        hcols = jnp.arange(Wl, dtype=jnp.float32)
        ry = jnp.maximum(1.0 - jnp.abs(rows_c[..., None] - hrows), 0.0)
        cxm = jnp.maximum(1.0 - jnp.abs(cols_c[..., None] - hcols), 0.0)
        ry_blocks.append(jnp.pad(
            ry, ((0, 0), (0, 0), (o_h, sumH - o_h - Hl))
        ))
        cx_blocks.append(jnp.pad(
            cxm, ((0, 0), (0, 0), (o_w, sumW - o_w - Wl))
        ))
    Ry = jnp.concatenate(ry_blocks, axis=1).astype(bd.dtype)  # (n,LK,sumH)
    Cx = jnp.concatenate(cx_blocks, axis=1).astype(bd.dtype)  # (n,LK,sumW)

    t1 = jnp.einsum(
        "nbh,nhw->nbw", Ry, bd,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o = jnp.einsum(
        "nbw,naw->nba", t1, Cx,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (n, L*K [y], L*K [x]); off-diagonal level blocks are exactly 0
    out = []
    for lvl in range(L):
        blk = o[:, lvl * K : (lvl + 1) * K, lvl * K : (lvl + 1) * K]
        # x on the slow axis (torchvision channel order), like
        # onehot_window_sample
        out.append(blk.transpose(0, 2, 1).reshape(B, H, W, K * K))
    return jnp.concatenate(out, axis=-1)


def build_patch_pyramid(pyramid, grid_hw, radius: int = 4):
    """Per-token static correlation patches — the iteration-invariant
    half of the lookup, built ONCE per solve.

    Key observation (round 5): every token's lookup window is centered
    at ITS OWN grid position plus the current flow estimate, and for
    video tracking the 1/8-resolution flow displacement is sub-pixel
    per level (|flow_fullres| < 8 px covers level 0; coarser levels are
    even tighter). So the (2r+1)^2 window always lies inside a STATIC
    (2r+3)^2 patch around the token's own position — extractable from
    the cost volume with static slices (no gather: XLA's TPU gather is
    index-rate bound, and the per-level hat-einsum formulation this
    replaces paid ~4.6 ms/frame of op overhead for 96 tiny batched
    matmuls per solve). Each iteration then reduces to a few masked VPU
    shift-blends inside these patches (:func:`lookup_corr_patches`),
    with an exact whole-solve ``lax.cond`` fallback to the einsum path
    when any displacement leaves its patch.

    Args:
      pyramid: list of (B, N, Hl, Wl) correlation volumes
        (:func:`build_corr_pyramid`), N = H*W tokens of the 1/8 grid.
      grid_hw: (H, W) of the token grid.

    Returns:
      list of (B, N, P, P) patches, P = 2*radius + 4; patch (dy, dx)
      holds vol[token, floor(i/2^l) + dy - r - 1,
      floor(j/2^l) + dx - r - 1] with zeros outside the volume (the
      window sampler's zeros-padding semantics). P covers the K-tap
      window for integer center shifts in {-1, 0, 1} plus the bilinear
      +1 neighbor: indices b + 1 + shift + {0, 1} for b in 0..K-1.
    """
    H, W = grid_hw
    r = radius
    P = 2 * r + 4
    m = r + 1  # patch margin above/left of the token's own position
    patches = []
    for lvl, corr in enumerate(pyramid):
        B, N, Hl, Wl = corr.shape
        assert N == H * W, (N, H, W)
        # bottom/right margin m+2: floor(i/2^l) overshoots the
        # floor-halved Hl by up to 1, and the patch extends r+2 below
        padded = jnp.pad(
            corr, ((0, 0), (0, 0), (m, m + 2), (m, m + 2))
        )
        v = padded.reshape(B, H, W, Hl + P, Wl + P)
        # static row shear: token row i reads pooled rows
        # floor(i/2^l)-m .. +m  (P rows starting at floor(i/2^l))
        rows = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    v[:, i : i + 1], (i >> lvl), (i >> lvl) + P, axis=3
                )
                for i in range(H)
            ],
            axis=1,
        )  # (B, H, W, P, Wl+P)
        # static column shear per token column j
        cols = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    rows[:, :, j : j + 1], (j >> lvl), (j >> lvl) + P,
                    axis=4,
                )
                for j in range(W)
            ],
            axis=2,
        )  # (B, H, W, P, P)
        patches.append(cols.reshape(B, N, P, P))
    return patches


def lookup_corr_patches(patches, pyramid, coords, radius: int = 4):
    """:func:`lookup_corr` from per-token static patches
    (:func:`build_patch_pyramid`) — identical output (same channel
    order, same zeros padding, bilinear weights exact in f32), at a few
    masked VPU shift-blends per level instead of two batched hat
    einsums. Falls back to :func:`lookup_corr` via ONE whole-solve
    ``lax.cond`` when any token's displacement leaves its patch
    (|center - own position| >= 2 at that level — e.g. fast motion at
    level 0), so outputs are exact for every input.
    """
    B, H, W, _ = coords.shape
    K = 2 * radius + 1
    n = B * H * W
    flat = coords.reshape(n, 2)
    jj, ii = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32),
        jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    jj = jnp.tile(jj.reshape(1, H * W), (B, 1)).reshape(n)
    ii = jnp.tile(ii.reshape(1, H * W), (B, 1)).reshape(n)

    def patch_path(_):
        outs = []
        for lvl, pat in enumerate(patches):
            Pn = pat.reshape(n, *pat.shape[2:])
            scale = 1.0 / (2.0 ** lvl)
            # offset of the window center from the patch origin row/col
            u = flat[:, 0] * scale - jnp.floor(jj * scale)  # x
            v = flat[:, 1] * scale - jnp.floor(ii * scale)  # y
            fu = jnp.floor(u)
            fv = jnp.floor(v)
            ax = (u - fu)[:, None, None]
            ay = (v - fv)[:, None, None]

            # columns: blend the two straddling taps, selected among
            # the 3 possible integer shifts by a per-token mask
            X = 0.0
            for s in (-1, 0, 1):
                ms = (fu == s).astype(Pn.dtype)[:, None, None]
                X = X + ms * (
                    (1.0 - ax) * Pn[:, :, 1 + s : 1 + s + K]
                    + ax * Pn[:, :, 2 + s : 2 + s + K]
                )
            Y = 0.0
            for s in (-1, 0, 1):
                ms = (fv == s).astype(Pn.dtype)[:, None, None]
                Y = Y + ms * (
                    (1.0 - ay) * X[:, 1 + s : 1 + s + K]
                    + ay * X[:, 2 + s : 2 + s + K]
                )
            # (n, Ky, Kx) -> x on the slow axis (torchvision order)
            outs.append(
                Y.transpose(0, 2, 1).reshape(B, H, W, K * K)
            )
        return jnp.concatenate(outs, axis=-1)

    def einsum_path(_):
        return lookup_corr(pyramid, coords, radius)

    ok = jnp.bool_(True)
    for lvl in range(len(patches)):
        scale = 1.0 / (2.0 ** lvl)
        u = flat[:, 0] * scale - jnp.floor(jj * scale)
        v = flat[:, 1] * scale - jnp.floor(ii * scale)
        ok = ok & jnp.all(
            (jnp.floor(u) >= -1) & (jnp.floor(u) <= 1)
            & (jnp.floor(v) >= -1) & (jnp.floor(v) <= 1)
        )
    return jax.lax.cond(ok, patch_path, einsum_path, 0)


def lookup_corr(pyramid, coords, radius: int = 4):
    """Sample each pyramid level in a (2r+1)^2 window around ``coords``.

    coords: (B, H, W, 2) flow-displaced pixel coords at 1/8 res (x, y).
    Returns (B, H, W, num_levels*(2r+1)^2).

    torchvision channel ordering: delta = meshgrid(di, dj, indexing='ij')
    added to (x, y) coords -> channel k = a*(2r+1)+b samples offset
    (dx=di[a], dy=dj[b]): the x offset varies SLOW, y FAST — which is
    exactly ``onehot_window_sample``'s layout, so pretrained convc1
    weights convert without permutation. The one-hot-matmul sampler
    replaces a take_along_axis gather that cost ~13.5 ms/lookup at
    240x320 (98% of RAFT's runtime; 12 lookups 164 ms -> 4 ms, values
    within ~8e-6, zeros padding identical).
    """
    from mfcnet_tpu.ops.warp import onehot_window_sample

    B, H, W, _ = coords.shape
    K = 2 * radius + 1
    n = B * H * W
    flat = coords.reshape(n, 2)
    out = []
    for lvl, corr in enumerate(pyramid):
        Hl, Wl = corr.shape[-2], corr.shape[-1]
        c = flat / (2.0**lvl)
        o = onehot_window_sample(
            corr.reshape(n, Hl, Wl), c[:, 0], c[:, 1], radius
        )
        out.append(o.reshape(B, H, W, K * K))
    return jnp.concatenate(out, axis=-1)


class MotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding="SAME", name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding="SAME", name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding="SAME", name="convf2")(f))
        y = jnp.concatenate([c, f], axis=-1)
        y = nn.relu(nn.Conv(126, (3, 3), padding="SAME", name="conv")(y))
        return jnp.concatenate([y, flow], axis=-1)  # 128


class SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        for name, ksize in (("h", (1, 5)), ("v", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(
                nn.Conv(self.hidden, ksize, padding="SAME",
                        name=f"convz_{name}")(hx)
            )
            r = nn.sigmoid(
                nn.Conv(self.hidden, ksize, padding="SAME",
                        name=f"convr_{name}")(hx)
            )
            q = jnp.tanh(
                nn.Conv(self.hidden, ksize, padding="SAME",
                        name=f"convq_{name}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class UpdateBlock(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = MotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden, name="gru")(net, x)
        f = nn.relu(
            nn.Conv(256, (3, 3), padding="SAME", name="flow1")(net)
        )
        delta = nn.Conv(2, (3, 3), padding="SAME", name="flow2")(f)
        m = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="mask1")(net))
        mask = nn.Conv(8 * 8 * 9, (1, 1), name="mask2")(m) * 0.25
        return net, delta, mask


def convex_upsample(flow, mask):
    """8x convex upsampling: softmax-combine the 3x3 neighborhood.

    flow: (B, H, W, 2) at 1/8 res; mask: (B, H, W, 576).

    Channel layout of the mask matches torchvision's
    ``up_mask.view(B, 1, 9, 8, 8, h, w)``: neighbor index is the MAJOR
    axis (channel = n*64 + u*8 + v), so pretrained mask-predictor weights
    convert without permutation.
    """
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=-3)
    # 3x3 neighborhood of 8*flow (row-major dy, dx — torch F.unfold order)
    f = 8.0 * flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [
            fp[:, dy : dy + H, dx : dx + W]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-2,
    )  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwnuv,bhwnc->bhwuvc", m, neigh)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B, H, 8, W, 8, 2)
    return up.reshape(B, H * 8, W * 8, 2)


class RAFT(nn.Module):
    """raft_large. __call__ returns the final upsampled flow (B, H, W, 2)
    in pixels (the reference takes ``model(...)[-1]``, src/engine.py:49).

    The per-image encoders and the recurrent flow solve are exposed as
    separate methods so a video engine can CACHE ``features`` across
    frames (the reference pairs the current frame with each previous
    one, so a previous frame's fnet features are recomputed T-1 extra
    times per frame in the stateless formulation; see
    track/outputs.py::flow_from_feature_ring). ``__call__`` composes
    the same methods — one definition of the math."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    # run the 12 update iterations through the fused Pallas kernel
    # (ops/raft_update_pallas.py) instead of XLA convs. The XLA lowering
    # is relayout-bound at 1/8-res tracker sizes (~0.53 ms/iter vs the
    # kernel's matmul floor); outputs agree to ``fused_dtype`` matmul
    # precision (f32: ~1e-4; bfloat16: sub-pixel flow drift — the
    # engine's product envelope, pinned in tests/test_flow.py).
    fused_update: bool = False
    fused_dtype: str = "bfloat16"

    def setup(self):
        self.fnet = RAFTEncoder(256, "instance")
        self.cnet = RAFTEncoder(256, "batch")
        self.update_block = UpdateBlock()

    def features(self, image):
        """(B, H, W, 3) -> (B, H/8, W/8, 256) correlation features."""
        return self.fnet(image, train=False)

    def context(self, image):
        """(B, H, W, 3) -> (net0, inp): GRU init state + context feed."""
        ctx = self.cnet(image, train=False)
        return jnp.tanh(ctx[..., :128]), nn.relu(ctx[..., 128:])

    def flow_from_features(self, f1, f2, net, inp):
        """Recurrent flow solve from precomputed per-image encoders:
        f1/f2 = ``features`` of image1/image2, (net, inp) = ``context``
        of image1. Returns the upsampled flow (B, H, W, 2) in pixels."""
        if self.fused_update and not self.is_initializing():
            import jax.numpy as _jnp

            from mfcnet_tpu.ops.raft_update_pallas import (
                fused_flow_from_features,
            )

            return fused_flow_from_features(
                {"params": self.variables["params"]}, f1, f2, net, inp,
                iters=self.iters, corr_levels=self.corr_levels,
                corr_radius=self.corr_radius,
                compute_dtype=_jnp.dtype(self.fused_dtype).type,
            )
        pyramid = build_corr_pyramid(f1, f2, self.corr_levels)
        patches = build_patch_pyramid(
            pyramid, f1.shape[1:3], self.corr_radius
        )
        B, H8, W8, _ = f1.shape
        xs = jnp.arange(W8, dtype=jnp.float32)
        ys = jnp.arange(H8, dtype=jnp.float32)
        coords0 = jnp.stack(
            jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
        )[None].repeat(B, axis=0)

        flow = jnp.zeros((B, H8, W8, 2), jnp.float32)
        up_flow = None
        for _ in range(self.iters):
            corr = lookup_corr_patches(
                patches, pyramid, coords0 + flow, self.corr_radius
            )
            net, delta, mask = self.update_block(net, inp, corr, flow)
            flow = flow + delta
            up_flow = convex_upsample(flow, mask)
        return up_flow

    def __call__(self, image1, image2, train: bool = False):
        """Images: (B, H, W, 3) normalized to [-1, 1] by the caller contract
        of torchvision RAFT (the engine wrapper handles scaling)."""
        f1 = self.features(image1)
        f2 = self.features(image2)
        net, inp = self.context(image1)
        return self.flow_from_features(f1, f2, net, inp)


def make_raft_flow_fn(
    basic: bool = True,
    iters: int = 12,
    variables=None,
    rng=None,
    input_hw=(64, 64),
    fused_update: bool = False,
):
    """Jittable (B, T, H, W, 3)-frames -> (B, T-1, H, W, 2) flow provider.

    Mirrors src/engine.py:39-53: flow computed between each frame i>=1 and
    frame 0; 'Basic' MFC variants use flow(frame_i, frame_0). Frames arrive
    ImageNet-normalized; RAFT expects [-1, 1], so they are denormalized
    first (the reference feeds normalized frames straight into RAFT —
    quirk preserved? No: the reference passes the ImageNet-normalized
    tensors directly to RAFT (src/engine.py:41-49), so we do the same).

    ``fused_update``: run the recurrent iterations through the fused
    Pallas update kernel (ops/raft_update_pallas.py, bf16 envelope —
    pass only for bf16 compute). The provider is FROZEN in the train
    step (no gradient path reaches it: frames are data, not params), so
    the kernel's missing VJP never matters there.
    """
    import numpy as np

    model = RAFT(iters=iters, fused_update=fused_update)
    if variables is None:
        import jax as _jax

        from mfcnet_tpu.utils.jitinit import jit_init

        rng = rng if rng is not None else _jax.random.PRNGKey(0)
        # init at the working resolution: the correlation pyramid depth (and
        # hence the motion encoder's input channels) is clamped for small
        # inputs, so params are size-dependent below 64x64 at 1/8 scale
        dummy = np.zeros((1, *input_hw, 3), np.float32)
        variables = jit_init(model, rng, dummy, dummy)

    def flow_fn(frames):
        """All T-1 pairs as ONE batched recurrent solve, the shared
        frame-0 encoders computed once (they were recomputed per pair in
        the naive per-pair loop; every op is per-sample at eval, so the
        result equals the loop to float-reassociation level — pinned in
        tests/test_flow.py)."""
        from mfcnet_tpu.ops.pairs import repeat_for_pairs

        B, T, H, W, _ = frames.shape
        f0 = frames[:, 0]
        rest = frames[:, 1:].reshape((B * (T - 1), H, W, 3))

        def rep(v):
            return repeat_for_pairs(v, T - 1)

        f0_feat = model.apply(variables, f0, method="features")
        rest_feat = model.apply(variables, rest, method="features")
        if basic:  # image1 = frame_i, image2 = frame_0
            f1, f2 = rest_feat, rep(f0_feat)
            net, inp = model.apply(variables, rest, method="context")
        else:  # image1 = frame_0, image2 = frame_i
            f1, f2 = rep(f0_feat), rest_feat
            net0, inp0 = model.apply(variables, f0, method="context")
            net, inp = rep(net0), rep(inp0)
        fl = model.apply(
            variables, f1, f2, net, inp, method="flow_from_features"
        )
        return fl.reshape((B, T - 1, H, W, 2))

    return flow_fn
