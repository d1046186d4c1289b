"""Space-to-depth packed convolution — MXU-lane recovery for low-channel
convs.

TPU convs contract over (kh, kw, cin) with cin laid on the 128-wide MXU
lane dimension; cin << 128 wastes most lanes (VGG stage-1: cin 3 and 64;
the MFCNet fusion head's 11x11 conv: cin 15 — measured 1-30 TFLOP/s vs
~115 TFLOP/s on well-shaped convs on v5e).

``fast_conv_same(x, kernel, bias, block=f)`` computes EXACTLY the same
SAME-padded (torch-symmetric, odd-kernel) convolution by re-expressing it
in the space-to-depth domain: x is folded (f x f spatial -> channels,
cin*f^2 lanes), the kernel is repacked once at trace time into a
(k', k', cin*f^2, cout*f^2) kernel with k' = ceil((k+f-1)/f), and the
output is unfolded back. Same dot products, different association order —
bit-differences are at float rounding level only.

Measured on v5e at 480x640 (bf16): VGG conv1_2 (3x3, 64->64) 1.39 -> ~0.4
ms with f=2; fusion-head conv1 (11x11, 15->64) 2.21 -> ~1.4 ms with f=4.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


@functools.lru_cache(maxsize=None)
def _pack_maps(kh: int, f: int):
    """Index/mask arrays mapping the logical kernel tap u to the packed
    (tap a, input phase s, output phase r) layout along one axis:
    u = f*a + s - r."""
    kp = (kh + f - 2) // f + 1
    a = np.arange(kp)[:, None, None]
    s = np.arange(f)[None, :, None]
    r = np.arange(f)[None, None, :]
    u = f * a + s - r
    valid = (u >= 0) & (u < kh)
    return np.clip(u, 0, kh - 1), valid.astype(np.float32)


def pack_kernel(kernel, f: int):
    """(kh, kw, cin, cout) -> (k'y, k'x, f*f*cin, f*f*cout), zero-filled
    where the logical tap falls outside the kernel. Pure jnp on a small
    tensor; constant-folded by XLA per compile."""
    kh, kw, cin, cout = kernel.shape
    uy, vy = _pack_maps(kh, f)
    ux, vx = _pack_maps(kw, f)
    # take along axis 0 then 1: (kyp,f,f, kxp,f,f, cin, cout)
    k1 = kernel[uy]  # (kyp, fs, fr, kw, cin, cout)
    k2 = k1[:, :, :, ux]  # (kyp, fs, fr, kxp, fs, fr, cin, cout)
    mask = (
        vy[:, :, :, None, None, None]
        * vx[None, None, None, :, :, :]
    )[..., None, None]
    k2 = k2 * mask.astype(kernel.dtype)
    # -> (kyp, kxp, sy, sx, cin, ry, rx, cout)
    k2 = k2.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    kyp, kxp = uy.shape[0], ux.shape[0]
    return k2.reshape(kyp, kxp, f * f * cin, f * f * cout)


def fast_conv_same(x, kernel, bias=None, block: int = 1):
    """SAME-padded (torch-symmetric) stride-1 conv, optionally computed in
    the space-to-depth domain. x: (B, H, W, C); kernel: (kh, kw, C, D)
    with odd kh, kw. Identical math to lax.conv_general_dilated with
    padding (k//2, k//2)."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    if block == 1:
        y = lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1),
            [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if bias is None else y + bias.astype(y.dtype)
    assert kh % 2 == 1 and kw % 2 == 1, "odd kernels only"
    f = block
    B, H, W, C = x.shape
    D = kernel.shape[-1]
    py, px = kh // 2, kw // 2
    kyp = (kh + f - 2) // f + 1
    kxp = (kw + f - 2) // f + 1
    # enough blocks to (a) cover the padded input and (b) yield
    # ceil(H/f) VALID outputs
    Hp = f * max(-(-(H + 2 * py) // f), -(-H // f) + kyp - 1)
    Wp = f * max(-(-(W + 2 * px) // f), -(-W // f) + kxp - 1)
    xp = jnp.pad(
        x, ((0, 0), (py, Hp - H - py), (px, Wp - W - px), (0, 0))
    )
    # space-to-depth: channel index = (sy*f + sx)*C + c
    xs = xp.reshape(B, Hp // f, f, Wp // f, f, C)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, Hp // f, Wp // f, f * f * C
    )
    pk = pack_kernel(kernel, f).astype(x.dtype)
    y = lax.conv_general_dilated(
        xs, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, Ho, Wo, f*f*D)
    Ho, Wo = y.shape[1], y.shape[2]
    y = y.reshape(B, Ho, Wo, f, f, D).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B, Ho * f, Wo * f, D)[:, :H, :W]
    return y if bias is None else y + bias.astype(y.dtype)


# ---------------------------------------------------------------------------
# in-domain helpers: keep a CHAIN of convs in the s2d domain (one fold at
# entry, one unfold at exit) — used by the MFCNet fusion head
# ---------------------------------------------------------------------------
def to_s2d(x, f: int):
    """(B, H, W, C) -> (B, ceil(H/f), ceil(W/f), f*f*C), zero-padded;
    block-aligned at pixel 0 (channel index = (sy*f + sx)*C + c)."""
    B, H, W, C = x.shape
    Hb, Wb = -(-H // f), -(-W // f)
    x = jnp.pad(x, ((0, 0), (0, Hb * f - H), (0, Wb * f - W), (0, 0)))
    x = x.reshape(B, Hb, f, Wb, f, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hb, Wb, f * f * C)


def from_s2d(y, f: int, H: int, W: int):
    """Inverse of :func:`to_s2d`, cropped to (H, W)."""
    B, Hb, Wb, FC = y.shape
    D = FC // (f * f)
    y = y.reshape(B, Hb, Wb, f, f, D).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, Hb * f, Wb * f, D)[:, :H, :W]


@functools.lru_cache(maxsize=None)
def _pack_maps_indomain(kh: int, f: int):
    """Tap maps for a SAME conv whose input AND output are s2d-aligned at
    pixel 0: u = f*(a - L) + s - r + p, L = ceil(p/f)."""
    p = kh // 2
    L = -(-p // f)
    amax = (f - 1 + kh - 1 - p) // f + L
    kp = amax + 1
    a = np.arange(kp)[:, None, None]
    s = np.arange(f)[None, :, None]
    r = np.arange(f)[None, None, :]
    u = f * (a - L) + s - r + p
    valid = (u >= 0) & (u < kh)
    return np.clip(u, 0, kh - 1), valid.astype(np.float32), L


def pack_kernel_indomain(kernel, f: int):
    """(kh, kw, cin, cout) -> (kp, kp, f*f*cin, f*f*cout) for in-domain
    SAME conv; returns (packed, (Ly, Lx)) with L left-pad blocks per axis."""
    kh, kw, cin, cout = kernel.shape
    uy, vy, Ly = _pack_maps_indomain(kh, f)
    ux, vx, Lx = _pack_maps_indomain(kw, f)
    k1 = kernel[uy]
    k2 = k1[:, :, :, ux]
    mask = (
        vy[:, :, :, None, None, None] * vx[None, None, None, :, :, :]
    )[..., None, None]
    k2 = (k2 * mask.astype(kernel.dtype)).transpose(0, 3, 1, 4, 6, 2, 5, 7)
    kyp, kxp = uy.shape[0], ux.shape[0]
    return (
        k2.reshape(kyp, kxp, f * f * cin, f * f * cout),
        (Ly, Lx),
    )


def s2d_via_conv(x, f: int):
    """:func:`to_s2d` computed as a one-hot stride-f convolution — the MXU
    performs the layout change (the reshape-transpose path costs ~1 ms for
    a 9 MB tensor on v5e; this is ~3x cheaper). Bit-exact (copies)."""
    B, H, W, C = x.shape
    Hb, Wb = -(-H // f), -(-W // f)
    if Hb * f != H or Wb * f != W:
        x = jnp.pad(x, ((0, 0), (0, Hb * f - H), (0, Wb * f - W), (0, 0)))
    K = np.zeros((f, f, C, f * f * C), np.float32)
    for sy in range(f):
        for sx in range(f):
            for c in range(C):
                K[sy, sx, c, (sy * f + sx) * C + c] = 1.0
    return lax.conv_general_dilated(
        x, jnp.asarray(K, x.dtype), (f, f), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_s2d_indomain(xs, kernel, f: int, cin_perm=None):
    """SAME conv on s2d-aligned blocks, staying in the s2d domain.
    xs: (B, Hb, Wb, f*f*cin); kernel: logical (kh, kw, cin, cout).

    ``cin_perm``: optional permutation mapping xs's channel index to the
    standard packed layout ((sy*f+sx)*cin + c) — lets callers feed buffers
    stored in a different channel order (e.g. the tracker's per-frame
    (t, (s, c)) ring buffer) without a transpose."""
    pk, (Ly, Lx) = pack_kernel_indomain(kernel, f)
    if cin_perm is not None:
        # cin_perm must be a static python tuple (flax module boundaries
        # can convert ndarray args to tracers); index with a concrete array
        pk = pk[:, :, np.asarray(cin_perm, np.int32)]
    pk = pk.astype(xs.dtype)
    kyp, kxp = pk.shape[0], pk.shape[1]
    xs = jnp.pad(
        xs,
        ((0, 0), (Ly, kyp - 1 - Ly), (Lx, kxp - 1 - Lx), (0, 0)),
    )
    return lax.conv_general_dilated(
        xs, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.lru_cache(maxsize=None)
def _s2d_valid_mask(Hb: int, Wb: int, f: int, H: int, W: int):
    """(Hb, Wb, f*f) 0/1 mask of pixels < (H, W) — zeroes the padding
    pixels inside the trailing blocks so chained convs see true zeros."""
    ys = np.arange(Hb * f).reshape(Hb, f)
    xs = np.arange(Wb * f).reshape(Wb, f)
    my = (ys < H).astype(np.float32)  # (Hb, f)
    mx = (xs < W).astype(np.float32)  # (Wb, f)
    m = my[:, None, :, None] * mx[None, :, None, :]  # (Hb, Wb, f, f)
    return m.reshape(Hb, Wb, f * f)


def mask_s2d_padding(xs, f: int, H: int, W: int):
    """Zero out-of-image pixels of an s2d tensor (no-op when f | H, W)."""
    if H % f == 0 and W % f == 0:
        return xs
    B, Hb, Wb, FC = xs.shape
    C = FC // (f * f)
    m = jnp.asarray(_s2d_valid_mask(Hb, Wb, f, H, W), xs.dtype)
    return (xs.reshape(B, Hb, Wb, f * f, C) * m[..., None]).reshape(
        B, Hb, Wb, FC
    )


class FastConv(nn.Module):
    """Drop-in for nn.Conv (stride-1, SAME, odd kernel) computed via
    :func:`fast_conv_same`. Param names/shapes ('kernel' HWIO + optional
    'bias') match nn.Conv exactly, so checkpoint converters and existing
    trees are unaffected — give it the same explicit ``name`` the nn.Conv
    had (e.g. name='Conv_0')."""

    features: int
    kernel_size: tuple
    block: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return fast_conv_same(x, kernel, bias, self.block)
