"""ResUNet — diffusion-style residual U-Net (reference: models/resunet.py).

Weight-standardized 3x3 convs + GroupNorm + SiLU ResNet blocks,
pixel-unshuffle downsampling, nearest-2x upsampling. Emits raw logits.
The pixel-unshuffle is a pure reshape/transpose (free on TPU); the
weight standardization is computed on the fly from the conv kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mfcnet_tpu.ops.resize import resize_nearest


class WSConv(nn.Module):
    """Weight-standardized Conv2d (reference: models/resunet.py:51-64)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        # standardize per output channel (torch: over in, kh, kw per out)
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) * jax.lax.rsqrt(var + eps)
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            (1, 1),
            [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(x.dtype)


class ResBlock(nn.Module):
    """Two WSConv+GN+SiLU blocks with a 1x1 residual
    (reference: models/resunet.py:68-96)."""

    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        h = WSConv(self.features)(x)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(h)
        h = nn.silu(h)
        h = WSConv(self.features)(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(h)
        h = nn.silu(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1))(x)
        return h + x


def _pixel_unshuffle(x):
    """(B, 2h, 2w, C) -> (B, h, w, 4C) with torch Rearrange channel order
    'b c (h p1) (w p2) -> b (c p1 p2) h w': output channel = c*4 + p1*2 + p2
    (matters only for weight conversion; a 1x1 conv follows either way)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, h, w, C, p1, p2)
    return x.reshape(B, H // 2, W // 2, 4 * C)


class ResUNetVB(nn.Module):
    """reference: models/resunet.py:97-180
    (ResUnet_VB(channels, dim, out_dim, dim_mults, groups))."""

    out_channels: int
    dim: int = 16
    dim_mults: tuple = (1, 2, 4, 8)
    groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        x = nn.Conv(dims[0], (7, 7), padding="SAME", name="init_conv")(x)
        r = x
        skips = []
        for i, (d_in, d_out) in enumerate(in_out):
            last = i == len(in_out) - 1
            x = ResBlock(d_in, self.groups)(x)
            skips.append(x)
            if not last:
                x = _pixel_unshuffle(x)
                x = nn.Conv(d_out, (1, 1))(x)
            else:
                x = nn.Conv(d_out, (3, 3), padding="SAME")(x)

        x = ResBlock(dims[-1], self.groups)(x)

        for i, (d_in, d_out) in enumerate(reversed(in_out)):
            last = i == len(in_out) - 1
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResBlock(d_out, self.groups)(x)
            if not last:
                x = resize_nearest(x, x.shape[-3] * 2, x.shape[-2] * 2)
                x = nn.Conv(d_in, (3, 3), padding="SAME")(x)
            else:
                x = nn.Conv(d_in, (3, 3), padding="SAME")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResBlock(self.dim, self.groups)(x)
        return nn.Conv(self.out_channels, (1, 1), name="output_layer")(x)
