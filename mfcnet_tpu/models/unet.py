"""Plain UNet (reference: models/unet.py:6-64).

The reference decoder uses MaxUnpool2d fed by pooling *indices it never
stores* — its UpConv calls ``self.unpool(x)`` without indices, which errors
at runtime; the model is registered here for surface parity
(BASELINE.json config 1 names a single-frame UNet) with the unpool realized
as the standard nearest 2x upsample (the TPU-friendly equivalent that keeps
the same channel plan). Emits raw logits.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mfcnet_tpu.models.common import max_pool_2x
from mfcnet_tpu.ops.resize import resize_nearest


class UNetBlock(nn.Module):
    """Conv3x3 + BN + ReLU (reference: models/unet.py:6-17)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(x)
        return nn.relu(x)


class UpConv(nn.Module):
    """Unpool(2x) -> Conv3x3 -> concat skip -> UNetBlock
    (reference: models/unet.py:19-31)."""

    features: int

    @nn.compact
    def __call__(self, x, x_enc, train: bool = False):
        x = resize_nearest(x, x.shape[-3] * 2, x.shape[-2] * 2)
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = jnp.concatenate([x, x_enc], axis=-1)
        return UNetBlock(self.features)(x, train=train)


class UNet(nn.Module):
    """reference: models/unet.py:33-64. ``dims`` shrinkable for tests."""

    output_channels: int
    dims: tuple = (64, 128, 256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dims
        x1 = UNetBlock(d[0])(x, train=train)
        x2 = UNetBlock(d[1])(max_pool_2x(x1), train=train)
        x3 = UNetBlock(d[2])(max_pool_2x(x2), train=train)
        x4 = UNetBlock(d[3])(max_pool_2x(x3), train=train)
        x5 = UNetBlock(d[4])(max_pool_2x(x4), train=train)
        y = UNetBlock(d[5])(max_pool_2x(x5), train=train)
        y = UpConv(d[4])(y, x5, train=train)
        y = UpConv(d[3])(y, x4, train=train)
        y = UpConv(d[2])(y, x3, train=train)
        y = UpConv(d[1])(y, x2, train=train)
        y = UpConv(d[0])(y, x1, train=train)
        return nn.Conv(self.output_channels, (1, 1))(y)
