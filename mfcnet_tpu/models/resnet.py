"""ResNet-101 dilated backbone for DeepLabV3/FCN heads.

Behavioral equivalent of torchvision's ``resnet101`` with
``replace_stride_with_dilation=[False, True, True]`` (output stride 8), as
constructed by ``deeplabv3_resnet101`` / ``fcn_resnet101`` — the base models
of the reference's DeepLab/FCN families (models/__init__.py:32-37,
models/multiframe_model.py:281, :482).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


def _bn(train: bool, name=None):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride/dilation) -> 1x1 x4, residual."""

    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        f = self.features
        y = nn.Conv(f, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn(train, "bn1")(y))
        d = self.dilation
        y = nn.Conv(
            f,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((d, d), (d, d)),
            kernel_dilation=(d, d),
            use_bias=False,
            name="conv2",
        )(y)
        y = nn.relu(_bn(train, "bn2")(y))
        y = nn.Conv(4 * f, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn(train, "bn3")(y)
        if self.downsample:
            identity = nn.Conv(
                4 * f,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="down_conv",
            )(x)
            identity = _bn(train, "down_bn")(identity)
        return nn.relu(y + identity)


class ResNetDilated(nn.Module):
    """ResNet-v1 with stage 3/4 dilation (output stride 8).

    ``layers`` = blocks per stage; (3, 4, 23, 3) = ResNet-101.
    Returns the final stage features (B, H/8, W/8, 2048).
    """

    layers: Tuple[int, ...] = (3, 4, 23, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = nn.Conv(
            w, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, name="conv1",
        )(x)
        x = nn.relu(_bn(train, "bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        # (features, stride, dilation) per stage; stages 3/4 convert stride
        # to dilation (torchvision replace_stride_with_dilation=[F, T, T]).
        stage_cfg = [
            (w, 1, 1),
            (w * 2, 2, 1),
            (w * 4, 1, 2),
            (w * 8, 1, 4),
        ]
        for si, ((f, stride, dil), n_blocks) in enumerate(
            zip(stage_cfg, self.layers)
        ):
            for bi in range(n_blocks):
                # torchvision: first block of a dilated stage uses the
                # previous dilation for its 3x3 (dilation//2 when growing)
                first = bi == 0
                block_dil = dil if not first else max(1, dil // 2)
                x = Bottleneck(
                    f,
                    stride=stride if first else 1,
                    dilation=block_dil,
                    downsample=first,
                    name=f"layer{si + 1}_block{bi}",
                )(x, train=train)
        return x
