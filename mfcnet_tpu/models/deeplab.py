"""DeepLabV3 (ResNet-101) — behavioral port of torchvision's
``deeplabv3_resnet101`` with a fresh ``DeepLabHead(2048, num_classes)``
(reference: models/__init__.py:32-34). Emits raw logits at input resolution
(bilinear align_corners=False upsample of the head output, as torchvision's
_SimpleSegmentationModel.forward does).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mfcnet_tpu.models.resnet import ResNetDilated, _bn
from mfcnet_tpu.ops.resize import resize_bilinear


class ASPPConv(nn.Module):
    features: int
    dilation: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        x = nn.Conv(
            self.features, (3, 3), padding=((d, d), (d, d)),
            kernel_dilation=(d, d), use_bias=False, name="conv",
        )(x)
        return nn.relu(_bn(train, "bn")(x))


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling, rates (12, 24, 36)."""

    features: int = 256
    rates: tuple = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[-3], x.shape[-2]
        branches = []
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1x1")(x)
        branches.append(nn.relu(_bn(train, "bn1x1")(y)))
        for i, r in enumerate(self.rates):
            branches.append(
                ASPPConv(self.features, r, name=f"aspp_conv{i}")(
                    x, train=train
                )
            )
        # image pooling branch
        p = jnp.mean(x, axis=(-3, -2), keepdims=True)
        p = nn.Conv(self.features, (1, 1), use_bias=False, name="pool_conv")(p)
        p = nn.relu(_bn(train, "pool_bn")(p))
        p = jnp.broadcast_to(p, (*x.shape[:-3], H, W, self.features))
        branches.append(p)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="project")(y)
        y = nn.relu(_bn(train, "project_bn")(y))
        # torchvision ASPP ends with Dropout(0.5) — inference no-op; train
        # uses the module's deterministic flag
        return y


class DeepLabHead(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ASPP(name="aspp")(x, train=train)
        x = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                    name="conv")(x)
        x = nn.relu(_bn(train, "bn")(x))
        return nn.Conv(self.num_classes, (1, 1), name="final")(x)


class DeepLabV3ResNet101(nn.Module):
    num_classes: int
    layers: tuple = (3, 4, 23, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[-3], x.shape[-2]
        feats = ResNetDilated(self.layers, self.width, name="backbone")(
            x, train=train
        )
        logits = DeepLabHead(self.num_classes, name="classifier")(
            feats, train=train
        )
        return resize_bilinear(logits, H, W, align_corners=False)
