"""FCN (ResNet-101) — behavioral port of torchvision's ``fcn_resnet101``
with a fresh ``FCNHead(2048, num_classes)`` (reference:
models/__init__.py:35-37). Raw logits at input resolution.
"""

from __future__ import annotations

from flax import linen as nn

from mfcnet_tpu.models.resnet import ResNetDilated, _bn
from mfcnet_tpu.ops.resize import resize_bilinear


class FCNHead(nn.Module):
    """Conv3x3(2048 -> 512) + BN + ReLU + Dropout(0.1) + Conv1x1."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 4
        x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False,
                    name="conv")(x)
        x = nn.relu(_bn(train, "bn")(x))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), name="final")(x)


class FCNResNet101(nn.Module):
    num_classes: int
    layers: tuple = (3, 4, 23, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[-3], x.shape[-2]
        feats = ResNetDilated(self.layers, self.width, name="backbone")(
            x, train=train
        )
        logits = FCNHead(self.num_classes, name="classifier")(
            feats, train=train
        )
        return resize_bilinear(logits, H, W, align_corners=False)
