"""TAPNet — motion-prior attention U-Nets (reference: models/tap_model.py).

At each decoder stage: ``out = x + x * attmap`` followed by a learned
1-channel sigmoid attention map fed (2x-upsampled) to the next stage. The
initial attention map is the motion-prior map produced by flow-warping the
previous frame's prediction (data/attmap pipeline).

Quirk preserved: the learnable attention head is Conv1x1 + ReLU + Sigmoid
(reference models/tap_model.py:106-109 wraps Conv2dReLU in Sigmoid), so the
learned map lives in [0.5, 1].
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mfcnet_tpu.models.common import (
    VGG11_STAGES,
    VGG16_STAGES,
    ConvReLU,
    TorchConvTranspose,
    VGGFeatures,
    log_softmax_channels,
    max_pool_2x,
)
from mfcnet_tpu.ops.resize import resize_bilinear, upsample_bilinear_2x


class UNetModule(nn.Module):
    """2 x (Conv3x3 + ReLU) (reference: models/tap_model.py:27-42, bn=False
    default)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = ConvReLU(self.features)(x)
        return ConvReLU(self.features)(x)


class DecoderModule(nn.Module):
    """TAPNet decoder stage (reference: models/tap_model.py:56-91)."""

    mid_features: int
    out_features: int
    upsample: bool = True

    @nn.compact
    def __call__(self, x):
        if self.upsample:
            x = upsample_bilinear_2x(x, align_corners=False)
            x = ConvReLU(self.mid_features)(x)
            return ConvReLU(self.out_features)(x)
        x = ConvReLU(self.mid_features)(x)
        x = TorchConvTranspose(self.out_features)(x)
        return nn.relu(x)


class AttentionModule(nn.Module):
    """reference: models/tap_model.py:93-118."""

    features: int
    scale_factor: float = 1.0

    @nn.compact
    def __call__(self, x, attmap):
        if self.scale_factor != 1:
            h = int(attmap.shape[-3] * self.scale_factor)
            w = int(attmap.shape[-2] * self.scale_factor)
            attmap = resize_bilinear(attmap, h, w, align_corners=False)
        x = ConvReLU(self.features)(x)
        out = x + x * attmap
        att = nn.Conv(1, (1, 1), name="att_conv")(out)
        att = nn.sigmoid(nn.relu(att))
        return out, att


class _TAPNetVGG(nn.Module):
    """Shared VGG-encoder TAPNet body (TAPNet11/16 differ only in encoder
    stages and decoder style; reference models/tap_model.py:173-298).
    ``width_mult`` scales the decoder/attention widths with the encoder."""

    num_classes: int
    stage_convs: tuple
    upsample_decoder: bool
    width_mult: float = 1.0
    remat: bool = False

    @nn.compact
    def __call__(self, x, attmap, train: bool = False):
        # remat (scope-preserving, see ternausnet.py): encoder + decoder
        # stages recompute intra-segment activations in the backward pass
        Enc = nn.remat(VGGFeatures) if self.remat else VGGFeatures
        Dec = nn.remat(DecoderModule) if self.remat else DecoderModule
        Att = nn.remat(AttentionModule) if self.remat else AttentionModule
        conv1, conv2, conv3, conv4, conv5 = Enc(
            self.stage_convs, name="encoder"
        )(x)
        up = self.upsample_decoder

        def c(n):
            return max(1, int(n * self.width_mult))

        center = Dec(c(512), c(256), up, name="center")(
            max_pool_2x(conv5)
        )

        att5, a5 = Att(c(256) + c(512), 1 / 16, name="att5")(
            jnp.concatenate([center, conv5], axis=-1), attmap
        )
        dec5 = Dec(c(512), c(256), up, name="dec5")(att5)
        att4, a4 = Att(c(256) + c(512), 1, name="att4")(
            jnp.concatenate([dec5, conv4], axis=-1),
            upsample_bilinear_2x(a5, align_corners=False),
        )
        dec4 = Dec(
            c(512), c(256) if up else c(128), up, name="dec4"
        )(att4)
        att3, a3 = Att(c(128) + c(256), 1, name="att3")(
            jnp.concatenate([dec4, conv3], axis=-1),
            upsample_bilinear_2x(a4, align_corners=False),
        )
        dec3 = Dec(c(256), c(64), up, name="dec3")(att3)
        att2, a2 = Att(c(64) + c(128), 1, name="att2")(
            jnp.concatenate([dec3, conv2], axis=-1),
            upsample_bilinear_2x(a3, align_corners=False),
        )
        dec2 = Dec(c(128), c(32), up, name="dec2")(att2)
        att1, a1 = Att(c(32) + c(64), 1, name="att1")(
            jnp.concatenate([dec2, conv1], axis=-1),
            upsample_bilinear_2x(a2, align_corners=False),
        )
        dec1 = ConvReLU(c(32), name="dec1")(att1)
        out = nn.Conv(self.num_classes, (1, 1), name="final")(dec1)
        if self.num_classes > 1:
            out = log_softmax_channels(out)
        return out


class TAPNet11(nn.Module):
    """VGG11 encoder, deconv decoder (reference: models/tap_model.py:173-234,
    upsample=False default)."""

    num_classes: int
    stage_convs: tuple = VGG11_STAGES
    width_mult: float = 1.0
    remat: bool = False

    @nn.compact
    def __call__(self, x, attmap, train: bool = False):
        return _TAPNetVGG(
            self.num_classes, self.stage_convs, upsample_decoder=False,
            width_mult=self.width_mult, remat=self.remat, name="body",
        )(x, attmap, train=train)


class TAPNet16(nn.Module):
    """VGG16 encoder, bilinear-upsample decoder (reference:
    models/tap_model.py:237-298, upsample=True default)."""

    num_classes: int
    stage_convs: tuple = VGG16_STAGES
    width_mult: float = 1.0
    remat: bool = False

    @nn.compact
    def __call__(self, x, attmap, train: bool = False):
        return _TAPNetVGG(
            self.num_classes, self.stage_convs, upsample_decoder=True,
            width_mult=self.width_mult, remat=self.remat, name="body",
        )(x, attmap, train=train)


class TAPNet(nn.Module):
    """Generic small TAPNet (reference: models/tap_model.py:122-170)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, attmap, train: bool = False):
        conv1 = UNetModule(32)(x)
        conv2 = UNetModule(64)(max_pool_2x(conv1))
        conv3 = UNetModule(128)(max_pool_2x(conv2))
        conv4 = UNetModule(256)(max_pool_2x(conv3))
        center = UNetModule(512)(max_pool_2x(conv4))

        att4, a4 = AttentionModule(512 + 256, 1 / 8, name="att4")(
            jnp.concatenate(
                [conv4, upsample_bilinear_2x(center, align_corners=False)],
                axis=-1,
            ),
            attmap,
        )
        up4 = UNetModule(256)(att4)
        att3, a3 = AttentionModule(256 + 128, 1, name="att3")(
            jnp.concatenate(
                [conv3, upsample_bilinear_2x(up4, align_corners=False)],
                axis=-1,
            ),
            upsample_bilinear_2x(a4, align_corners=False),
        )
        up3 = UNetModule(128)(att3)
        att2, a2 = AttentionModule(128 + 64, 1, name="att2")(
            jnp.concatenate(
                [conv2, upsample_bilinear_2x(up3, align_corners=False)],
                axis=-1,
            ),
            upsample_bilinear_2x(a3, align_corners=False),
        )
        up2 = UNetModule(64)(att2)
        att1, a1 = AttentionModule(64 + 32, 1, name="att1")(
            jnp.concatenate(
                [conv1, upsample_bilinear_2x(up2, align_corners=False)],
                axis=-1,
            ),
            upsample_bilinear_2x(a2, align_corners=False),
        )
        up1 = UNetModule(32)(att1)
        return nn.Conv(self.num_classes, (1, 1), name="final")(up1)
