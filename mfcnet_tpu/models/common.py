"""Shared Flax building blocks for the model zoo.

Layout is NHWC everywhere (TPU-native). Parameter layouts:
  * Conv kernels: HWIO (flax default). The torch converter transposes OIHW.
  * Deconv (``TorchConvTranspose``): stored as the *equivalent dense-conv*
    kernel (kh, kw, in, out), i.e. torch's ConvTranspose2d weight
    (in, out, kh, kw) spatially flipped then transposed — so apply time needs
    no flips and lowers to one ``conv_general_dilated``.

BatchNorm: ``flax.linen.BatchNorm`` with torch-default eps=1e-5 and
running-stat momentum 0.1 (flax momentum=0.9). Under ``jit`` with a sharded
batch, XLA computes batch statistics over the *global* batch automatically —
this subsumes the reference's SyncBatchNorm / InPlaceABNSync collectives
(reference: models/sync_bn/inplace_abn/functions.py:157-230) with zero
hand-written communication.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1) with exact torch semantics (2x upsample).

    Implemented as ``conv_general_dilated`` with lhs_dilation=stride and
    padding k-1-p per side, contracting the stored (kh, kw, in, out) kernel.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
        )
        dtype = self.dtype or x.dtype
        pad = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + bias.astype(dtype)
        return y


class ConvReLU(nn.Module):
    """Conv(k, padding='SAME') + ReLU (reference: models/ternausnet.py:14-23)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (self.kernel_size, self.kernel_size), padding="SAME"
        )(x)
        return nn.relu(x)


class ConvBNReLU(nn.Module):
    """Conv + BatchNorm + ReLU (UNet/TAPNet blocks with bn=True)."""

    features: int
    kernel_size: int = 3
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel_size, self.kernel_size), padding="SAME"
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        return nn.relu(x)


class DecoderBlockDeconv(nn.Module):
    """TernausNet decoder block, deconv variant.

    ConvReLU(mid) -> ConvTranspose(out, k4 s2 p1) -> ReLU
    (reference: models/ternausnet.py:25-43, is_deconv=True).
    """

    mid_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        from mfcnet_tpu.parallel.mesh import respec_spatial

        # under a data x spatial mesh, pin each intermediate's height
        # sharding (GSPMD's free propagation around the lhs-dilated
        # deconv flip-flops at bottleneck sizes and inserts an
        # involuntary full rematerialization — parallel/mesh.py)
        x = respec_spatial(ConvReLU(self.mid_features)(x))
        x = respec_spatial(TorchConvTranspose(self.out_features)(x))
        return nn.relu(x)


class DecoderBlockUpsample(nn.Module):
    """TernausNet decoder block, bilinear-upsample variant.

    Upsample(2x, bilinear, align_corners=False per nn.Upsample default... the
    reference uses nn.Upsample(mode='bilinear') whose default align_corners
    is False) -> ConvReLU(mid) -> ConvReLU(out)
    (reference: models/ternausnet.py:37-40, is_deconv=False).
    """

    mid_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        from mfcnet_tpu.ops.resize import upsample_bilinear_2x

        x = upsample_bilinear_2x(x, align_corners=False)
        x = ConvReLU(self.mid_features)(x)
        return ConvReLU(self.out_features)(x)


def max_pool_2x(x):
    """MaxPool2d(2, 2)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def log_softmax_channels(x):
    """log_softmax over the channel (last) axis."""
    return jax.nn.log_softmax(x, axis=-1)


class VGGFeatures(nn.Module):
    """VGG-style conv feature extractor returning per-stage activations.

    ``stage_convs``: channels of each conv within each stage; stages are
    separated by 2x2 max-pools, pooling applied *before* each stage except
    the first (matching how TernausNet consumes torchvision VGG features:
    reference models/ternausnet.py:116-136).
    """

    stage_convs: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, x):
        feats = []
        from mfcnet_tpu.parallel.mesh import respec_spatial

        for si, stage in enumerate(self.stage_convs):
            if si > 0:
                x = max_pool_2x(x)
            for ch in stage:
                x = nn.Conv(ch, (3, 3), padding="SAME")(x)
                x = nn.relu(x)
            # pin each stage output's height sharding under a spatial
            # mesh (see DecoderBlockDeconv / parallel/mesh.py)
            x = respec_spatial(x)
            feats.append(x)
        return feats


VGG11_STAGES = ((64,), (128,), (256, 256), (512, 512), (512, 512))
VGG16_STAGES = (
    (64, 64),
    (128, 128),
    (256, 256, 256),
    (512, 512, 512),
    (512, 512, 512),
)
