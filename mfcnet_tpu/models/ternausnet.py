"""TernausNet11/16 — VGG-encoder U-Nets (reference: models/ternausnet.py).

Emits per-pixel log-probabilities when ``num_classes > 1`` (the reference
applies ``F.log_softmax`` at the output: models/ternausnet.py:91-92,145-146),
raw single-channel logits otherwise.

TPU notes: all convs are 3x3 SAME stride 1 (MXU-tiled by XLA); the decoder
uses stride-2 deconvs with exact torch ConvTranspose2d(k4 s2 p1) semantics.
Input H, W must be divisible by 32 (five 2x2 pools), e.g. 480x640.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mfcnet_tpu.parallel.mesh import respec_spatial
from mfcnet_tpu.models.common import (
    VGG11_STAGES,
    VGG16_STAGES,
    ConvReLU,
    DecoderBlockDeconv,
    VGGFeatures,
    log_softmax_channels,
    max_pool_2x,
)


class TernausNet16(nn.Module):
    """VGG16-encoder TernausNet (reference: models/ternausnet.py:98-150).

    ``stage_convs`` overrides the encoder widths (tests use tiny stacks).
    ``remat``: rematerialize the encoder (one segment) and each decoder
    block during training — intra-segment activations are recomputed in
    the backward pass instead of held in HBM (full-scale 480x640 batch-4
    training OOMs a 16 GB v5e without it). ``nn.remat`` is
    scope-preserving, so the parameter tree (and every checkpoint
    converter) is unchanged; forward values are bit-identical.
    """

    num_classes: int = 1
    num_filters: int = 32
    stage_convs: tuple = VGG16_STAGES
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.num_filters
        Enc = nn.remat(VGGFeatures) if self.remat else VGGFeatures
        Dec = (
            nn.remat(DecoderBlockDeconv) if self.remat
            else DecoderBlockDeconv
        )
        conv1, conv2, conv3, conv4, conv5 = Enc(
            self.stage_convs, name="encoder"
        )(x)

        # under a data x spatial mesh, pin the bottleneck's height
        # sharding explicitly (H shrinks below the spatial axis extent
        # here; GSPMD's propagated choices can disagree and trigger an
        # involuntary full rematerialization — parallel/mesh.py)
        center = Dec(nf * 16, nf * 8, name="center")(
            respec_spatial(max_pool_2x(conv5))
        )
        dec5 = Dec(nf * 16, nf * 8, name="dec5")(
            respec_spatial(jnp.concatenate([center, conv5], axis=-1))
        )
        dec4 = Dec(nf * 16, nf * 8, name="dec4")(
            jnp.concatenate([dec5, conv4], axis=-1)
        )
        dec3 = Dec(nf * 8, nf * 2, name="dec3")(
            jnp.concatenate([dec4, conv3], axis=-1)
        )
        dec2 = Dec(nf * 4, nf, name="dec2")(
            jnp.concatenate([dec3, conv2], axis=-1)
        )
        dec1 = ConvReLU(nf, name="dec1")(
            jnp.concatenate([dec2, conv1], axis=-1)
        )
        out = nn.Conv(self.num_classes, (1, 1), name="final")(dec1)
        if self.num_classes > 1:
            out = log_softmax_channels(out)
        return out


class TernausNet11(nn.Module):
    """VGG11-encoder TernausNet (reference: models/ternausnet.py:45-96).

    Note the reference's center block declares in_channels 256 + nf*8 which
    is only consistent with its actual 512-channel input for nf=32; flax
    infers input channels so any nf works here.
    """

    num_classes: int = 1
    num_filters: int = 32
    stage_convs: tuple = VGG11_STAGES
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.num_filters
        Enc = nn.remat(VGGFeatures) if self.remat else VGGFeatures
        Dec = (
            nn.remat(DecoderBlockDeconv) if self.remat
            else DecoderBlockDeconv
        )
        conv1, conv2, conv3, conv4, conv5 = Enc(
            self.stage_convs, name="encoder"
        )(x)

        # under a data x spatial mesh, pin the bottleneck's height
        # sharding explicitly (H shrinks below the spatial axis extent
        # here; GSPMD's propagated choices can disagree and trigger an
        # involuntary full rematerialization — parallel/mesh.py)
        center = Dec(nf * 16, nf * 8, name="center")(
            respec_spatial(max_pool_2x(conv5))
        )
        dec5 = Dec(nf * 16, nf * 8, name="dec5")(
            respec_spatial(jnp.concatenate([center, conv5], axis=-1))
        )
        dec4 = Dec(nf * 16, nf * 4, name="dec4")(
            jnp.concatenate([dec5, conv4], axis=-1)
        )
        dec3 = Dec(nf * 8, nf * 2, name="dec3")(
            jnp.concatenate([dec4, conv3], axis=-1)
        )
        dec2 = Dec(nf * 4, nf, name="dec2")(
            jnp.concatenate([dec3, conv2], axis=-1)
        )
        dec1 = ConvReLU(nf, name="dec1")(
            jnp.concatenate([dec2, conv1], axis=-1)
        )
        out = nn.Conv(self.num_classes, (1, 1), name="final")(dec1)
        if self.num_classes > 1:
            out = log_softmax_channels(out)
        return out
