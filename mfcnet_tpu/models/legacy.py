"""Legacy / inventoried-but-unused model families.

The reference ships three model files that are never imported by any entry
point (SURVEY.md §2.2 'dead code'): the Du et al. 2018 part-affinity-field
detector (models/PAF_model.py, with a num_joints attribute bug at :118), the
ResNet50-CSL joint seg+localization net (models/resnet.py, with a
pdb.set_trace() left in forward at :174), and the Kurmann et al. 2017 net
(models/unet.py:66-118, with an F.maxpool2d typo at :100 and an undefined
``x_c`` at :109). They are provided here as working Flax modules (bugs
fixed) so the component inventory is complete.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mfcnet_tpu.models.common import TorchConvTranspose, max_pool_2x
from mfcnet_tpu.models.unet import UNetBlock, UpConv
from mfcnet_tpu.ops.resize import resize_bilinear


def _bn(train, name=None):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class _CBR(nn.Module):
    """Conv + BN + ReLU (reference: models/PAF_model.py CBR)."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kernel == 2 and self.stride == 2:
            pad = "VALID"  # torch k2 s2 p0
        elif self.kernel > 1:
            k = self.kernel
            pad = ((k // 2, k // 2), (k // 2, k // 2))
        else:
            pad = "VALID"
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            (self.stride, self.stride), padding=pad,
        )(x)
        return nn.relu(_bn(train)(x))


class _DBR(nn.Module):
    """Deconv(k2 s2) + BN + ReLU (reference: models/PAF_model.py DBR)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConvTranspose(
            self.features, kernel_size=2, stride=2, padding=0
        )(x)
        return nn.relu(_bn(train)(x))


class PAFDetectionModel(nn.Module):
    """Dual-branch part-affinity-field detector
    (reference: models/PAF_model.py:63-164). Returns (joint heatmaps,
    association fields)."""

    num_joints: int
    num_joint_associations: int
    width: int = 64  # reference uses 64; shrinkable for tests

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = _CBR(w)(x, train=train)

        def down_stage(x, f):
            xa = _CBR(f)( _CBR(f, 2, 2)(x, train=train), train=train)
            xb = _CBR(f)( _CBR(f, 2, 2)(x, train=train), train=train)
            return _CBR(2 * f, 1)(
                jnp.concatenate([xa, xb], axis=-1), train=train
            )

        x1 = down_stage(x, w)
        x2 = down_stage(x1, 2 * w)
        x3 = down_stage(x2, 4 * w)
        x4 = down_stage(x3, 8 * w)

        def up_stage(x, f, skip=None):
            half = x.shape[-1] // 2
            xa = _CBR(f)(_DBR(f)(x[..., :half], train=train), train=train)
            xb = _CBR(f)(_DBR(f)(x[..., half:], train=train), train=train)
            y = _CBR(2 * f, 1)(
                jnp.concatenate([xa, xb], axis=-1), train=train
            )
            return y + skip if skip is not None else y

        x5 = up_stage(x4, 4 * w, x3)
        x6 = up_stage(x5, 2 * w, x2)
        x7 = up_stage(x6, w)
        half = x7.shape[-1] // 2
        x8a = _CBR(w // 2)(_DBR(w // 2)(x7[..., :half], train=train),
                           train=train)
        x8b = _CBR(w // 2)(_DBR(w // 2)(x7[..., half:], train=train),
                           train=train)
        joints = nn.Conv(self.num_joints, (1, 1))(x8a)
        assoc = nn.Conv(self.num_joint_associations, (1, 1))(x8b)
        return joints, assoc


class ResNetUpProjection(nn.Module):
    """reference: models/resnet.py:135-150."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = resize_bilinear(x, x.shape[-3] * 2, x.shape[-2] * 2)
        y = nn.relu(nn.Conv(self.features, (5, 5), padding="SAME")(x))
        y = nn.Conv(self.features, (3, 3), padding="SAME")(y)
        y = y + nn.Conv(self.features, (5, 5), padding="SAME")(x)
        return nn.relu(y)


class ResNet50CSL(nn.Module):
    """ResNet50 encoder + up-projection decoder with joint
    segmentation + localization heads (reference: models/resnet.py:152-190;
    the stray pdb.set_trace() at :174 is of course dropped)."""

    num_classes: int
    num_joints: int
    layers: tuple = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mfcnet_tpu.models.resnet import Bottleneck

        H, W = x.shape[-3], x.shape[-2]
        w = self.width
        x = nn.Conv(w, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False)(x)
        x = nn.relu(_bn(train)(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        skips = []
        for si, n_blocks in enumerate(self.layers):
            f = w * (2**si)
            for bi in range(n_blocks):
                x = Bottleneck(
                    f, stride=2 if (si > 0 and bi == 0) else 1,
                    downsample=(bi == 0),
                )(x, train=train)
            skips.append(x)
        x1, x2, x3, x4 = skips  # 1/4 .. 1/32

        y = nn.relu(nn.Conv(x4.shape[-1] // 2, (1, 1))(x4))
        y = ResNetUpProjection(x3.shape[-1] // 2)(y)
        y = y + nn.relu(nn.Conv(x3.shape[-1] // 2, (1, 1))(x3))
        y = ResNetUpProjection(x2.shape[-1] // 2)(y)
        y = y + nn.relu(nn.Conv(x2.shape[-1] // 2, (1, 1))(x2))
        y = ResNetUpProjection(x1.shape[-1] // 2)(y)
        y = y + nn.relu(nn.Conv(x1.shape[-1] // 2, (1, 1))(x1))
        y = ResNetUpProjection(w)(y)

        seg_logits = nn.Conv(self.num_classes, (1, 1), use_bias=False)(y)
        z = nn.Conv(w // 2, (1, 1))(y)
        loc = nn.Conv(self.num_joints, (1, 1), use_bias=False)(
            jnp.concatenate([z, seg_logits], axis=-1)
        )
        seg = jax.nn.softmax(seg_logits, axis=-1)
        seg = resize_bilinear(seg, H, W)
        loc = resize_bilinear(loc, H, W)
        return seg, loc


class KurmannEtAl2017Net(nn.Module):
    """Joint segmentation + presence-classification net
    (reference: models/unet.py:66-118; the maxpool typo and undefined x_c
    are fixed — x_c reads from the encoder bottleneck as the architecture
    intends)."""

    num_classes: int
    num_joints: int
    dims: tuple = (64, 128, 256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dims
        x1 = UNetBlock(d[0])(x, train=train)
        x2 = UNetBlock(d[1])(max_pool_2x(x1), train=train)
        x3 = UNetBlock(d[2])(max_pool_2x(x2), train=train)
        x4 = UNetBlock(d[3])(max_pool_2x(x3), train=train)
        x5 = UNetBlock(d[4])(max_pool_2x(x4), train=train)
        enc = UNetBlock(d[5])(max_pool_2x(x5), train=train)

        y = UpConv(d[4])(enc, x5, train=train)
        y = UpConv(d[3])(y, x4, train=train)
        y = UpConv(d[2])(y, x3, train=train)
        y = UpConv(d[1])(y, x2, train=train)
        y = UpConv(d[0])(y, x1, train=train)
        heatmaps = nn.Conv(self.num_classes * self.num_joints, (1, 1))(y)

        c = nn.relu(nn.Conv(128, (3, 3), padding="SAME")(enc))
        c = c.reshape(*c.shape[:-3], -1)
        c = nn.relu(nn.Dense(512)(c))
        c = nn.relu(nn.Dense(256)(c))
        presence = jax.nn.softmax(nn.Dense(self.num_classes)(c), axis=-1)
        return heatmaps, presence
