"""HRNet-W48 semantic segmentation (reference: models/hrnet.py).

Four-stage high-resolution network: stem (2x stride-2 convs), stage1 (4
Bottlenecks @64), then multi-resolution stages with (48, 96, 192, 384)
branch channels, module counts (1, 4, 3), 4 BasicBlocks per branch per
module, SUM fusion with bilinear(align_corners=False) upsampling, and the
concat + 1x1-conv segmentation head. Output logits at 1/4 input resolution
upsampled to input size by the caller contract of the reference
(the reference returns the 1/4-res map and torchvision-style heads resize;
here we return input-resolution logits directly for a uniform model API).

The reference's SyncBN/InPlaceABN machinery (models/sync_bn/) is replaced by
plain flax BatchNorm: under jit with a sharded batch XLA computes global
batch statistics, which is exactly what InPlaceABNSync's gather/reduce_add
protocol implements by hand (functions.py:157-230).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mfcnet_tpu.ops.resize import resize_bilinear


def _bn(train: bool, name=None):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class BasicBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(x)
        y = nn.relu(_bn(train)(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(y)
        y = _bn(train)(y)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    features: int
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = nn.relu(_bn(train)(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.relu(_bn(train)(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = _bn(train)(y)
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1), use_bias=False)(x)
            identity = _bn(train)(identity)
        return nn.relu(y + identity)


class HRModule(nn.Module):
    """One high-resolution module: per-branch block stacks + full fuse
    (reference: models/hrnet.py:118-262)."""

    channels: Tuple[int, ...]
    num_blocks: int = 4

    @nn.compact
    def __call__(self, xs: List, train: bool = False):
        nb = len(self.channels)
        # branches
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(
                    self.channels[i], name=f"branch{i}_block{b}"
                )(x, train=train)
            ys.append(x)
        if nb == 1:
            return ys
        # fuse: out_i = sum_j fuse_ij(y_j)
        outs = []
        for i in range(nb):
            acc = None
            for j in range(nb):
                y = ys[j]
                if j > i:
                    # upsample path: 1x1 conv to channels[i] + BN, then
                    # bilinear upsample 2^(j-i) (align_corners=False)
                    y = nn.Conv(
                        self.channels[i], (1, 1), use_bias=False,
                        name=f"fuse{i}_{j}_conv",
                    )(y)
                    y = _bn(train, name=f"fuse{i}_{j}_bn")(y)
                    y = resize_bilinear(
                        y,
                        xs[i].shape[-3],
                        xs[i].shape[-2],
                        align_corners=False,
                    )
                elif j < i:
                    # downsample path: (i-j) stride-2 3x3 convs; last one
                    # maps to channels[i] without relu
                    for k in range(i - j):
                        last = k == i - j - 1
                        feat = self.channels[i] if last else self.channels[j]
                        y = nn.Conv(
                            feat, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)),
                            use_bias=False, name=f"fuse{i}_{j}_down{k}",
                        )(y)
                        y = _bn(train, name=f"fuse{i}_{j}_down{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRNetW48(nn.Module):
    """reference: models/hrnet.py:271-476 (HighResolutionNet, W48)."""

    num_classes: int
    channels: Tuple[int, ...] = (48, 96, 192, 384)
    stage_modules: Tuple[int, ...] = (1, 4, 3)  # stages 2, 3, 4
    num_blocks: int = 4
    stage1_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[-3], x.shape[-2]
        ch = self.channels
        # stem: two stride-2 3x3 convs -> 1/4 resolution
        x = nn.Conv(64, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem1")(x)
        x = nn.relu(_bn(train, "stem1_bn")(x))
        x = nn.Conv(64, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem2")(x)
        x = nn.relu(_bn(train, "stem2_bn")(x))

        # stage 1: 4 bottlenecks at width 64 -> 256 channels
        for b in range(4):
            x = Bottleneck(
                self.stage1_width, downsample=(b == 0), name=f"layer1_{b}"
            )(x, train=train)

        # transition1: branch 0 conv to ch[0]; branch 1 stride-2 conv
        xs = [
            nn.relu(_bn(train, "t1_0_bn")(
                nn.Conv(ch[0], (3, 3), padding="SAME", use_bias=False,
                        name="t1_0")(x)
            )),
            nn.relu(_bn(train, "t1_1_bn")(
                nn.Conv(ch[1], (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, name="t1_1")(x)
            )),
        ]
        for m in range(self.stage_modules[0]):
            xs = HRModule(ch[:2], self.num_blocks, name=f"stage2_m{m}")(
                xs, train=train
            )

        # transition2: new lowest branch from previous lowest
        xs = xs + [
            nn.relu(_bn(train, "t2_bn")(
                nn.Conv(ch[2], (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, name="t2")(xs[-1])
            ))
        ]
        for m in range(self.stage_modules[1]):
            xs = HRModule(ch[:3], self.num_blocks, name=f"stage3_m{m}")(
                xs, train=train
            )

        xs = xs + [
            nn.relu(_bn(train, "t3_bn")(
                nn.Conv(ch[3], (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, name="t3")(xs[-1])
            ))
        ]
        for m in range(self.stage_modules[2]):
            xs = HRModule(ch[:4], self.num_blocks, name=f"stage4_m{m}")(
                xs, train=train
            )

        # head: upsample all branches to 1/4 res, concat, 1x1 convs
        h4, w4 = xs[0].shape[-3], xs[0].shape[-2]
        ups = [xs[0]] + [
            resize_bilinear(y, h4, w4, align_corners=False) for y in xs[1:]
        ]
        y = jnp.concatenate(ups, axis=-1)
        y = nn.Conv(y.shape[-1], (1, 1), name="head1")(y)
        y = nn.relu(_bn(train, "head_bn")(y))
        y = nn.Conv(self.num_classes, (1, 1), name="head2")(y)
        # 4x bilinear upsample back to input size (models/hrnet.py:473-475)
        return resize_bilinear(y, H, W, align_corners=False)
