"""Pure-torch oracle models for checkpoint-conversion parity tests.

torchvision is not installed in this environment, so these rebuild the
reference architectures (TernausNet16 + MFCNet wrapper) with plain torch.nn,
using the same module/key naming the reference checkpoints have
(state_dict keys like ``encoder.0.weight``, ``center.block.1.weight``,
``multiframe_net.multiframe_net.0.weight``). They exist only to generate
authentic state_dicts and reference outputs for tests/test_compat.py.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]


def vgg16_features(width_mult=1.0):
    layers, in_c = [], 3
    for v in VGG16_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            out_c = max(1, int(v * width_mult))
            layers.append(nn.Conv2d(in_c, out_c, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_c = out_c
    return nn.Sequential(*layers)


class ConvRelu(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, 3, padding=1)
        self.activation = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.activation(self.conv(x))


class DecoderBlock(nn.Module):
    def __init__(self, in_c, mid_c, out_c):
        super().__init__()
        self.block = nn.Sequential(
            ConvRelu(in_c, mid_c),
            nn.ConvTranspose2d(mid_c, out_c, kernel_size=4, stride=2,
                               padding=1),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.block(x)


class TernausNet16Torch(nn.Module):
    """Structural oracle for reference models/ternausnet.py:98-150."""

    def __init__(self, num_classes=5, num_filters=64, width_mult=1.0):
        super().__init__()
        self.num_classes = num_classes
        self.pool = nn.MaxPool2d(2, 2)
        self.encoder = vgg16_features(width_mult)
        self.relu = nn.ReLU(inplace=True)
        e = self.encoder
        self.conv1 = nn.Sequential(e[0], self.relu, e[2], self.relu)
        self.conv2 = nn.Sequential(e[5], self.relu, e[7], self.relu)
        self.conv3 = nn.Sequential(e[10], self.relu, e[12], self.relu,
                                   e[14], self.relu)
        self.conv4 = nn.Sequential(e[17], self.relu, e[19], self.relu,
                                   e[21], self.relu)
        self.conv5 = nn.Sequential(e[24], self.relu, e[26], self.relu,
                                   e[28], self.relu)
        nf = num_filters
        c512 = max(1, int(512 * width_mult))
        c256 = max(1, int(256 * width_mult))
        c128 = max(1, int(128 * width_mult))
        c64 = max(1, int(64 * width_mult))
        self.center = DecoderBlock(c512, nf * 16, nf * 8)
        self.dec5 = DecoderBlock(c512 + nf * 8, nf * 16, nf * 8)
        self.dec4 = DecoderBlock(c512 + nf * 8, nf * 16, nf * 8)
        self.dec3 = DecoderBlock(c256 + nf * 8, nf * 8, nf * 2)
        self.dec2 = DecoderBlock(c128 + nf * 2, nf * 4, nf)
        self.dec1 = ConvRelu(c64 + nf, nf)
        self.final = nn.Conv2d(nf, num_classes, kernel_size=1)

    def forward(self, x):
        conv1 = self.conv1(x)
        conv2 = self.conv2(self.pool(conv1))
        conv3 = self.conv3(self.pool(conv2))
        conv4 = self.conv4(self.pool(conv3))
        conv5 = self.conv5(self.pool(conv4))
        center = self.center(self.pool(conv5))
        dec5 = self.dec5(torch.cat([center, conv5], 1))
        dec4 = self.dec4(torch.cat([dec5, conv4], 1))
        dec3 = self.dec3(torch.cat([dec4, conv3], 1))
        dec2 = self.dec2(torch.cat([dec3, conv2], 1))
        dec1 = self.dec1(torch.cat([dec2, conv1], 1))
        out = self.final(dec1)
        if self.num_classes > 1:
            out = F.log_softmax(out, dim=1)
        return out


class MultiFrameNetBasicTorch(nn.Module):
    """Oracle for reference models/multiframe_model.py:51-87 (head only,
    no-flow path; the flow-warp path is covered by tests/test_ops.py)."""

    def __init__(self, num_classes, num_frames, with_depth=False):
        super().__init__()
        tc = num_frames * num_classes
        in_c = tc + (num_frames if with_depth else 0)
        self.multiframe_net = nn.Sequential(
            nn.Conv2d(in_c, tc, 11, padding=5, bias=False),
            nn.BatchNorm2d(tc),
            nn.ReLU(),
            nn.Conv2d(tc, tc, 3, padding=1, bias=False),
            nn.BatchNorm2d(tc),
            nn.ReLU(),
            nn.Conv2d(tc, tc, 3, padding=1, bias=False),
            nn.BatchNorm2d(tc),
            nn.ReLU(),
            nn.Conv2d(tc, num_classes, 1, bias=False),
        )

    def forward(self, x):
        return self.multiframe_net(x)


class TernausNetMultiBasicTorch(nn.Module):
    """Oracle for reference models/multiframe_model.py:207-238."""

    def __init__(self, num_classes, num_frames, width_mult=1.0,
                 with_depth=False):
        super().__init__()
        self.base_model = TernausNet16Torch(
            num_classes, num_filters=64 if width_mult == 1.0 else 8,
            width_mult=width_mult,
        )
        self.multiframe_net = MultiFrameNetBasicTorch(
            num_classes, num_frames, with_depth
        )

    def forward(self, frames, depth=None):
        ys = [self.base_model(f).exp() for f in frames]
        if depth is not None:
            ys += list(depth)
        return self.multiframe_net(torch.cat(ys, dim=1))


class MultiFrameNetBasicFlowTorch(nn.Module):
    """Oracle for the flow-warping Basic head (reference
    models/multiframe_model.py:51-185): input channels
    [N*K seg][2(K-1) flow][K depth]; frames 1..K-1's seg+depth warped by
    their flow over the fixed 576x720 cropped grid; flow channels dropped
    before the head."""

    def __init__(self, num_classes, num_frames, with_depth=True):
        super().__init__()
        self.N, self.K = num_classes, num_frames
        self.with_depth = with_depth
        tc = num_frames * num_classes
        in_c = tc + (num_frames if with_depth else 0)
        self.multiframe_net = MultiFrameNetBasicTorch(
            num_classes, num_frames, with_depth
        ).multiframe_net
        import numpy as np

        GH, GW = 576, 720
        y, x = np.meshgrid(np.arange(GH), np.arange(GW), indexing="ij")
        gy = 2.0 * y / (GH - 1) - 1.0
        gx = 2.0 * x / (GW - 1) - 1.0
        self.register_buffer(
            "grid",
            torch.from_numpy(
                np.stack([gx, gy], axis=0)[None].astype("float32")
            ),
        )

    def _warp(self, maps, flow):
        _, _, H, W = maps.shape
        grid = self.grid[:, :, :H, :W]
        fx = flow[:, 0] / ((W - 1) / 2.0)
        fy = flow[:, 1] / ((H - 1) / 2.0)
        new_grid = (grid + torch.stack([fx, fy], 1)).permute(0, 2, 3, 1)
        return F.grid_sample(
            maps, new_grid, mode="bilinear", padding_mode="zeros",
            align_corners=True,
        )

    def forward(self, x):
        N, K = self.N, self.K
        seg = x[:, : N * K]
        flow = x[:, N * K : N * K + 2 * K - 2]
        depth = x[:, N * K + 2 * K - 2 :] if self.with_depth else None
        warped_seg = [seg[:, 0:N]]
        warped_depth = [depth[:, 0:1]] if self.with_depth else []
        for i in range(1, K):
            f = flow[:, 2 * (i - 1) : 2 * i]
            # reference warps each channel separately; per-channel vs
            # channel-batched grid_sample are identical
            warped_seg.append(self._warp(seg[:, i * N : (i + 1) * N], f))
            if self.with_depth:
                warped_depth.append(self._warp(depth[:, i : i + 1], f))
        parts = warped_seg + warped_depth
        return self.multiframe_net(torch.cat(parts, 1))
