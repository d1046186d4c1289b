"""Pure-torch UnFlow oracle with reference checkpoint key naming.

Rebuilds the reference's UnFlow (models/unflow_model.py) with plain
torch.nn so tests can generate authentic ``moduleFlownets.*`` state_dicts
and compare forwards against the Flax implementation. The correlation is a
direct shift-based CPU implementation of the reference's CUDA kernel
semantics (models/unflow_correlation.py:37-104).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def torch_correlation(first, second, md=20, stride=2):
    """(B, C, H, W) x2 -> (B, 441, H, W), tc = dy_idx*21 + dx_idx."""
    B, C, H, W = first.shape
    D = 2 * (md // stride) + 1
    second_p = F.pad(second, (md, md, md, md))
    outs = []
    for dyi in range(D):
        dy = (dyi - D // 2) * stride
        for dxi in range(D):
            dx = (dxi - D // 2) * stride
            win = second_p[:, :, md + dy : md + dy + H,
                           md + dx : md + dx + W]
            outs.append((first * win).mean(dim=1))
    return torch.stack(outs, dim=1)


def _backward_warp(img, flow):
    B, C, H, W = img.shape
    xs = torch.linspace(-1.0, 1.0, W).view(1, 1, 1, W).expand(B, 1, H, W)
    ys = torch.linspace(-1.0, 1.0, H).view(1, 1, H, 1).expand(B, 1, H, W)
    grid = torch.cat([xs, ys], 1)
    f = torch.cat(
        [flow[:, 0:1] / ((W - 1) / 2.0), flow[:, 1:2] / ((H - 1) / 2.0)], 1
    )
    return F.grid_sample(
        img, (grid + f).permute(0, 2, 3, 1), mode="bilinear",
        padding_mode="border", align_corners=False,
    )


def _lrelu():
    return nn.LeakyReLU(inplace=False, negative_slope=0.1)


class UpconvTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.moduleSixOut = nn.Conv2d(1024, 2, 3, 1, 1)
        self.moduleSixUp = nn.ConvTranspose2d(2, 2, 4, 2, 1)
        self.moduleFivNext = nn.Sequential(
            nn.ConvTranspose2d(1024, 512, 4, 2, 1), _lrelu()
        )
        self.moduleFivOut = nn.Conv2d(1026, 2, 3, 1, 1)
        self.moduleFivUp = nn.ConvTranspose2d(2, 2, 4, 2, 1)
        self.moduleFouNext = nn.Sequential(
            nn.ConvTranspose2d(1026, 256, 4, 2, 1), _lrelu()
        )
        self.moduleFouOut = nn.Conv2d(770, 2, 3, 1, 1)
        self.moduleFouUp = nn.ConvTranspose2d(2, 2, 4, 2, 1)
        self.moduleThrNext = nn.Sequential(
            nn.ConvTranspose2d(770, 128, 4, 2, 1), _lrelu()
        )
        self.moduleThrOut = nn.Conv2d(386, 2, 3, 1, 1)
        self.moduleThrUp = nn.ConvTranspose2d(2, 2, 4, 2, 1)
        self.moduleTwoNext = nn.Sequential(
            nn.ConvTranspose2d(386, 64, 4, 2, 1), _lrelu()
        )
        self.moduleTwoOut = nn.Conv2d(194, 2, 3, 1, 1)
        self.moduleUpscale = nn.Sequential(
            nn.ConvTranspose2d(2, 2, 3, 2, 1, bias=False),
            nn.ReplicationPad2d([0, 1, 0, 1]),
        )

    def forward(self, feats):
        x = feats["conv6"]
        flow6 = self.moduleSixOut(x)
        x = torch.cat(
            [feats["conv5"], self.moduleFivNext(x), self.moduleSixUp(flow6)],
            1,
        )
        flow5 = self.moduleFivOut(x)
        x = torch.cat(
            [feats["conv4"], self.moduleFouNext(x), self.moduleFivUp(flow5)],
            1,
        )
        flow4 = self.moduleFouOut(x)
        x = torch.cat(
            [feats["conv3"], self.moduleThrNext(x), self.moduleFouUp(flow4)],
            1,
        )
        flow3 = self.moduleThrOut(x)
        x = torch.cat(
            [feats["conv2"], self.moduleTwoNext(x), self.moduleThrUp(flow3)],
            1,
        )
        flow2 = self.moduleTwoOut(x)
        return self.moduleUpscale(self.moduleUpscale(flow2)) * 20.0


class ComplexTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.moduleOne = nn.Sequential(
            nn.ZeroPad2d([2, 4, 2, 4]), nn.Conv2d(3, 64, 7, 2, 0), _lrelu()
        )
        self.moduleTwo = nn.Sequential(
            nn.ZeroPad2d([1, 3, 1, 3]), nn.Conv2d(64, 128, 5, 2, 0), _lrelu()
        )
        self.moduleThr = nn.Sequential(
            nn.ZeroPad2d([1, 3, 1, 3]), nn.Conv2d(128, 256, 5, 2, 0),
            _lrelu(),
        )
        self.moduleRedir = nn.Sequential(
            nn.Conv2d(256, 32, 1, 1, 0), _lrelu()
        )
        self.moduleCombined = nn.Sequential(
            nn.Conv2d(473, 256, 3, 1, 1), _lrelu()
        )

        def down(cin, cout):
            return nn.Sequential(
                nn.ZeroPad2d([0, 2, 0, 2]), nn.Conv2d(cin, cout, 3, 2, 0),
                _lrelu(), nn.Conv2d(cout, cout, 3, 1, 1), _lrelu(),
            )

        self.moduleFou = down(256, 512)
        self.moduleFiv = down(512, 512)
        self.moduleSix = down(512, 1024)
        self.moduleUpconv = UpconvTorch()

    def forward(self, first, second, flow):
        feats = {}
        c1 = self.moduleOne(first)
        c2 = self.moduleTwo(c1)
        c3 = self.moduleThr(c2)
        redir = self.moduleRedir(c3)
        other = self.moduleThr(self.moduleTwo(self.moduleOne(second)))
        corr = torch_correlation(c3, other)
        feats["conv2"] = c2
        feats["conv3"] = self.moduleCombined(torch.cat([redir, corr], 1))
        feats["conv4"] = self.moduleFou(feats["conv3"])
        feats["conv5"] = self.moduleFiv(feats["conv4"])
        feats["conv6"] = self.moduleSix(feats["conv5"])
        return self.moduleUpconv(feats)


class SimpleTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.moduleOne = nn.Sequential(
            nn.ZeroPad2d([2, 4, 2, 4]), nn.Conv2d(14, 64, 7, 2, 0), _lrelu()
        )
        self.moduleTwo = nn.Sequential(
            nn.ZeroPad2d([1, 3, 1, 3]), nn.Conv2d(64, 128, 5, 2, 0), _lrelu()
        )
        self.moduleThr = nn.Sequential(
            nn.ZeroPad2d([1, 3, 1, 3]), nn.Conv2d(128, 256, 5, 2, 0),
            _lrelu(), nn.Conv2d(256, 256, 3, 1, 1), _lrelu(),
        )

        def down(cin, cout):
            return nn.Sequential(
                nn.ZeroPad2d([0, 2, 0, 2]), nn.Conv2d(cin, cout, 3, 2, 0),
                _lrelu(), nn.Conv2d(cout, cout, 3, 1, 1), _lrelu(),
            )

        self.moduleFou = down(256, 512)
        self.moduleFiv = down(512, 512)
        self.moduleSix = down(512, 1024)
        self.moduleUpconv = UpconvTorch()

    def forward(self, first, second, flow):
        warp = _backward_warp(second, flow)
        feats = {}
        x = torch.cat(
            [first, second, flow, warp, (first - warp).abs()], 1
        )
        feats["conv2"] = self.moduleTwo(self.moduleOne(x))
        feats["conv3"] = self.moduleThr(feats["conv2"])
        feats["conv4"] = self.moduleFou(feats["conv3"])
        feats["conv5"] = self.moduleFiv(feats["conv4"])
        feats["conv6"] = self.moduleSix(feats["conv5"])
        return self.moduleUpconv(feats)


class UnFlowTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.moduleFlownets = nn.ModuleList(
            [ComplexTorch(), SimpleTorch(), SimpleTorch()]
        )

    def forward(self, first, second):
        first = first[:, [2, 1, 0]].clone()
        second = second[:, [2, 1, 0]].clone()
        means = [104.920005 / 255.0, 110.175300 / 255.0, 114.785955 / 255.0]
        for c in range(3):
            first[:, c] = first[:, c] - means[c]
            second[:, c] = second[:, c] - means[c]
        flow = None
        for net in self.moduleFlownets:
            flow = net(first, second, flow)
        return flow
