"""Pure-torch HRNet oracle with the reference's module naming
(models/hrnet.py), shrinkable for conversion parity tests."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class BottleneckT(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(y + r)


class BasicBlockT(nn.Module):
    expansion = 1

    def __init__(self, planes):
        super().__init__()
        self.conv1 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + x)


class HRModuleT(nn.Module):
    def __init__(self, channels, num_blocks=4):
        super().__init__()
        n = len(channels)
        self.branches = nn.ModuleList(
            [
                nn.Sequential(
                    *[BasicBlockT(channels[i]) for _ in range(num_blocks)]
                )
                for i in range(n)
            ]
        )
        fuse_layers = []
        for i in range(n):
            layer = []
            for j in range(n):
                if j > i:
                    layer.append(
                        nn.Sequential(
                            nn.Conv2d(channels[j], channels[i], 1, 1, 0,
                                      bias=False),
                            nn.BatchNorm2d(channels[i]),
                        )
                    )
                elif j == i:
                    layer.append(None)
                else:
                    convs = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_c = channels[i] if last else channels[j]
                        seq = [
                            nn.Conv2d(channels[j], out_c, 3, 2, 1,
                                      bias=False),
                            nn.BatchNorm2d(out_c),
                        ]
                        if not last:
                            seq.append(nn.ReLU(inplace=True))
                        convs.append(nn.Sequential(*seq))
                    layer.append(nn.Sequential(*convs))
            fuse_layers.append(nn.ModuleList(layer))
        self.fuse_layers = nn.ModuleList(fuse_layers)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, xs):
        xs = [br(x) for br, x in zip(self.branches, xs)]
        outs = []
        for i, layer in enumerate(self.fuse_layers):
            y = xs[0] if i == 0 else layer[0](xs[0])
            for j in range(1, len(xs)):
                if j == i:
                    y = y + xs[j]
                elif j > i:
                    y = y + F.interpolate(
                        layer[j](xs[j]), size=xs[i].shape[-2:],
                        mode="bilinear", align_corners=False,
                    )
                else:
                    y = y + layer[j](xs[j])
            outs.append(self.relu(y))
        return outs


class HRNetTorch(nn.Module):
    """Structural oracle for reference models/hrnet.py:271-476."""

    def __init__(self, num_classes, channels=(8, 16, 32, 64),
                 stage_modules=(1, 2, 1), num_blocks=2, stage1_width=8):
        super().__init__()
        self.num_blocks = num_blocks
        w = stage1_width
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)

        down = nn.Sequential(
            nn.Conv2d(64, w * 4, 1, 1, bias=False), nn.BatchNorm2d(w * 4)
        )
        blocks = [BottleneckT(64, w, 1, down)]
        for _ in range(3):
            blocks.append(BottleneckT(w * 4, w))
        self.layer1 = nn.Sequential(*blocks)
        s1_out = w * 4

        ch = channels
        self.transition1 = nn.ModuleList([
            nn.Sequential(
                nn.Conv2d(s1_out, ch[0], 3, 1, 1, bias=False),
                nn.BatchNorm2d(ch[0]), nn.ReLU(inplace=True),
            ),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(s1_out, ch[1], 3, 2, 1, bias=False),
                nn.BatchNorm2d(ch[1]), nn.ReLU(inplace=True),
            )),
        ])
        self.stage2 = nn.Sequential(*[
            HRModuleT(ch[:2], num_blocks) for _ in range(stage_modules[0])
        ])
        self.transition2 = nn.ModuleList([None, None, nn.Sequential(
            nn.Sequential(
                nn.Conv2d(ch[1], ch[2], 3, 2, 1, bias=False),
                nn.BatchNorm2d(ch[2]), nn.ReLU(inplace=True),
            )
        )])
        self.stage3 = nn.Sequential(*[
            HRModuleT(ch[:3], num_blocks) for _ in range(stage_modules[1])
        ])
        self.transition3 = nn.ModuleList([None, None, None, nn.Sequential(
            nn.Sequential(
                nn.Conv2d(ch[2], ch[3], 3, 2, 1, bias=False),
                nn.BatchNorm2d(ch[3]), nn.ReLU(inplace=True),
            )
        )])
        self.stage4 = nn.Sequential(*[
            HRModuleT(ch[:4], num_blocks) for _ in range(stage_modules[2])
        ])
        total = sum(ch)
        self.last_layer = nn.Sequential(
            nn.Conv2d(total, total, 1, 1, 0),
            nn.BatchNorm2d(total),
            nn.ReLU(inplace=True),
            nn.Conv2d(total, num_classes, 1, 1, 0),
        )

    def forward(self, x):
        H, W = x.shape[-2:]
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [self.transition1[0](x), self.transition1[1](x)]
        for m in self.stage2:
            xs = m(xs)
        xs = xs + [self.transition2[2](xs[-1])]
        for m in self.stage3:
            xs = m(xs)
        xs = xs + [self.transition3[3](xs[-1])]
        for m in self.stage4:
            xs = m(xs)
        h0, w0 = xs[0].shape[-2:]
        ups = [xs[0]] + [
            F.interpolate(t, size=(h0, w0), mode="bilinear",
                          align_corners=False)
            for t in xs[1:]
        ]
        y = self.last_layer(torch.cat(ups, 1))
        return F.interpolate(y, size=(H, W), mode="bilinear",
                             align_corners=False)
