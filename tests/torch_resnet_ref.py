"""Pure-torch dilated-ResNet + FCN/DeepLab head oracles with torchvision
state_dict naming (torchvision is not installed; these replicate its
module structure for conversion parity tests)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class DilatedResNet(nn.Module):
    """torchvision resnet with replace_stride_with_dilation=[F, T, T]."""

    def __init__(self, layers, width=64):
        super().__init__()
        self.inplanes = width
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2,
                                       dilate=True)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2,
                                       dilate=True)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride,
                             previous_dilation, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(
                Bottleneck(self.inplanes, planes, 1, self.dilation)
            )
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


class FCNHeadTorch(nn.Sequential):
    def __init__(self, in_ch, channels):
        super().__init__(
            nn.Conv2d(in_ch, in_ch // 4, 3, padding=1, bias=False),
            nn.BatchNorm2d(in_ch // 4),
            nn.ReLU(),
            nn.Dropout(0.1),
            nn.Conv2d(in_ch // 4, channels, 1),
        )


class ASPPPoolingTorch(nn.Sequential):
    def __init__(self, in_ch, out_ch):
        super().__init__(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(in_ch, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(),
        )

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear",
                             align_corners=False)


class ASPPTorch(nn.Module):
    def __init__(self, in_ch, rates, out_ch=256):
        super().__init__()
        mods = [
            nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, bias=False),
                nn.BatchNorm2d(out_ch), nn.ReLU(),
            )
        ]
        for r in rates:
            mods.append(
                nn.Sequential(
                    nn.Conv2d(in_ch, out_ch, 3, padding=r, dilation=r,
                              bias=False),
                    nn.BatchNorm2d(out_ch), nn.ReLU(),
                )
            )
        mods.append(ASPPPoolingTorch(in_ch, out_ch))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(len(mods) * out_ch, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU(), nn.Dropout(0.5),
        )

    def forward(self, x):
        return self.project(torch.cat([m(x) for m in self.convs], dim=1))


class DeepLabHeadTorch(nn.Sequential):
    def __init__(self, in_ch, channels):
        super().__init__(
            ASPPTorch(in_ch, [12, 24, 36]),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256),
            nn.ReLU(),
            nn.Conv2d(256, channels, 1),
        )


class SegModelTorch(nn.Module):
    """torchvision _SimpleSegmentationModel: backbone + classifier +
    bilinear upsample to input size."""

    def __init__(self, head: str, num_classes, layers=(1, 1, 1, 1),
                 width=8):
        super().__init__()
        self.backbone = DilatedResNet(layers, width)
        feat_ch = width * 8 * 4
        if head == "fcn":
            self.classifier = FCNHeadTorch(feat_ch, num_classes)
        else:
            self.classifier = DeepLabHeadTorch(feat_ch, num_classes)

    def forward(self, x):
        size = x.shape[-2:]
        y = self.classifier(self.backbone(x))
        return F.interpolate(y, size=size, mode="bilinear",
                             align_corners=False)
