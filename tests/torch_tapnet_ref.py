"""Pure-torch TAPNet16 oracle with the reference's module naming
(models/tap_model.py), width-scalable for conversion parity tests."""

from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_ref import vgg16_features


class Conv2dReLU(nn.Module):
    def __init__(self, in_c, out_c, kernel=3, padding=1):
        super().__init__()
        self.l = nn.Sequential(OrderedDict([
            ("conv", nn.Conv2d(in_c, out_c, kernel, padding=padding)),
            ("relu", nn.ReLU(inplace=True)),
        ]))

    def forward(self, x):
        return self.l(x)


class Interpolate(nn.Module):
    def forward(self, x):
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=False)


class DecoderModule(nn.Module):
    def __init__(self, in_c, mid_c, out_c):
        super().__init__()
        self.l = nn.Sequential(OrderedDict([
            ("interpolate", Interpolate()),
            ("conv1", Conv2dReLU(in_c, mid_c)),
            ("conv2", Conv2dReLU(mid_c, out_c)),
        ]))

    def forward(self, x):
        return self.l(x)


class AttentionModule(nn.Module):
    def __init__(self, in_c, out_c, scale_factor):
        super().__init__()
        self.scale_factor = scale_factor
        self.firstconv = Conv2dReLU(in_c, out_c)
        self.learnable_attmap = nn.Sequential(
            Conv2dReLU(out_c, 1, 1, padding=0), nn.Sigmoid()
        )

    def forward(self, x, attmap):
        if self.scale_factor != 1:
            attmap = F.interpolate(
                attmap, scale_factor=self.scale_factor, mode="bilinear",
                align_corners=False,
            )
        x = self.firstconv(x)
        out = x + x * attmap
        return out, self.learnable_attmap(out)


class TAPNet16Torch(nn.Module):
    """Structural oracle for reference models/tap_model.py:237-298."""

    def __init__(self, num_classes, width_mult=1.0):
        super().__init__()
        self.num_classes = num_classes
        self.vgg16 = vgg16_features(width_mult)
        self.maxpool = nn.MaxPool2d(2, stride=2)
        v = self.vgg16
        self.conv1 = v[0:4]
        self.conv2 = v[5:9]
        self.conv3 = v[10:16]
        self.conv4 = v[17:23]
        self.conv5 = v[24:30]
        self.upsample = Interpolate()

        def c(n):
            return max(1, int(n * width_mult))

        self.center = DecoderModule(c(512), c(512), c(256))
        self.dec5 = DecoderModule(c(256) + c(512), c(512), c(256))
        self.dec4 = DecoderModule(c(256) + c(512), c(512), c(256))
        self.dec3 = DecoderModule(c(128) + c(256), c(256), c(64))
        self.dec2 = DecoderModule(c(64) + c(128), c(128), c(32))
        self.dec1 = Conv2dReLU(c(32) + c(64), c(32))

        self.att5 = AttentionModule(c(256) + c(512), c(256) + c(512), 1 / 16)
        self.att4 = AttentionModule(c(256) + c(512), c(256) + c(512), 1)
        self.att3 = AttentionModule(c(256) + c(256), c(128) + c(256), 1)
        self.att2 = AttentionModule(c(64) + c(128), c(64) + c(128), 1)
        self.att1 = AttentionModule(c(32) + c(64), c(32) + c(64), 1)
        self.final = nn.Conv2d(c(32), num_classes, 1)

    def forward(self, x, attmap):
        conv1 = self.conv1(x)
        conv2 = self.conv2(self.maxpool(conv1))
        conv3 = self.conv3(self.maxpool(conv2))
        conv4 = self.conv4(self.maxpool(conv3))
        conv5 = self.conv5(self.maxpool(conv4))
        center = self.center(self.maxpool(conv5))

        att5, a5 = self.att5(torch.cat([center, conv5], 1), attmap)
        dec5 = self.dec5(att5)
        att4, a4 = self.att4(torch.cat([dec5, conv4], 1), self.upsample(a5))
        dec4 = self.dec4(att4)
        att3, a3 = self.att3(torch.cat([dec4, conv3], 1), self.upsample(a4))
        dec3 = self.dec3(att3)
        att2, a2 = self.att2(torch.cat([dec3, conv2], 1), self.upsample(a3))
        dec2 = self.dec2(att2)
        att1, a1 = self.att1(torch.cat([dec2, conv1], 1), self.upsample(a2))
        dec1 = self.dec1(att1)
        out = self.final(dec1)
        if self.num_classes > 1:
            out = F.log_softmax(out, dim=1)
        return out
