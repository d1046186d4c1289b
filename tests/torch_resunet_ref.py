"""Pure-torch ResUnet_VB oracle with the reference's module naming
(/root/reference/models/resunet.py:97-180): weight-standardized convs +
GroupNorm + SiLU ResNet blocks, pixel-unshuffle (einops Rearrange)
downsample, nearest-2x upsample."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class WeightStandardizedConv2d(nn.Conv2d):
    def forward(self, x):
        eps = 1e-5 if x.dtype == torch.float32 else 1e-3
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        w = (w - mean) * (var + eps).rsqrt()
        return F.conv2d(x, w, self.bias, self.stride, self.padding,
                        self.dilation, self.groups)


class BlockT(nn.Module):
    def __init__(self, dim, dim_out, groups=8):
        super().__init__()
        self.proj = WeightStandardizedConv2d(dim, dim_out, 3, padding=1)
        self.norm = nn.GroupNorm(groups, dim_out)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.norm(self.proj(x)))


class ResnetBlockT(nn.Module):
    def __init__(self, dim, dim_out, groups=8):
        super().__init__()
        self.block1 = BlockT(dim, dim_out, groups)
        self.block2 = BlockT(dim_out, dim_out, groups)
        self.res_conv = (
            nn.Conv2d(dim, dim_out, 1) if dim != dim_out else nn.Identity()
        )

    def forward(self, x):
        return self.block2(self.block1(x)) + self.res_conv(x)


class _PixelUnshuffle(nn.Module):
    """einops Rearrange('b c (h p1) (w p2) -> b (c p1 p2) h w', p1=p2=2)."""

    def forward(self, x):
        b, c, H, W = x.shape
        x = x.view(b, c, H // 2, 2, W // 2, 2)
        x = x.permute(0, 1, 3, 5, 2, 4).contiguous()
        return x.view(b, c * 4, H // 2, W // 2)


def _upsample(dim, dim_out):
    return nn.Sequential(
        nn.Upsample(scale_factor=2, mode="nearest"),
        nn.Conv2d(dim, dim_out, 3, padding=1),
    )


def _downsample(dim, dim_out):
    return nn.Sequential(_PixelUnshuffle(), nn.Conv2d(dim * 4, dim_out, 1))


class ResUnetVBTorch(nn.Module):
    def __init__(self, channels=3, dim=16, out_dim=1, dim_mults=(1, 2, 4, 8),
                 groups=8):
        super().__init__()
        self.init_conv = nn.Conv2d(channels, dim, 7, padding=3)
        dims = [dim] + [dim * m for m in dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n = len(in_out)
        self.downs = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        ResnetBlockT(d_in, d_in, groups),
                        _downsample(d_in, d_out)
                        if i < n - 1
                        else nn.Conv2d(d_in, d_out, 3, padding=1),
                    ]
                )
                for i, (d_in, d_out) in enumerate(in_out)
            ]
        )
        self.mid_block = ResnetBlockT(dims[-1], dims[-1], groups)
        self.ups = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        ResnetBlockT(d_out + d_in, d_out, groups),
                        _upsample(d_out, d_in)
                        if i < n - 1
                        else nn.Conv2d(d_out, d_in, 3, padding=1),
                    ]
                )
                for i, (d_in, d_out) in enumerate(reversed(in_out))
            ]
        )
        self.final_res_block = ResnetBlockT(dim * 2, dim, groups)
        self.output_layer = nn.Conv2d(dim, out_dim, 1, bias=True)

    def forward(self, x):
        x = self.init_conv(x)
        r = x.clone()
        h = []
        for block, down in self.downs:
            x = block(x)
            h.append(x)
            x = down(x)
        x = self.mid_block(x)
        for block, up in self.ups:
            x = torch.cat((x, h.pop()), dim=1)
            x = block(x)
            x = up(x)
        x = torch.cat((x, r), dim=1)
        x = self.final_res_block(x)
        return self.output_layer(x)
