"""Pure-torch SegFormer oracle with segmentation_models_pytorch naming.

The reference builds ``smp.Segformer(encoder_name='mit_b3',
encoder_weights='imagenet', classes=N, activation='logsoftmax')``
(/root/reference/models/__init__.py:6,47-49). smp is not installed here, so
this file re-creates that model with the EXACT state_dict key layout:

  * encoder.* — smp's vendored NVlabs MixVisionTransformer
    (patch_embed{1-4}.{proj,norm}, block{s}.{i}.{norm1,attn.{q,kv,proj,
    sr,norm},norm2,mlp.{fc1,dwconv.dwconv,fc2}}, norm{1-4})
  * decoder.* — smp SegformerDecoder (mlp_stage.{0-3}.linear,
    fuse_stage.{0,1} Conv2dReLU)
  * segmentation_head.0 — 3x3 conv, then UpsamplingBilinear2d(4) and
    LogSoftmax (parameter-free)

Shrinkable via ``dims``/``heads``/``decoder_dim`` while keeping the real
mit_b3 depths (3, 4, 18, 3) so every checkpoint key name is exercised.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class OverlapPatchEmbedT(nn.Module):
    def __init__(self, in_chans, embed_dim, patch_size, stride):
        super().__init__()
        self.proj = nn.Conv2d(
            in_chans, embed_dim, patch_size, stride,
            (patch_size // 2, patch_size // 2),
        )
        self.norm = nn.LayerNorm(embed_dim)  # default eps 1e-5

    def forward(self, x):
        x = self.proj(x)
        _, _, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        return self.norm(x), H, W


class AttentionT(nn.Module):
    def __init__(self, dim, num_heads, sr_ratio):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.q = nn.Linear(dim, dim, bias=True)  # mit_b* use qkv_bias=True
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, sr_ratio)
            self.norm = nn.LayerNorm(dim)  # default eps 1e-5

    def forward(self, x, H, W):
        B, N, C = x.shape
        h = self.num_heads
        q = self.q(x).reshape(B, N, h, C // h).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x_ = x.permute(0, 2, 1).reshape(B, C, H, W)
            x_ = self.sr(x_).reshape(B, C, -1).permute(0, 2, 1)
            x_ = self.norm(x_)
            kv = self.kv(x_)
        else:
            kv = self.kv(x)
        kv = kv.reshape(B, -1, 2, h, C // h).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class DWConvT(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, bias=True, groups=dim)

    def forward(self, x, H, W):
        B, N, C = x.shape
        x = x.transpose(1, 2).view(B, C, H, W)
        x = self.dwconv(x)
        return x.flatten(2).transpose(1, 2)


class MlpT(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = DWConvT(hidden)
        self.act = nn.GELU()  # exact erf
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W):
        return self.fc2(self.act(self.dwconv(self.fc1(x), H, W)))


class BlockT(nn.Module):
    def __init__(self, dim, num_heads, sr_ratio, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = AttentionT(dim, num_heads, sr_ratio)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MlpT(dim, dim * mlp_ratio)

    def forward(self, x, H, W):
        x = x + self.attn(self.norm1(x), H, W)
        return x + self.mlp(self.norm2(x), H, W)


class MixVisionTransformerT(nn.Module):
    """Encoder with smp/NVlabs key layout (attribute names are the keys)."""

    def __init__(self, dims, heads, depths, sr_ratios, in_chans=3):
        super().__init__()
        self.depths = depths
        self.patch_embed1 = OverlapPatchEmbedT(in_chans, dims[0], 7, 4)
        self.patch_embed2 = OverlapPatchEmbedT(dims[0], dims[1], 3, 2)
        self.patch_embed3 = OverlapPatchEmbedT(dims[1], dims[2], 3, 2)
        self.patch_embed4 = OverlapPatchEmbedT(dims[2], dims[3], 3, 2)
        for s in range(4):
            blocks = nn.ModuleList(
                [
                    BlockT(dims[s], heads[s], sr_ratios[s])
                    for _ in range(depths[s])
                ]
            )
            setattr(self, f"block{s + 1}", blocks)
            setattr(self, f"norm{s + 1}", nn.LayerNorm(dims[s], eps=1e-6))

    def forward_features(self, x):
        B = x.shape[0]
        outs = []
        for s in range(4):
            x, H, W = getattr(self, f"patch_embed{s + 1}")(x)
            for blk in getattr(self, f"block{s + 1}"):
                x = blk(x, H, W)
            x = getattr(self, f"norm{s + 1}")(x)
            x = x.reshape(B, H, W, -1).permute(0, 3, 1, 2).contiguous()
            outs.append(x)
        return outs


class DecoderMLPT(nn.Module):
    def __init__(self, skip_channels, segmentation_channels):
        super().__init__()
        self.linear = nn.Linear(skip_channels, segmentation_channels)

    def forward(self, x):
        b, _, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.linear(x)
        return x.transpose(1, 2).reshape(b, -1, h, w)


class SegformerTorch(nn.Module):
    """smp.Segformer(mit_b3-style encoder, activation='logsoftmax')."""

    def __init__(self, num_classes, dims=(64, 128, 320, 512),
                 heads=(1, 2, 5, 8), depths=(3, 4, 18, 3),
                 sr_ratios=(8, 4, 2, 1), decoder_dim=256):
        super().__init__()
        self.encoder = MixVisionTransformerT(dims, heads, depths, sr_ratios)
        self.decoder = nn.Module()
        self.decoder.mlp_stage = nn.ModuleList(
            [DecoderMLPT(c, decoder_dim) for c in dims[::-1]]
        )
        self.decoder.fuse_stage = nn.Sequential(
            nn.Conv2d(4 * decoder_dim, decoder_dim, 1, bias=False),
            nn.BatchNorm2d(decoder_dim),
            nn.ReLU(inplace=True),
        )
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(decoder_dim, num_classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=4),
            nn.LogSoftmax(dim=1),
        )

    def forward(self, x):
        target_size = [d // 4 for d in x.shape[2:]]
        feats = self.encoder.forward_features(x)[::-1]  # c4..c1
        resized = []
        for f, mlp in zip(feats, self.decoder.mlp_stage):
            y = mlp(f)
            resized.append(
                F.interpolate(y, size=target_size, mode="bilinear",
                              align_corners=False)
            )
        out = self.decoder.fuse_stage(torch.cat(resized, dim=1))
        return self.segmentation_head(out)
