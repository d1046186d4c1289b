"""SegFormer (MiT-B3 encoder + MLP decoder).

Behavioral equivalent of the reference's
``segmentation_models_pytorch.Segformer(encoder_name='mit_b3',
activation='logsoftmax')`` (reference: models/__init__.py:47-49): a
Mix-Transformer encoder (overlapped patch embeds, efficient attention with
spatial reduction, Mix-FFN with depthwise conv) and the SegFormer all-MLP
decoder, emitting log-probabilities at input resolution.

TPU notes: attention runs at stage resolutions (1/4 .. 1/32) with
spatial-reduction ratios (8, 4, 2, 1) so K/V sequence lengths stay small;
all matmuls are batched (B*heads) and MXU-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mfcnet_tpu.ops.resize import resize_bilinear


class OverlapPatchEmbed(nn.Module):
    features: int
    patch: int
    stride: int

    @nn.compact
    def __call__(self, x):
        p = self.patch
        x = nn.Conv(
            self.features, (p, p), strides=(self.stride, self.stride),
            padding=((p // 2, p // 2), (p // 2, p // 2)),
        )(x)
        # mix_transformer OverlapPatchEmbed.norm is a default-eps LayerNorm
        # (1e-5), unlike the block norms built with eps=1e-6
        return nn.LayerNorm(epsilon=1e-5)(x)


class EfficientAttention(nn.Module):
    dim: int
    heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = self.heads
        q = nn.Dense(C, name="q")(x).reshape(B, H * W, h, C // h)
        kv_in = x
        if self.sr_ratio > 1:
            r = self.sr_ratio
            kv_in = nn.Conv(
                C, (r, r), strides=(r, r), name="sr"
            )(x)
            # Attention.norm uses torch's default LayerNorm eps (1e-5)
            kv_in = nn.LayerNorm(epsilon=1e-5, name="sr_norm")(kv_in)
        N = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * C, name="kv")(kv_in).reshape(B, N, 2, h, C // h)
        k, v = kv[:, :, 0], kv[:, :, 1]
        scale = (C // h) ** -0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, C)
        return nn.Dense(C, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        hidden = self.dim * self.expansion
        y = nn.Dense(hidden, name="fc1")(x)
        y = nn.Conv(
            hidden, (3, 3), padding="SAME",
            feature_group_count=hidden, name="dwconv",
        )(y)
        # torch nn.GELU defaults to the exact erf form
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, name="fc2")(y)


def _drop_path(x, rate: float, deterministic: bool, rng):
    """Stochastic depth (timm DropPath): drop the residual branch per
    SAMPLE with prob ``rate`` and rescale by 1/keep. mit_b3 trains with
    drop_path_rate=0.1 linearly increasing over blocks (smp encoder
    params); identity at eval."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class MiTBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        def dp(y):
            if self.drop_path == 0.0 or deterministic:
                return y
            return _drop_path(
                y, self.drop_path, deterministic,
                self.make_rng("dropout"),
            )

        y = nn.LayerNorm(epsilon=1e-6)(x)
        x = x + dp(
            EfficientAttention(self.dim, self.heads, self.sr_ratio)(y)
        )
        y = nn.LayerNorm(epsilon=1e-6)(x)
        return x + dp(MixFFN(self.dim)(y))


class MiTEncoder(nn.Module):
    """mit_b3: dims (64,128,320,512), depths (3,4,18,3), heads (1,2,5,8),
    sr (8,4,2,1)."""

    dims: tuple = (64, 128, 320, 512)
    depths: tuple = (3, 4, 18, 3)
    heads: tuple = (1, 2, 5, 8)
    sr_ratios: tuple = (8, 4, 2, 1)
    drop_path_rate: float = 0.1  # smp mit_b3 encoder param

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        total = sum(self.depths)
        rates = [
            self.drop_path_rate * i / max(total - 1, 1)
            for i in range(total)
        ]
        cur = 0
        feats = []
        for si in range(4):
            patch, stride = (7, 4) if si == 0 else (3, 2)
            x = OverlapPatchEmbed(
                self.dims[si], patch, stride, name=f"embed{si + 1}"
            )(x)
            for bi in range(self.depths[si]):
                x = MiTBlock(
                    self.dims[si],
                    self.heads[si],
                    self.sr_ratios[si],
                    drop_path=rates[cur],
                    name=f"stage{si + 1}_block{bi}",
                )(x, deterministic=deterministic)
                cur += 1
            x = nn.LayerNorm(epsilon=1e-6, name=f"norm{si + 1}")(x)
            feats.append(x)
        return feats


class SegFormerMiTB3(nn.Module):
    num_classes: int
    decoder_dim: int = 256
    dims: tuple = (64, 128, 320, 512)
    depths: tuple = (3, 4, 18, 3)
    heads: tuple = (1, 2, 5, 8)
    sr_ratios: tuple = (8, 4, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[-3], x.shape[-2]
        feats = MiTEncoder(
            self.dims, self.depths, self.heads, self.sr_ratios,
            name="encoder",
        )(x, deterministic=not train)
        h4, w4 = feats[0].shape[-3], feats[0].shape[-2]
        proj = []
        for i, f in enumerate(feats):
            y = nn.Dense(self.decoder_dim, name=f"linear_c{i + 1}")(f)
            y = resize_bilinear(y, h4, w4, align_corners=False)
            proj.append(y)
        y = jnp.concatenate(proj[::-1], axis=-1)
        y = nn.Conv(
            self.decoder_dim, (1, 1), use_bias=False, name="fuse"
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="fuse_bn",
        )(y)
        y = nn.relu(y)
        # smp SegmentationHead: Conv3x3 then UpsamplingBilinear2d(4)
        # (align_corners=True), then the 'logsoftmax' activation
        # (reference models/__init__.py:49)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         name="pred")(y)
        logits = resize_bilinear(logits, H, W, align_corners=True)
        return jax.nn.log_softmax(logits, axis=-1)
