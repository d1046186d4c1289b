"""Pure-torch FlowFormer++ oracle (default 'things' path) with the
reference's state_dict naming (/root/reference/models/optical_flow/
flowformerplusplus/): timm twins_svt_large image encoders truncated to 2
stages (encoders.py), PerCostFormer3 CostPerceiverEncoder with RPE+Context
vertical twins attention (encoder.py, twins.py), and the GMA MemoryDecoder
(decoder.py, gru.py, gma.py). timm is not installed here, so the timm
pieces (Twins blocks, Mlp) are re-created with timm's key layout.

Key prefixes produced (matching the reference checkpoint layout after the
'module.' strip): ``feat_encoder.svt.*`` is nested under
``memory_encoder.``; ``context_encoder.svt.*``;
``memory_encoder.cost_perceiver_encoder.*``; ``memory_decoder.*``.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def coords_grid(batch, ht, wd):
    coords = torch.meshgrid(torch.arange(ht), torch.arange(wd),
                            indexing="ij")
    coords = torch.stack(coords[::-1], dim=0).float()
    return coords[None].repeat(batch, 1, 1, 1)


def LinearPositionEmbeddingSine(x, dim=128, NORMALIZE_FACOR=1 / 200):
    freq_bands = torch.linspace(0, dim // 4 - 1, dim // 4).to(x.device)
    return torch.cat(
        [
            torch.sin(3.14 * x[..., -2:-1] * freq_bands * NORMALIZE_FACOR),
            torch.cos(3.14 * x[..., -2:-1] * freq_bands * NORMALIZE_FACOR),
            torch.sin(3.14 * x[..., -1:] * freq_bands * NORMALIZE_FACOR),
            torch.cos(3.14 * x[..., -1:] * freq_bands * NORMALIZE_FACOR),
        ],
        dim=-1,
    )


class MlpT(nn.Module):
    """timm Mlp naming: fc1/fc2."""

    def __init__(self, dim, ratio=4):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * ratio)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(dim * ratio, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


# ---------------------------------------------------------------------------
# timm twins (image encoders)
# ---------------------------------------------------------------------------
class TimmLSAT(nn.Module):
    def __init__(self, dim, num_heads, ws=7):
        super().__init__()
        self.dim, self.num_heads, self.ws = dim, num_heads, ws
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, size):
        B, N, C = x.shape
        H, W = size
        ws, h = self.ws, self.num_heads
        x = x.view(B, H, W, C)
        pad_r = (ws - W % ws) % ws
        pad_b = (ws - H % ws) % ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        _, Hp, Wp, _ = x.shape
        _h, _w = Hp // ws, Wp // ws
        x = x.reshape(B, _h, ws, _w, ws, C).transpose(2, 3)
        qkv = self.qkv(x).reshape(
            B, _h * _w, ws * ws, 3, h, C // h
        ).permute(3, 0, 1, 4, 2, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        attn = (attn @ v).transpose(2, 3).reshape(B, _h, _w, ws, ws, C)
        x = attn.transpose(2, 3).reshape(B, _h * ws, _w * ws, C)
        if pad_r > 0 or pad_b > 0:
            x = x[:, :H, :W, :].contiguous()
        return self.proj(x.reshape(B, N, C))


class TimmGSAT(nn.Module):
    def __init__(self, dim, num_heads, sr_ratio=8):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, sr_ratio)
            self.norm = nn.LayerNorm(dim)

    def forward(self, x, size):
        B, N, C = x.shape
        h = self.num_heads
        q = self.q(x).reshape(B, N, h, C // h).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x = x.permute(0, 2, 1).reshape(B, C, *size)
            x = self.sr(x).reshape(B, C, -1).permute(0, 2, 1)
            x = self.norm(x)
        kv = self.kv(x).reshape(B, -1, 2, h, C // h).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TimmBlockT(nn.Module):
    def __init__(self, dim, num_heads, ws, sr_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        if ws == 1:
            self.attn = TimmGSAT(dim, num_heads, sr_ratio)
        else:
            self.attn = TimmLSAT(dim, num_heads, ws)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MlpT(dim)

    def forward(self, x, size):
        x = x + self.attn(self.norm1(x), size)
        return x + self.mlp(self.norm2(x))


class PosConvT(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Sequential(
            nn.Conv2d(dim, dim, 3, 1, 1, bias=True, groups=dim)
        )

    def forward(self, x, size):
        B, N, C = x.shape
        feat = x.transpose(1, 2).view(B, C, *size)
        y = self.proj(feat)
        y = y + feat
        return y.flatten(2).transpose(1, 2)


class PatchEmbedT(nn.Module):
    def __init__(self, in_chans, dim, patch):
        super().__init__()
        self.patch = patch
        self.proj = nn.Conv2d(in_chans, dim, patch, patch)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        B, C, H, W = x.shape
        x = self.proj(x).flatten(2).transpose(1, 2)
        return self.norm(x), (H // self.patch, W // self.patch)


class _SVT(nn.Module):
    """timm Twins attribute layout after encoders.py del_layers."""

    def __init__(self, dims, heads, sr_ratios, wss, in_chans=3):
        super().__init__()
        self.depths = [2, 2, 18, 2]  # attribute survives del_layers
        self.patch_embeds = nn.ModuleList(
            [
                PatchEmbedT(in_chans, dims[0], 4),
                PatchEmbedT(dims[0], dims[1], 2),
            ]
        )
        self.pos_drops = nn.ModuleList([nn.Dropout(0.0), nn.Dropout(0.0)])
        self.blocks = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        TimmBlockT(dims[i], heads[i], wss[i], sr_ratios[i]),
                        TimmBlockT(dims[i], heads[i], 1, sr_ratios[i]),
                    ]
                )
                for i in range(2)
            ]
        )
        self.pos_block = nn.ModuleList([PosConvT(d) for d in dims])


class TwinsSVTLargeT(nn.Module):
    """encoders.py twins_svt_large (del_layers=True), 2-stage forward."""

    def __init__(self, dims=(128, 256), heads=(4, 8), sr_ratios=(8, 4),
                 wss=(7, 7)):
        super().__init__()
        self.svt = _SVT(dims, heads, sr_ratios, wss)

    def forward(self, x, layer=2):
        B = x.shape[0]
        for i, (embed, drop, blocks, pos_blk) in enumerate(
            zip(self.svt.patch_embeds, self.svt.pos_drops,
                self.svt.blocks, self.svt.pos_block)
        ):
            x, size = embed(x)
            x = drop(x)
            for j, blk in enumerate(blocks):
                x = blk(x, size)
                if j == 0:
                    x = pos_blk(x, size)
            if i < len(self.svt.depths) - 1:
                x = x.reshape(B, *size, -1).permute(0, 3, 1, 2).contiguous()
            if i == layer - 1:
                break
        return x, None


# ---------------------------------------------------------------------------
# PerCostFormer3: vertical twins RPE+Context attention (twins.py)
# ---------------------------------------------------------------------------
class LocallyGroupedAttnRPEContextT(nn.Module):
    def __init__(self, dim, num_heads, ws, vert_c_dim, encoder_latent_dim):
        super().__init__()
        self.dim, self.num_heads, self.ws = dim, num_heads, ws
        self.scale = (dim // num_heads) ** -0.5
        self.vert_c_dim = vert_c_dim
        self.context_proj = nn.Linear(encoder_latent_dim, vert_c_dim)
        self.q = nn.Linear(dim + vert_c_dim, dim, bias=True)
        self.k = nn.Linear(dim + vert_c_dim, dim, bias=True)
        self.v = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, size, context):
        B, N, C = x.shape
        H, W = size
        C_qk = C + self.vert_c_dim
        ws, h = self.ws, self.num_heads
        context = context.unsqueeze(1)
        context = context.repeat(1, B // context.shape[0], 1, 1, 1)
        context = context.reshape(B, -1, H * W).permute(0, 2, 1)
        context = self.context_proj(context)
        context = context.view(B, H, W, -1)

        x = x.view(B, H, W, C)
        x_qk = torch.cat([x, context], dim=-1)
        pad_r = (ws - W % ws) % ws
        pad_b = (ws - H % ws) % ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        x_qk = F.pad(x_qk, (0, 0, 0, pad_r, 0, pad_b))
        _, Hp, Wp, _ = x.shape
        _h, _w = Hp // ws, Wp // ws
        x = x.reshape(B, _h, ws, _w, ws, C).transpose(2, 3)
        x_qk = x_qk.reshape(B, _h, ws, _w, ws, C_qk).transpose(2, 3)

        v = self.v(x).reshape(
            B, _h * _w, ws * ws, 1, h, C // h
        ).permute(3, 0, 1, 4, 2, 5)[0]

        coords = coords_grid(B, ws, ws)
        coords = coords.view(B, 2, -1).permute(0, 2, 1)
        coords_enc = LinearPositionEmbeddingSine(coords, dim=C_qk).view(
            B, ws, ws, C_qk
        )
        x_qk = x_qk + coords_enc[:, None, None, :, :, :]

        q = self.q(x_qk).reshape(
            B, _h * _w, ws * ws, 1, h, C // h
        ).permute(3, 0, 1, 4, 2, 5)[0]
        k = self.k(x_qk).reshape(
            B, _h * _w, ws * ws, 1, h, C // h
        ).permute(3, 0, 1, 4, 2, 5)[0]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        attn = (attn @ v).transpose(2, 3).reshape(B, _h, _w, ws, ws, C)
        x = attn.transpose(2, 3).reshape(B, _h * ws, _w * ws, C)
        if pad_r > 0 or pad_b > 0:
            x = x[:, :H, :W, :].contiguous()
        return self.proj(x.reshape(B, N, C))


class GlobalSubSampleAttnRPEContextT(nn.Module):
    def __init__(self, dim, num_heads, sr_ratio, vert_c_dim,
                 encoder_latent_dim):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.vert_c_dim = vert_c_dim
        self.context_proj = nn.Linear(encoder_latent_dim, vert_c_dim)
        self.q = nn.Linear(dim + vert_c_dim, dim, bias=True)
        self.k = nn.Linear(dim, dim, bias=True)
        self.v = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.sr_ratio = sr_ratio
        self.sr_key = nn.Conv2d(dim + vert_c_dim, dim, sr_ratio, sr_ratio)
        self.sr_value = nn.Conv2d(dim, dim, sr_ratio, sr_ratio)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x, size, context):
        B, N, C = x.shape
        C_qk = C + self.vert_c_dim
        H, W = size
        h, r = self.num_heads, self.sr_ratio
        context = context.unsqueeze(1)
        context = context.repeat(1, B // context.shape[0], 1, 1, 1)
        context = context.reshape(B, -1, H * W).permute(0, 2, 1)
        context = self.context_proj(context)
        context = context.view(B, H, W, -1)

        x = x.view(B, H, W, C)
        x_qk = torch.cat([x, context], dim=-1)
        pad_r = (r - W % r) % r
        pad_b = (r - H % r) % r
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        x_qk = F.pad(x_qk, (0, 0, 0, pad_r, 0, pad_b))
        _, Hp, Wp, _ = x.shape
        padded_size = (Hp, Wp)
        padded_N = Hp * Wp
        x = x.view(B, -1, C)
        x_qk = x_qk.view(B, -1, C_qk)

        coords = coords_grid(B, *padded_size)
        coords = coords.view(B, 2, -1).permute(0, 2, 1)
        coords_enc = LinearPositionEmbeddingSine(coords, dim=C_qk)
        q = self.q(x_qk + coords_enc).reshape(
            B, padded_N, h, C // h
        ).permute(0, 2, 1, 3)

        x = x.permute(0, 2, 1).reshape(B, C, *padded_size)
        x_qk = x_qk.permute(0, 2, 1).reshape(B, C_qk, *padded_size)
        x = self.sr_value(x).reshape(B, C, -1).permute(0, 2, 1)
        x_qk = self.sr_key(x_qk).reshape(B, C, -1).permute(0, 2, 1)
        x = self.norm(x)
        x_qk = self.norm(x_qk)

        coords = coords_grid(B, Hp // r, Wp // r)
        coords = coords.view(B, 2, -1).permute(0, 2, 1) * r
        coords_enc = LinearPositionEmbeddingSine(coords, dim=C)
        k = self.k(x_qk + coords_enc).reshape(
            B, (Hp // r) * (Wp // r), h, C // h
        ).permute(0, 2, 1, 3)
        v = self.v(x).reshape(
            B, (Hp // r) * (Wp // r), h, C // h
        ).permute(0, 2, 1, 3)

        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, Hp, Wp, C)
        if pad_r > 0 or pad_b > 0:
            x = x[:, :H, :W, :].contiguous()
        return self.proj(x.reshape(B, N, C))


class VertBlockT(nn.Module):
    """twins.py Block with DEFAULT norm_layer (eps 1e-5) as built by
    VerticalSelfAttentionLayer."""

    def __init__(self, dim, num_heads, ws, sr_ratio, vert_c_dim,
                 encoder_latent_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        if ws == 1:
            self.attn = GlobalSubSampleAttnRPEContextT(
                dim, num_heads, sr_ratio, vert_c_dim, encoder_latent_dim
            )
        else:
            self.attn = LocallyGroupedAttnRPEContextT(
                dim, num_heads, ws, vert_c_dim, encoder_latent_dim
            )
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MlpT(dim)

    def forward(self, x, size, context):
        x = x + self.attn(self.norm1(x), size, context)
        return x + self.mlp(self.norm2(x))


class VerticalSelfAttentionLayerT(nn.Module):
    def __init__(self, dim, num_heads, vert_c_dim, encoder_latent_dim):
        super().__init__()
        self.local_block = VertBlockT(dim, num_heads, 7, 4, vert_c_dim,
                                      encoder_latent_dim)
        self.global_block = VertBlockT(dim, num_heads, 1, 4, vert_c_dim,
                                       encoder_latent_dim)

    def forward(self, x, size, context):
        x = self.local_block(x, size, context)
        return self.global_block(x, size, context)


# ---------------------------------------------------------------------------
# PerCostFormer3 encoder.py pieces
# ---------------------------------------------------------------------------
class CostPatchEmbedT(nn.Module):
    def __init__(self, embed_dim=64, patch_size=8, pe_dim=64):
        super().__init__()
        self.patch_size = patch_size
        self.pe_dim = pe_dim
        self.proj = nn.ModuleList(
            [
                nn.Conv2d(1, embed_dim // 4, 6, 2, 2),
                nn.ReLU(),
                nn.Conv2d(embed_dim // 4, embed_dim // 2, 6, 2, 2),
                nn.ReLU(),
                nn.Conv2d(embed_dim // 2, embed_dim, 6, 2, 2),
            ]
        )
        self.ffn_with_coord = nn.Sequential(
            nn.Conv2d(embed_dim + pe_dim, embed_dim + pe_dim, 1),
            nn.ReLU(),
            nn.Conv2d(embed_dim + pe_dim, embed_dim + pe_dim, 1),
        )
        self.norm = nn.LayerNorm(embed_dim + pe_dim)

    def forward(self, x):
        B, C, H, W = x.shape
        ps = self.patch_size
        pad_r = (ps - W % ps) % ps
        pad_b = (ps - H % ps) % ps
        x = F.pad(x, (0, pad_r, 0, pad_b))
        for layer in self.proj:
            x = layer(x)
        out_size = x.shape[2:]
        patch_coord = coords_grid(B, out_size[0], out_size[1]) * ps + ps / 2
        patch_coord = patch_coord.view(B, 2, -1).permute(0, 2, 1)
        enc = LinearPositionEmbeddingSine(patch_coord, dim=self.pe_dim)
        enc = enc.permute(0, 2, 1).view(B, -1, out_size[0], out_size[1])
        x = self.ffn_with_coord(torch.cat([x, enc], dim=1))
        x = self.norm(x.flatten(2).transpose(1, 2))
        return x, out_size


class BroadMultiHeadAttentionT(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim / heads) ** -0.5

    def forward(self, Q, K, V):
        h = self.heads
        if Q.shape[0] == 1:
            Q = Q.squeeze(0).reshape(-1, h, Q.shape[-1] // h).permute(
                1, 0, 2
            )
            K = K.reshape(*K.shape[:2], h, -1).permute(0, 2, 1, 3)
            dots = torch.einsum("hid,bhjd->bhij", Q, K) * self.scale
        else:
            Q = Q.reshape(*Q.shape[:2], h, -1).permute(0, 2, 1, 3)
            K = K.reshape(*K.shape[:2], h, -1).permute(0, 2, 1, 3)
            dots = torch.einsum("bhid,bhjd->bhij", Q, K) * self.scale
        attn = dots.softmax(dim=-1)
        V = V.reshape(*V.shape[:2], h, -1).permute(0, 2, 1, 3)
        out = torch.einsum("bhij,bhjd->bhid", attn, V)
        return out.permute(0, 2, 1, 3).reshape(out.shape[0], out.shape[2],
                                               -1)


class CrossAttentionLayerInputT(nn.Module):
    """crossattentionlayer.py CrossAttentionLayer."""

    def __init__(self, qk_dim, v_dim, query_token_dim, tgt_token_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(query_token_dim)
        self.norm2 = nn.LayerNorm(query_token_dim)
        self.multi_head_attn = BroadMultiHeadAttentionT(qk_dim, 8)
        self.q = nn.Linear(query_token_dim, qk_dim, bias=True)
        self.k = nn.Linear(tgt_token_dim, qk_dim, bias=True)
        self.v = nn.Linear(tgt_token_dim, v_dim, bias=True)
        self.proj = nn.Linear(v_dim, query_token_dim)
        self.ffn = nn.Sequential(
            nn.Linear(query_token_dim, query_token_dim),
            nn.GELU(),
            nn.Dropout(0.0),
            nn.Linear(query_token_dim, query_token_dim),
            nn.Dropout(0.0),
        )

    def forward(self, query, tgt_token):
        short_cut = query
        query = self.norm1(query)
        q, k, v = self.q(query), self.k(tgt_token), self.v(tgt_token)
        x = self.multi_head_attn(q, k, v)
        x = short_cut + self.proj(x)
        return x + self.ffn(self.norm2(x))


class MultiHeadAttentionT(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim / heads) ** -0.5

    def forward(self, Q, K, V):
        h = self.heads
        Q = Q.reshape(*Q.shape[:2], h, -1).permute(0, 2, 1, 3)
        K = K.reshape(*K.shape[:2], h, -1).permute(0, 2, 1, 3)
        dots = torch.einsum("bhid,bhjd->bhij", Q, K) * self.scale
        attn = dots.softmax(dim=-1)
        V = V.reshape(*V.shape[:2], h, -1).permute(0, 2, 1, 3)
        out = torch.einsum("bhij,bhjd->bhid", attn, V)
        return out.permute(0, 2, 1, 3).reshape(out.shape[0], out.shape[2],
                                               -1)


class SelfAttentionLayerT(nn.Module):
    """encoder.py SelfAttentionLayer."""

    def __init__(self, dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.multi_head_attn = MultiHeadAttentionT(dim, 8)
        self.q = nn.Linear(dim, dim, bias=True)
        self.k = nn.Linear(dim, dim, bias=True)
        self.v = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.ffn = nn.Sequential(
            nn.Linear(dim, dim), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(dim, dim), nn.Dropout(0.0),
        )

    def forward(self, x):
        short_cut = x
        x = self.norm1(x)
        x = self.multi_head_attn(self.q(x), self.k(x), self.v(x))
        x = short_cut + self.proj(x)
        return x + self.ffn(self.norm2(x))


class CostPerceiverEncoderT(nn.Module):
    def __init__(self, latent_dim=128, latent_tokens=8, depth=3,
                 vert_c_dim=64, heads=8, embed_dim=64,
                 encoder_latent_dim=256):
        super().__init__()
        self.latent_tokens_num = latent_tokens
        self.patch_embed = CostPatchEmbedT(embed_dim)
        self.latent_tokens = nn.Parameter(
            torch.randn(1, latent_tokens, latent_dim)
        )
        tgt_dim = embed_dim + 64
        self.input_layer = CrossAttentionLayerInputT(
            latent_dim, latent_dim, latent_dim, tgt_dim
        )
        self.encoder_layers = nn.ModuleList(
            [SelfAttentionLayerT(latent_dim) for _ in range(depth)]
        )
        self.vertical_encoder_layers = nn.ModuleList(
            [
                VerticalSelfAttentionLayerT(
                    latent_dim, heads, vert_c_dim, encoder_latent_dim
                )
                for _ in range(depth)
            ]
        )

    def forward(self, cost_volume, data, context):
        B, heads, H1, W1, H2, W2 = cost_volume.shape
        cost_maps = cost_volume.permute(0, 2, 3, 1, 4, 5).contiguous().view(
            B * H1 * W1, 1, H2, W2
        )
        data["cost_maps"] = cost_maps
        x, size = self.patch_embed(cost_maps)
        data["H3W3"] = size
        x = self.input_layer(self.latent_tokens, x)
        short_cut = x
        tok = self.latent_tokens_num
        for idx, layer in enumerate(self.encoder_layers):
            x = layer(x)
            x = x.view(B, H1 * W1, tok, -1).permute(0, 2, 1, 3).reshape(
                B * tok, H1 * W1, -1
            )
            x = self.vertical_encoder_layers[idx](x, (H1, W1), context)
            x = x.view(B, tok, H1 * W1, -1).permute(0, 2, 1, 3).reshape(
                B * H1 * W1, tok, -1
            )
        return x + short_cut


class MemoryEncoderT(nn.Module):
    def __init__(self, enc_dims, enc_heads, **pkw):
        super().__init__()
        self.feat_encoder = TwinsSVTLargeT(enc_dims, enc_heads)
        self.cost_perceiver_encoder = CostPerceiverEncoderT(
            encoder_latent_dim=enc_dims[-1], **pkw
        )

    def corr(self, fmap1, fmap2):
        b, d, h, w = fmap1.shape
        f1 = fmap1.reshape(b, 1, d, h * w).permute(0, 1, 3, 2)
        f2 = fmap2.reshape(b, 1, d, h * w).permute(0, 1, 3, 2)
        corr = torch.einsum("bhid,bhjd->bhij", f1, f2)
        return corr.view(b, 1, h, w, h, w)

    def forward(self, img1, img2, data, context):
        feat_s, _ = self.feat_encoder(img1)
        feat_t, _ = self.feat_encoder(img2)
        cost_volume = self.corr(feat_s, feat_t)
        x = self.cost_perceiver_encoder(cost_volume, data, context)
        return x


# ---------------------------------------------------------------------------
# decoder.py / gru.py / gma.py
# ---------------------------------------------------------------------------
def bilinear_sampler(img, coords):
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


class CrossAttentionLayerDecT(nn.Module):
    """decoder.py CrossAttentionLayer (flow_or_pe='and')."""

    def __init__(self, qk_dim, v_dim, query_token_dim, tgt_token_dim):
        super().__init__()
        self.dim = qk_dim
        self.norm1 = nn.LayerNorm(query_token_dim)
        self.norm2 = nn.LayerNorm(query_token_dim)
        self.multi_head_attn = MultiHeadAttentionT(qk_dim, 8)
        self.q = nn.Linear(query_token_dim, qk_dim, bias=True)
        self.k = nn.Linear(tgt_token_dim, qk_dim, bias=True)
        self.v = nn.Linear(tgt_token_dim, v_dim, bias=True)
        self.proj = nn.Linear(v_dim, query_token_dim)
        self.ffn = nn.Sequential(
            nn.Linear(query_token_dim, query_token_dim),
            nn.GELU(),
            nn.Dropout(0.0),
            nn.Linear(query_token_dim, query_token_dim),
            nn.Dropout(0.0),
        )

    def forward(self, query, key, value, memory, query_coord):
        B, _, H1, W1 = query_coord.shape
        if key is None and value is None:
            key = self.k(memory)
            value = self.v(memory)
        query_coord = query_coord.contiguous()
        query_coord = query_coord.view(B, 2, -1).permute(0, 2, 1)[
            :, :, None, :
        ].contiguous().view(B * H1 * W1, 1, 2)
        query_coord_enc = LinearPositionEmbeddingSine(query_coord,
                                                      dim=self.dim)
        short_cut = query
        query = self.norm1(query)
        q = self.q(query + query_coord_enc)
        x = self.multi_head_attn(q, key, value)
        x = self.proj(x)
        x = short_cut + x
        x = x + self.ffn(self.norm2(x))
        return x, key, value


class MemoryDecoderLayerT(nn.Module):
    def __init__(self, query_dim, latent_dim):
        super().__init__()
        self.cross_attend = CrossAttentionLayerDecT(
            query_dim, query_dim, query_dim, latent_dim
        )

    def forward(self, query, key, value, memory, coords1, size):
        x_global, k, v = self.cross_attend(query, key, value, memory,
                                           coords1)
        B, C, H1, W1 = size
        x_global = x_global.view(B, H1, W1, -1).permute(0, 3, 1, 2)
        return x_global, k, v


class RelPosEmbT(nn.Module):
    def __init__(self, max_pos_size, dim_head):
        super().__init__()
        self.rel_height = nn.Embedding(2 * max_pos_size - 1, dim_head)
        self.rel_width = nn.Embedding(2 * max_pos_size - 1, dim_head)


class GMAAttentionT(nn.Module):
    """gma.py Attention: content-only sim; pos_emb params exist unused."""

    def __init__(self, dim, heads=1, max_pos_size=160, dim_head=128):
        super().__init__()
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.to_qk = nn.Conv2d(dim, heads * dim_head * 2, 1, bias=False)
        self.pos_emb = RelPosEmbT(max_pos_size, dim_head)
        self.dim_head = dim_head

    def forward(self, fmap):
        b, c, h, w = fmap.shape
        q, k = self.to_qk(fmap).chunk(2, dim=1)
        q = q.reshape(b, self.dim_head, h * w).permute(0, 2, 1) * self.scale
        k = k.reshape(b, self.dim_head, h * w).permute(0, 2, 1)
        sim = torch.einsum("bqd,bkd->bqk", q, k)
        return sim.softmax(dim=-1)


class AggregateT(nn.Module):
    def __init__(self, dim, heads=1, dim_head=128):
        super().__init__()
        self.heads = heads
        self.to_v = nn.Conv2d(dim, heads * dim_head, 1, bias=False)
        self.gamma = nn.Parameter(torch.zeros(1))
        self.dim_head = dim_head

    def forward(self, attn, fmap):
        b, c, h, w = fmap.shape
        v = self.to_v(fmap).reshape(b, self.dim_head, h * w).permute(
            0, 2, 1
        )
        out = torch.einsum("bij,bjd->bid", attn, v)
        out = out.permute(0, 2, 1).reshape(b, self.dim_head, h, w)
        return fmap + self.gamma * out


class BasicMotionEncoderT(nn.Module):
    def __init__(self, cor_planes):
        super().__init__()
        self.convc1 = nn.Conv2d(cor_planes, 256, 1, padding=0)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

    def forward(self, flow, corr):
        cor = F.relu(self.convc1(corr))
        cor = F.relu(self.convc2(cor))
        flo = F.relu(self.convf1(flow))
        flo = F.relu(self.convf2(flo))
        out = F.relu(self.conv(torch.cat([cor, flo], dim=1)))
        return torch.cat([out, flow], dim=1)


class SepConvGRUT(nn.Module):
    def __init__(self, hidden_dim=128, input_dim=384):
        super().__init__()
        hd, idim = hidden_dim, input_dim
        self.convz1 = nn.Conv2d(hd + idim, hd, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(hd + idim, hd, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(hd + idim, hd, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(hd + idim, hd, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(hd + idim, hd, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(hd + idim, hd, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz1(hx))
        r = torch.sigmoid(self.convr1(hx))
        q = torch.tanh(self.convq1(torch.cat([r * h, x], dim=1)))
        h = (1 - z) * h + z * q
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz2(hx))
        r = torch.sigmoid(self.convr2(hx))
        q = torch.tanh(self.convq2(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class FlowHeadT(nn.Module):
    def __init__(self, input_dim=128, hidden_dim=256):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, 2, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.conv2(self.relu(self.conv1(x)))


class GMAUpdateBlockT(nn.Module):
    def __init__(self, cor_planes, hidden_dim=128):
        super().__init__()
        self.encoder = BasicMotionEncoderT(cor_planes)
        self.gru = SepConvGRUT(hidden_dim, 128 + hidden_dim + hidden_dim)
        self.flow_head = FlowHeadT(hidden_dim, 256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1),
            nn.ReLU(inplace=True),
            nn.Conv2d(256, 64 * 9, 1, padding=0),
        )
        self.aggregator = AggregateT(dim=128, heads=1, dim_head=128)

    def forward(self, net, inp, corr, flow, attention):
        motion_features = self.encoder(flow, corr)
        motion_features_global = self.aggregator(attention, motion_features)
        inp_cat = torch.cat([inp, motion_features, motion_features_global],
                            dim=1)
        net = self.gru(net, inp_cat)
        delta_flow = self.flow_head(net)
        mask = 0.25 * self.mask(net)
        return net, mask, delta_flow


class MemoryDecoderT(nn.Module):
    def __init__(self, query_dim=64, latent_dim=128, enc_latent_dim=256,
                 depth=12):
        super().__init__()
        self.dim = query_dim
        self.depth = depth
        self.flow_token_encoder = nn.Sequential(
            nn.Conv2d(81, query_dim, 1, 1),
            nn.GELU(),
            nn.Conv2d(query_dim, query_dim, 1, 1),
        )
        self.proj = nn.Conv2d(enc_latent_dim, 256, 1)
        self.decoder_layer = MemoryDecoderLayerT(query_dim, latent_dim)
        self.update_block = GMAUpdateBlockT(81 + query_dim, 128)
        self.att = GMAAttentionT(dim=128, heads=1, max_pos_size=160,
                                 dim_head=128)

    def upsample_flow(self, flow, mask):
        N, _, H, W = flow.shape
        mask = mask.view(N, 1, 9, 8, 8, H, W)
        mask = torch.softmax(mask, dim=2)
        up_flow = F.unfold(8 * flow, [3, 3], padding=1)
        up_flow = up_flow.view(N, 2, 9, 1, 1, H, W)
        up_flow = torch.sum(mask * up_flow, dim=2)
        up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
        return up_flow.reshape(N, 2, 8 * H, 8 * W)

    def encode_flow_token(self, cost_maps, coords, r=4):
        coords = coords.permute(0, 2, 3, 1)
        batch, h1, w1, _ = coords.shape
        dy = torch.linspace(-r, r, 2 * r + 1)
        dx = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(batch * h1 * w1, 1, 1, 2)
        delta = delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        coords = centroid + delta
        corr = bilinear_sampler(cost_maps, coords)
        return corr.view(batch, h1, w1, -1).permute(0, 3, 1, 2)

    def forward(self, cost_memory, context, data):
        cost_maps = data["cost_maps"]
        B, _, H1, W1 = context.shape
        coords = coords_grid(B, H1, W1)
        coords0, coords1 = coords, coords.clone()

        context = self.proj(context)
        net, inp = torch.split(context, [128, 128], dim=1)
        net = torch.tanh(net)
        inp = torch.relu(inp)
        attention = self.att(inp)
        size = net.shape
        key, value = None, None

        flow_predictions = []
        for _ in range(self.depth):
            coords1 = coords1.detach()
            cost_forward = self.encode_flow_token(cost_maps, coords1)
            query = self.flow_token_encoder(cost_forward)
            query = query.permute(0, 2, 3, 1).contiguous().view(
                size[0] * size[2] * size[3], 1, self.dim
            )
            cost_global, key, value = self.decoder_layer(
                query, key, value, cost_memory, coords1, size
            )
            corr = torch.cat([cost_global, cost_forward], dim=1)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                net, inp, corr, flow, attention
            )
            coords1 = coords1 + delta_flow
            flow_up = self.upsample_flow(coords1 - coords0, up_mask)
            flow_predictions.append(flow_up)
        return flow_predictions[-1]


class FlowFormerTorch(nn.Module):
    """transformer.py FlowFormer (default 'things' cfg), eval forward
    returning the final upsampled flow."""

    def __init__(self, enc_dims=(128, 256), enc_heads=(4, 8),
                 latent_dim=128, latent_tokens=8, depth=3, vert_c_dim=64,
                 perceiver_heads=8, embed_dim=64, query_dim=64,
                 decoder_depth=12):
        super().__init__()
        self.memory_encoder = MemoryEncoderT(
            enc_dims, enc_heads, latent_dim=latent_dim,
            latent_tokens=latent_tokens, depth=depth,
            vert_c_dim=vert_c_dim, heads=perceiver_heads,
            embed_dim=embed_dim,
        )
        self.memory_decoder = MemoryDecoderT(
            query_dim, latent_dim, enc_dims[-1], decoder_depth
        )
        self.context_encoder = TwinsSVTLargeT(enc_dims, enc_heads)

    def forward(self, image1, image2):
        data = {}
        context, _ = self.context_encoder(image1)
        cost_memory = self.memory_encoder(image1, image2, data, context)
        return self.memory_decoder(cost_memory, context, data)
