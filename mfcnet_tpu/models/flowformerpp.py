"""FlowFormer++ (default 'things' config path) in Flax.

The reference vendors ~4.5k LoC of FlowFormer++ (models/optical_flow/
flowformerplusplus/) of which the default config exercises one path
(ffpp_cfg_things.py): twins-SVT-large feature/context encoders truncated to
2 stages (encoders.py:12-18), an all-pairs cost volume
(PerCostFormer3/encoder.py:364-374), the CostPerceiverEncoder (patch-embed
each target-view cost map, cross-attend 8 latent tokens of dim 128,
alternate latent self-attention with 'vertical' twins attention across
source positions — encoder.py:179-291), and the MemoryDecoder (12
iterations of {9x9 local cost sampling, cost-memory cross-attention with
linear sine PE, GMA aggregation, SepConvGRU update, convex 8x upsample} —
decoder.py:282-364).

Only the default path is implemented (vertical_encoder_attn='twins',
cross_attn='all', gma='GMA', pe='linear', use_patch=False, r_16<0,
quater_refine=False); the optional NATTEN/SK/quarter-refinement paths are
dead configuration in the reference (its NATTEN sources are absent,
PerCostFormer3/NA.py:12-16).

Known simplification vs the reference (documented): the twins attention
blocks use standard window / global-subsampled attention with the
vert_c_dim context concatenation but without the learned relative-position
bias tables ('with_rpe'); pretrained FlowFormer++ weights are not shipped
with the reference, so structural equivalence of the default path is the
target here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# position embedding (PerCostFormer3/attention.py:156-161)
# ---------------------------------------------------------------------------
def linear_position_embedding_sine(x, dim: int = 128, factor: float = 1 / 200):
    """x: (..., 2) coords -> (..., dim) embedding."""
    freqs = jnp.linspace(0, dim // 4 - 1, dim // 4)
    a = 3.14 * x[..., -2:-1] * freqs * factor
    b = 3.14 * x[..., -1:] * freqs * factor
    return jnp.concatenate(
        [jnp.sin(a), jnp.cos(a), jnp.sin(b), jnp.cos(b)], axis=-1
    )


# ---------------------------------------------------------------------------
# twins-SVT attention blocks
# ---------------------------------------------------------------------------
class _MLP(nn.Module):
    dim: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.dim * self.ratio)(x)
        y = nn.gelu(y)
        return nn.Dense(self.dim)(y)


class WindowAttention(nn.Module):
    """Locally-grouped self-attention (twins LSA), window ws x ws."""

    dim: int
    heads: int
    ws: int = 7

    @nn.compact
    def __call__(self, x, size, qk_extra=None):
        H, W = size
        B = x.shape[0]
        D, h, ws = self.dim, self.heads, self.ws
        xin = x if qk_extra is None else jnp.concatenate(
            [x, qk_extra], axis=-1
        )
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        Hp, Wp = H + pad_b, W + pad_r

        def to_windows(t):
            C = t.shape[-1]
            t = t.reshape(B, H, W, C)
            t = jnp.pad(t, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            t = t.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, (Hp // ws) * (Wp // ws), ws * ws, C
            )

        qk_src = to_windows(xin)
        v_src = to_windows(x)
        q = nn.Dense(D, name="q")(qk_src)
        k = nn.Dense(D, name="k")(qk_src)
        v = nn.Dense(D, name="v")(v_src)

        def heads_split(t):
            return t.reshape(*t.shape[:-1], h, D // h)

        q, k, v = map(heads_split, (q, k, v))
        attn = jnp.einsum("bwqhd,bwkhd->bwhqk", q, k) / jnp.sqrt(D / h)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bwhqk,bwkhd->bwqhd", attn, v)
        out = out.reshape(B, Hp // ws, Wp // ws, ws, ws, D)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, D)
        out = out[:, :H, :W].reshape(B, H * W, D)
        return nn.Dense(D, name="proj")(out)


class GlobalSubSampleAttention(nn.Module):
    """Global attention with sr_ratio-subsampled keys/values (twins GSA)."""

    dim: int
    heads: int
    sr_ratio: int = 4

    @nn.compact
    def __call__(self, x, size, qk_extra=None):
        H, W = size
        B = x.shape[0]
        D, h = self.dim, self.heads
        xin = x if qk_extra is None else jnp.concatenate(
            [x, qk_extra], axis=-1
        )
        q = nn.Dense(D, name="q")(xin)
        kv_src = xin.reshape(B, H, W, xin.shape[-1])
        v_src = x.reshape(B, H, W, x.shape[-1])
        if self.sr_ratio > 1:
            r = self.sr_ratio
            pad_b = (r - H % r) % r
            pad_r = (r - W % r) % r
            kv_src = jnp.pad(
                kv_src, ((0, 0), (0, pad_b), (0, pad_r), (0, 0))
            )
            v_src = jnp.pad(v_src, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            kv_src = nn.Conv(D, (r, r), (r, r), padding="VALID",
                             name="sr")(kv_src)
            kv_src = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(kv_src)
            v_src = kv_src
        k = nn.Dense(D, name="k")(kv_src).reshape(B, -1, h, D // h)
        v = nn.Dense(D, name="v")(v_src).reshape(B, -1, h, D // h)
        q = q.reshape(B, -1, h, D // h)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(D / h)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, -1, D)
        return nn.Dense(D, name="proj")(out)


class TwinsBlock(nn.Module):
    """Pre-norm attention + MLP block with optional context conditioning
    (vert_c_dim concat into q/k, twins.py Block with vert_c_dim)."""

    dim: int
    heads: int
    ws: int = 7  # 1 => global subsampled attention
    sr_ratio: int = 4
    vert_c_dim: int = 0

    @nn.compact
    def __call__(self, x, size, context=None):
        qk_extra = None
        if context is not None and self.vert_c_dim > 0:
            ctx = nn.Dense(self.vert_c_dim, name="ctx_proj")(context)
            qk_extra = nn.LayerNorm(epsilon=1e-6, name="ctx_norm")(ctx)
        y = nn.LayerNorm(epsilon=1e-6)(x)
        if self.ws == 1:
            att = GlobalSubSampleAttention(
                self.dim, self.heads, self.sr_ratio, name="attn"
            )(y, size, qk_extra)
        else:
            att = WindowAttention(self.dim, self.heads, self.ws,
                                  name="attn")(y, size, qk_extra)
        x = x + att
        y = nn.LayerNorm(epsilon=1e-6)(x)
        return x + _MLP(self.dim, name="mlp")(y)


class PosConv(nn.Module):
    """Twins PEG: depthwise 3x3 conv + residual."""

    dim: int

    @nn.compact
    def __call__(self, x, size):
        H, W = size
        B = x.shape[0]
        y = x.reshape(B, H, W, self.dim)
        y = nn.Conv(self.dim, (3, 3), padding="SAME",
                    feature_group_count=self.dim)(y)
        return x + y.reshape(B, H * W, self.dim)


class TwinsSVTEncoder(nn.Module):
    """twins_svt_large truncated to the first 2 stages (encoders.py:7-40):
    output (B, H/8, W/8, 256)."""

    dims: tuple = (128, 256)
    depths: tuple = (2, 2)
    heads: tuple = (4, 8)
    sr_ratios: tuple = (8, 4)
    wss: tuple = (7, 7)

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        for si in range(len(self.dims)):
            patch, stride = (4, 4) if si == 0 else (2, 2)
            x = nn.Conv(self.dims[si], (patch, patch), (stride, stride),
                        name=f"embed{si}")(x)
            H, W = x.shape[1], x.shape[2]
            x = nn.LayerNorm(epsilon=1e-6, name=f"embed_norm{si}")(
                x.reshape(B, H * W, self.dims[si])
            )
            for bi in range(self.depths[si]):
                ws = self.wss[si] if bi % 2 == 0 else 1
                x = TwinsBlock(
                    self.dims[si], self.heads[si], ws, self.sr_ratios[si],
                    name=f"s{si}_b{bi}",
                )(x, (H, W))
                if bi == 0:
                    x = PosConv(self.dims[si], name=f"pos{si}")(x, (H, W))
            x = x.reshape(B, H, W, self.dims[si])
        return x  # (B, H/8, W/8, 256)


# ---------------------------------------------------------------------------
# cost perceiver encoder
# ---------------------------------------------------------------------------
class CostPatchEmbed(nn.Module):
    """Patch-embed one cost map (encoder.py PatchEmbed, patch_size=8):
    3 convs k6 s2 p2 + linear sine PE concat + 1x1 ffn + LN."""

    embed_dim: int = 64

    @nn.compact
    def __call__(self, cost_maps):
        # cost_maps: (N, H2, W2, 1) with N = B*H1*W1
        N, H, W, _ = cost_maps.shape
        x = cost_maps
        pad_b = (8 - H % 8) % 8
        pad_r = (8 - W % 8) % 8
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        d = self.embed_dim
        x = nn.Conv(d // 4, (6, 6), (2, 2),
                    padding=((2, 2), (2, 2)), name="proj0")(x)
        x = nn.relu(x)
        x = nn.Conv(d // 2, (6, 6), (2, 2),
                    padding=((2, 2), (2, 2)), name="proj1")(x)
        x = nn.relu(x)
        x = nn.Conv(d, (6, 6), (2, 2),
                    padding=((2, 2), (2, 2)), name="proj2")(x)
        H3, W3 = x.shape[1], x.shape[2]
        # patch-center coords in feature space * patch + patch/2
        ys = jnp.arange(H3, dtype=jnp.float32)
        xs = jnp.arange(W3, dtype=jnp.float32)
        coord = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        coord = coord * 8.0 + 4.0
        pe = linear_position_embedding_sine(coord, dim=64)
        pe = jnp.broadcast_to(pe[None], (N, H3, W3, 64))
        x = jnp.concatenate([x, pe], axis=-1)  # (N, H3, W3, d+64)
        x = nn.Conv(d + 64, (1, 1), name="ffn0")(x)
        x = nn.relu(x)
        x = nn.Conv(d + 64, (1, 1), name="ffn1")(x)
        x = nn.LayerNorm(epsilon=1e-6)(x.reshape(N, H3 * W3, d + 64))
        return x, (H3, W3)


class MHA(nn.Module):
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, q, k, v):
        D, h = self.dim, self.heads
        def split(t):
            return t.reshape(*t.shape[:-1], h, t.shape[-1] // h)
        qh, kh, vh = split(q), split(k), split(v)
        attn = jnp.einsum("...qhd,...khd->...hqk", qh, kh) / jnp.sqrt(
            q.shape[-1] / h
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, vh)
        return out.reshape(*out.shape[:-2], -1)


class CrossAttentionInput(nn.Module):
    """Latent tokens cross-attend the cost patches
    (crossattentionlayer.py CrossAttentionLayer, cross_attn='all')."""

    query_dim: int = 128
    tgt_dim: int = 128

    @nn.compact
    def __call__(self, latents, patches):
        q = nn.Dense(self.query_dim, name="q")(
            nn.LayerNorm(epsilon=1e-6)(latents)
        )
        k = nn.Dense(self.query_dim, name="k")(patches)
        v = nn.Dense(self.query_dim, name="v")(patches)
        x = MHA(self.query_dim, 8, name="attn")(q, k, v)
        x = latents + nn.Dense(self.query_dim, name="proj")(x)
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = nn.Dense(self.query_dim)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.query_dim)(y)
        return x + y


class LatentSelfAttention(nn.Module):
    """Self-attention over the 8 latent tokens (encoder.py
    SelfAttentionLayer)."""

    dim: int = 128

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6)(x)
        q = nn.Dense(self.dim, name="q")(y)
        k = nn.Dense(self.dim, name="k")(y)
        v = nn.Dense(self.dim, name="v")(y)
        a = MHA(self.dim, 8, name="attn")(q, k, v)
        x = x + nn.Dense(self.dim, name="proj")(a)
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = nn.Dense(self.dim)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class CostPerceiverEncoder(nn.Module):
    """encoder.py:178-291 (default path)."""

    latent_dim: int = 128
    latent_tokens: int = 8
    depth: int = 3
    vert_c_dim: int = 64

    @nn.compact
    def __call__(self, cost_volume, context):
        # cost_volume: (B, H1, W1, H2, W2); context: (B, H1, W1, 256)
        B, H1, W1, H2, W2 = cost_volume.shape
        N = B * H1 * W1
        cost_maps = cost_volume.reshape(N, H2, W2, 1)
        patches, (H3, W3) = CostPatchEmbed(name="patch_embed")(cost_maps)

        latents = self.param(
            "latent_tokens",
            nn.initializers.normal(1.0),
            (1, self.latent_tokens, self.latent_dim),
        )
        x = CrossAttentionInput(
            self.latent_dim, patches.shape[-1], name="input_layer"
        )(jnp.broadcast_to(latents, (N, self.latent_tokens,
                                     self.latent_dim)), patches)
        short_cut = x
        ctx_tokens = context.reshape(B, H1 * W1, -1)
        for i in range(self.depth):
            x = LatentSelfAttention(self.latent_dim, name=f"self{i}")(x)
            # vertical: attend across source positions per latent token
            xv = x.reshape(B, H1 * W1, self.latent_tokens, self.latent_dim)
            xv = xv.transpose(0, 2, 1, 3).reshape(
                B * self.latent_tokens, H1 * W1, self.latent_dim
            )
            ctx_rep = jnp.repeat(ctx_tokens, self.latent_tokens, axis=0)
            xv = TwinsBlock(
                self.latent_dim, 8, ws=7, sr_ratio=4,
                vert_c_dim=self.vert_c_dim, name=f"vert_local{i}",
            )(xv, (H1, W1), ctx_rep)
            xv = TwinsBlock(
                self.latent_dim, 8, ws=1, sr_ratio=4,
                vert_c_dim=self.vert_c_dim, name=f"vert_global{i}",
            )(xv, (H1, W1), ctx_rep)
            x = xv.reshape(B, self.latent_tokens, H1 * W1, self.latent_dim)
            x = x.transpose(0, 2, 1, 3).reshape(
                N, self.latent_tokens, self.latent_dim
            )
        x = x + short_cut  # cost_encoder_res
        return x, cost_maps  # memory (N, 8, 128), raw cost maps


# ---------------------------------------------------------------------------
# memory decoder
# ---------------------------------------------------------------------------
def sample_local_cost(cost_maps, coords, r: int = 4):
    """decoder.py encode_flow_token: 9x9 bilinear samples of each pixel's
    cost map around its current flow target. cost_maps: (N, H2, W2, 1),
    coords: (B, H1, W1, 2); N = B*H1*W1. Returns (B, H1, W1, 81)."""
    from mfcnet_tpu.ops.warp import grid_sample_bilinear

    B, H1, W1, _ = coords.shape
    N, H2, W2, _ = cost_maps.shape
    d = jnp.linspace(-r, r, 2 * r + 1)
    dxy = jnp.stack(jnp.meshgrid(d, d, indexing="xy"), axis=-1)  # (9,9,2)
    centers = coords.reshape(N, 1, 1, 2)
    pos = centers + dxy[None]  # (N, 9, 9, 2)
    gx = 2.0 * pos[..., 0] / (W2 - 1) - 1.0
    gy = 2.0 * pos[..., 1] / (H2 - 1) - 1.0
    out = grid_sample_bilinear(cost_maps, gx, gy, align_corners=True)
    return out.reshape(B, H1, W1, (2 * r + 1) ** 2)


class DecoderCrossAttention(nn.Module):
    """decoder.py CrossAttentionLayer (flow_or_pe='and', pe='linear')."""

    dim: int = 64
    memory_dim: int = 128

    @nn.compact
    def __call__(self, query, memory, coords):
        # query: (N, 1, 64); memory: (N, 8, 128); coords: (N, 1, 2)
        pe = linear_position_embedding_sine(coords, dim=self.dim)
        sc = query
        q = nn.Dense(self.dim, name="q")(
            nn.LayerNorm(epsilon=1e-6)(query) + pe
        )
        k = nn.Dense(self.dim, name="k")(memory)
        v = nn.Dense(self.dim, name="v")(memory)
        x = MHA(self.dim, 8, name="attn")(q, k, v)
        x = sc + nn.Dense(self.dim, name="proj")(x)
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = nn.Dense(self.dim)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class GMAAttention(nn.Module):
    """gma.py Attention (1 head, content-only similarity)."""

    dim: int = 128
    dim_head: int = 128

    @nn.compact
    def __call__(self, inp):
        B, H, W, _ = inp.shape
        qk = nn.Conv(2 * self.dim_head, (1, 1), use_bias=False,
                     name="to_qk")(inp)
        q, k = qk[..., : self.dim_head], qk[..., self.dim_head :]
        q = q.reshape(B, H * W, self.dim_head) * (self.dim_head**-0.5)
        k = k.reshape(B, H * W, self.dim_head)
        sim = jnp.einsum("bqd,bkd->bqk", q, k)
        return jax.nn.softmax(sim, axis=-1)


class GMAUpdate(nn.Module):
    """gru.py GMAUpdateBlock + BasicMotionEncoder + Aggregate."""

    hidden: int = 128
    corr_dim: int = 81 + 64

    @nn.compact
    def __call__(self, net, inp, corr, flow, attention):
        c = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding="SAME", name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding="SAME", name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding="SAME", name="convf2")(f))
        m = nn.relu(
            nn.Conv(126, (3, 3), padding="SAME", name="conv")(
                jnp.concatenate([c, f], axis=-1)
            )
        )
        motion = jnp.concatenate([m, flow], axis=-1)  # 128

        # GMA aggregate
        B, H, W, _ = motion.shape
        v = nn.Conv(128, (1, 1), use_bias=False, name="to_v")(motion)
        v = v.reshape(B, H * W, 128)
        agg = jnp.einsum("bqk,bkd->bqd", attention, v).reshape(B, H, W, 128)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        motion_global = motion + gamma * agg

        x = jnp.concatenate([inp, motion, motion_global], axis=-1)
        from mfcnet_tpu.models.raft import SepConvGRU

        net = SepConvGRU(self.hidden, name="gru")(net, x)
        fh = nn.relu(nn.Conv(256, (3, 3), padding="SAME",
                             name="flow1")(net))
        delta = nn.Conv(2, (3, 3), padding="SAME", name="flow2")(fh)
        mk = nn.relu(nn.Conv(256, (3, 3), padding="SAME",
                             name="mask1")(net))
        mask = nn.Conv(64 * 9, (1, 1), name="mask2")(mk) * 0.25
        return net, delta, mask


class FlowFormerPP(nn.Module):
    """Top-level FlowFormer++ (transformer.py FlowFormer, default config).

    __call__(image1, image2) -> final upsampled flow (B, H, W, 2) in px
    (the reference's eval return is (flow_lowres, flow_up); the engine uses
    [-1] which is flow_up)."""

    iters: int = 12
    latent_dim: int = 128
    query_dim: int = 64
    enc_dims: tuple = (128, 256)
    enc_depths: tuple = (2, 2)

    @nn.compact
    def __call__(self, image1, image2, train: bool = False):
        from mfcnet_tpu.models.raft import convex_upsample

        fnet = TwinsSVTEncoder(
            self.enc_dims, self.enc_depths, name="feat_encoder"
        )
        cnet = TwinsSVTEncoder(
            self.enc_dims, self.enc_depths, name="context_encoder"
        )
        feat_s = fnet(image1)
        feat_t = fnet(image2)
        context = cnet(image1)
        B, H1, W1, C = feat_s.shape

        # all-pairs cost volume (encoder.py MemoryEncoder.corr)
        cost = jnp.einsum(
            "bxyc,buvc->bxyuv",
            feat_s,
            feat_t,
            preferred_element_type=jnp.float32,
        )

        memory, cost_maps = CostPerceiverEncoder(
            self.latent_dim, name="cost_perceiver"
        )(cost, context)

        ctx = nn.Conv(256, (1, 1), name="proj")(context)
        net = jnp.tanh(ctx[..., :128])
        inp = nn.relu(ctx[..., 128:])
        attention = GMAAttention(name="att")(inp)

        xs = jnp.arange(W1, dtype=jnp.float32)
        ys = jnp.arange(H1, dtype=jnp.float32)
        coords0 = jnp.stack(
            jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
        )[None].repeat(B, axis=0)
        coords1 = coords0

        token_enc0 = nn.Conv(self.query_dim, (1, 1), name="ft_enc0")
        token_enc1 = nn.Conv(self.query_dim, (1, 1), name="ft_enc1")
        cross = DecoderCrossAttention(
            self.query_dim, self.latent_dim, name="decoder_cross"
        )
        update = GMAUpdate(name="update_block")

        up_flow = None
        query_state = jnp.zeros(
            (B * H1 * W1, 1, self.query_dim), jnp.float32
        )
        for _ in range(self.iters):
            local_cost = sample_local_cost(cost_maps, coords1)
            query = token_enc1(nn.gelu(token_enc0(local_cost)))
            query = query.reshape(B * H1 * W1, 1, self.query_dim)
            qcoords = coords1.reshape(B * H1 * W1, 1, 2)
            cost_global = cross(query, memory, qcoords)
            cost_global = cost_global.reshape(B, H1, W1, self.query_dim)
            corr = jnp.concatenate([cost_global, local_cost], axis=-1)
            flow = coords1 - coords0
            net, delta, mask = update(net, inp, corr, flow, attention)
            coords1 = coords1 + delta
            up_flow = convex_upsample(coords1 - coords0, mask)
        return up_flow


def make_ffpp_flow_fn(basic: bool = True, iters: int = 12, variables=None,
                      rng=None):
    """Frozen FlowFormer++ provider with the engine's frame-pair convention
    and the 0.225/0.5 input-range hack (src/engine.py:43,47)."""
    import numpy as np

    model = FlowFormerPP(iters=iters)
    if variables is None:
        from mfcnet_tpu.utils.jitinit import jit_init

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = np.zeros((1, 64, 64, 3), np.float32)
        variables = jit_init(model, rng, dummy, dummy)

    def flow_fn(frames):
        B, T, H, W, _ = frames.shape
        scaled = frames * (0.225 / 0.5)
        flows = []
        f0 = scaled[:, 0]
        for i in range(1, T):
            fi = scaled[:, i]
            a, b = (fi, f0) if basic else (f0, fi)
            flows.append(model.apply(variables, a, b))
        return jnp.stack(flows, axis=1)

    return flow_fn
