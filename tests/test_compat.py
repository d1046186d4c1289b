"""Checkpoint-conversion parity: torch oracle -> flax, heatmaps must match.

This is the BASELINE.json parity harness in miniature: a randomly
initialized torch model with authentic reference state_dict keys is
converted and must reproduce the torch forward within float32 tolerance
(far inside the 1e-3 budget).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mfcnet_tpu.compat.torch_convert import (  # noqa: E402
    convert_multiframe_ternausnet,
    convert_ternausnet,
)
from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16  # noqa: E402

WM = 0.25
SCALED_STAGES = tuple(
    tuple(int(c * WM) for c in stage)
    for stage in ((64, 64), (128, 128), (256, 256, 256),
                  (512, 512, 512), (512, 512, 512))
)
NF = 8
C, T, H, W = 5, 3, 64, 64


def _state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_ternausnet16_conversion_parity():
    from tests.torch_ref import TernausNet16Torch

    torch.manual_seed(0)
    tmodel = TernausNet16Torch(C, num_filters=NF, width_mult=WM).eval()
    variables = convert_ternausnet(_state_dict_np(tmodel), "TernausNet16")

    fmodel = TernausNet16(num_classes=C, num_filters=NF,
                          stage_convs=SCALED_STAGES)
    x = np.random.default_rng(0).standard_normal((1, H, W, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, x: fmodel.apply(v, x))(variables, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_multiframe_conversion_parity():
    from tests.torch_ref import TernausNetMultiBasicTorch

    torch.manual_seed(1)
    tmodel = TernausNetMultiBasicTorch(C, T, width_mult=WM).eval()
    variables = convert_multiframe_ternausnet(
        _state_dict_np(tmodel), "TernausNet16"
    )

    base = TernausNet16(num_classes=C, num_filters=NF,
                        stage_convs=SCALED_STAGES)
    fmodel = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((1, T, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        tin = [
            torch.from_numpy(np.moveaxis(frames[:, i], -1, 1).copy())
            for i in range(T)
        ]
        want = tmodel(tin)
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, f: fmodel.apply(v, f))(
            variables, jnp.asarray(frames)
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_unflow_conversion_parity():
    """Full UnFlow CSS stack: torch oracle -> converter -> flax; flows must
    match (this also validates the correlation, warp, and decoder paths)."""
    from tests.torch_unflow_ref import UnFlowTorch
    from mfcnet_tpu.compat.torch_convert import convert_unflow
    from mfcnet_tpu.models.unflow import UnFlow

    torch.manual_seed(3)
    tmodel = UnFlowTorch().eval()
    variables = convert_unflow(_state_dict_np(tmodel))

    fmodel = UnFlow(corr_impl="shifts")
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(np.moveaxis(a, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(b, -1, 1).copy()),
        )
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, a, b: fmodel.apply(v, a, b))(
            variables, jnp.asarray(a), jnp.asarray(b)
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("head", ["fcn", "deeplab"])
def test_resnet_segmentation_conversion_parity(head):
    from tests.torch_resnet_ref import SegModelTorch
    from mfcnet_tpu.compat.torch_convert import (
        convert_deeplabv3_resnet101,
        convert_fcn_resnet101,
    )
    from mfcnet_tpu.models.deeplab import DeepLabV3ResNet101
    from mfcnet_tpu.models.fcn import FCNResNet101

    layers, width = (1, 1, 2, 1), 8
    torch.manual_seed(5)
    tmodel = SegModelTorch(head, C, layers=layers, width=width).eval()
    sd = _state_dict_np(tmodel)
    if head == "fcn":
        variables = convert_fcn_resnet101(sd, layers)
        fmodel = FCNResNet101(num_classes=C, layers=layers, width=width)
    else:
        variables = convert_deeplabv3_resnet101(sd, layers)
        fmodel = DeepLabV3ResNet101(num_classes=C, layers=layers,
                                    width=width)
    x = np.random.default_rng(5).standard_normal((1, 64, 64, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, x: fmodel.apply(v, x))(variables, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_hrnet_conversion_parity():
    from tests.torch_hrnet_ref import HRNetTorch
    from mfcnet_tpu.compat.torch_convert import convert_hrnet
    from mfcnet_tpu.models.hrnet import HRNetW48

    channels, modules, blocks, w1 = (8, 16, 32, 64), (1, 2, 1), 2, 8
    torch.manual_seed(7)
    tmodel = HRNetTorch(C, channels, modules, blocks, w1).eval()
    variables = convert_hrnet(
        _state_dict_np(tmodel), channels, modules, blocks
    )
    fmodel = HRNetW48(
        num_classes=C, channels=channels, stage_modules=modules,
        num_blocks=blocks, stage1_width=w1,
    )
    x = np.random.default_rng(7).standard_normal((1, 64, 64, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, x: fmodel.apply(v, x))(variables, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_tapnet16_conversion_parity():
    from tests.torch_tapnet_ref import TAPNet16Torch
    from mfcnet_tpu.compat.torch_convert import convert_tapnet
    from mfcnet_tpu.models.tapnet import TAPNet16

    torch.manual_seed(9)
    tmodel = TAPNet16Torch(C, width_mult=WM).eval()
    variables = convert_tapnet(_state_dict_np(tmodel), "TAPNet16")
    fmodel = TAPNet16(num_classes=C, stage_convs=SCALED_STAGES,
                      width_mult=WM)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    att = rng.uniform(0, 1, (1, H, W, 1)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(att, -1, 1).copy()),
        )
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, x, a: fmodel.apply(v, x, a))(
            variables, jnp.asarray(x), jnp.asarray(att)
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_generic_multiframe_conversion():
    """convert_multiframe with the TernausNet16 family == the dedicated
    converter used by the flagship parity test."""
    from tests.torch_ref import TernausNetMultiBasicTorch
    from mfcnet_tpu.compat.torch_convert import convert_multiframe

    torch.manual_seed(1)
    tmodel = TernausNetMultiBasicTorch(C, T, width_mult=WM).eval()
    v1 = convert_multiframe(_state_dict_np(tmodel), "TernausNet16")
    v2 = convert_multiframe_ternausnet(_state_dict_np(tmodel))
    a = jax.tree_util.tree_leaves(v1["params"])
    b = jax.tree_util.tree_leaves(v2["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_mfcnet_flow_depth_channel_ordering_parity():
    """Flow-warped Basic fusion vs the torch oracle: catches seg/flow/depth
    channel-ordering and warp-grid mistakes in MultiFrameNet."""
    from tests.torch_ref import MultiFrameNetBasicFlowTorch
    from mfcnet_tpu.compat.torch_convert import _multiframe_head
    from mfcnet_tpu.models.mfcnet import MultiFrameNet

    torch.manual_seed(11)
    tmodel = MultiFrameNetBasicFlowTorch(C, T, with_depth=True).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    head_params, head_stats = _multiframe_head(sd, "multiframe_net")
    variables = {
        "params": {"head": head_params},
        "batch_stats": {"head": head_stats},
    }

    fmodel = MultiFrameNet(C, T, variant="basic", parity_grid=True)
    rng = np.random.default_rng(11)
    seg = rng.uniform(0, 1, (1, T, H, W, C)).astype(np.float32)
    flow = rng.uniform(-4, 4, (1, T - 1, H, W, 2)).astype(np.float32)
    depth = rng.uniform(0, 1, (1, T, H, W, 1)).astype(np.float32)

    # assemble the torch NCHW input: [N*K seg][2(K-1) flow][K depth]
    seg_t = np.concatenate(
        [np.moveaxis(seg[:, i], -1, 1) for i in range(T)], axis=1
    )
    flow_t = np.concatenate(
        [np.moveaxis(flow[:, i], -1, 1) for i in range(T - 1)], axis=1
    )
    depth_t = np.concatenate(
        [np.moveaxis(depth[:, i], -1, 1) for i in range(T)], axis=1
    )
    x_t = np.concatenate([seg_t, flow_t, depth_t], axis=1)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x_t))
    want = np.moveaxis(want.numpy(), 1, -1)

    got = np.asarray(
        jax.jit(
            lambda v, s, f, d: fmodel.apply(v, s, optflow=f, depth=d)
        )(variables, jnp.asarray(seg), jnp.asarray(flow), jnp.asarray(depth))
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_raft_conversion_parity():
    """Full-size raft_large: torchvision-naming oracle -> convert_raft ->
    flax RAFT; final 12-iteration flow must match. Validates the corr
    pyramid (incl. odd-dim avg-pool), windowed lookup channel order, GRU
    update loop, and (9, 8, 8) convex-upsample mask layout."""
    from tests.torch_raft_ref import RAFTTorch
    from mfcnet_tpu.compat.torch_convert import convert_raft
    from mfcnet_tpu.models.raft import RAFT

    torch.manual_seed(7)
    tmodel = RAFTTorch().eval()
    variables = convert_raft(_state_dict_np(tmodel))

    iters = 12
    fmodel = RAFT(iters=iters)
    rng = np.random.default_rng(7)
    # 128x160 -> 1/8 pyramid 16x20, 8x10, 4x5, 2x2 (odd-dim floor at L3)
    a = rng.uniform(-1, 1, (1, 128, 160, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 128, 160, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(np.moveaxis(a, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(b, -1, 1).copy()),
            num_flow_updates=iters,
        )[-1]
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, a, b: fmodel.apply(v, a, b))(
            variables, jnp.asarray(a), jnp.asarray(b)
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_raft_flow_conditioned_mfcnet_parity():
    """The VERDICT r1 gate: heatmaps through a FLOW-CONDITIONED MFCNet
    forward with RAFT as the frozen provider, torch vs converted flax.

    Mirrors src/engine.py:39-64 for a 'Basic' model: per pair i>=1,
    flow_i = RAFT(frame_i, frame_0); base seg maps + flows + depth fused by
    the warped Basic head."""
    from tests.torch_raft_ref import RAFTTorch
    from tests.torch_ref import (
        MultiFrameNetBasicFlowTorch,
        TernausNet16Torch,
    )
    from mfcnet_tpu.compat.torch_convert import (
        _multiframe_head,
        convert_raft,
        convert_ternausnet,
    )
    from mfcnet_tpu.models.raft import RAFT

    iters = 3
    Hf, Wf = 128, 160
    torch.manual_seed(13)
    raft_t = RAFTTorch().eval()
    base_t = TernausNet16Torch(C, num_filters=NF, width_mult=WM).eval()
    fuse_t = MultiFrameNetBasicFlowTorch(C, T, with_depth=True).eval()

    raft_v = convert_raft(_state_dict_np(raft_t))
    base_v = convert_ternausnet(_state_dict_np(base_t), "TernausNet16")
    head_params, head_stats = _multiframe_head(
        _state_dict_np(fuse_t), "multiframe_net"
    )

    rng = np.random.default_rng(13)
    frames = rng.uniform(-1, 1, (1, T, Hf, Wf, 3)).astype(np.float32)
    depth = rng.uniform(0, 1, (1, T, Hf, Wf, 1)).astype(np.float32)

    # --- torch chain (engine.py semantics) ---
    with torch.no_grad():
        tframes = [
            torch.from_numpy(np.moveaxis(frames[:, i], -1, 1).copy())
            for i in range(T)
        ]
        tdepth = [
            torch.from_numpy(np.moveaxis(depth[:, i], -1, 1).copy())
            for i in range(T)
        ]
        segs = [base_t(f).exp() for f in tframes]
        flows = [
            raft_t(tframes[i], tframes[0], num_flow_updates=iters)[-1]
            for i in range(1, T)
        ]
        x_t = torch.cat(segs + flows + tdepth, dim=1)
        want = fuse_t(x_t)
    want = np.moveaxis(want.numpy(), 1, -1)

    # --- flax chain ---
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16

    base_f = TernausNet16(num_classes=C, num_filters=NF,
                          stage_convs=SCALED_STAGES)
    fmodel = MultiFrameSegmenter(
        base=base_f, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = {
        "params": {
            "base": base_v["params"],
            "multiframe_net": {"head": head_params},
        },
        "batch_stats": {"multiframe_net": {"head": head_stats}},
    }
    raft_f = RAFT(iters=iters)

    @jax.jit
    def fwd(raft_v, variables, frames, depth):
        flows = jnp.stack(
            [
                raft_f.apply(raft_v, frames[:, i], frames[:, 0])
                for i in range(1, T)
            ],
            axis=1,
        )
        return fmodel.apply(variables, frames, optflow=flows, depth=depth)

    got = np.asarray(
        fwd(raft_v, variables, jnp.asarray(frames), jnp.asarray(depth))
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_segformer_conversion_parity():
    """smp Segformer(mit_b3 structure, logsoftmax head): smp-naming oracle
    -> convert_segformer -> flax; log-prob maps must match. Real mit_b3
    depths (3,4,18,3) so every checkpoint key name is exercised; widths
    shrunk for speed."""
    from tests.torch_segformer_ref import SegformerTorch
    from mfcnet_tpu.compat.torch_convert import convert_segformer
    from mfcnet_tpu.models.segformer import SegFormerMiTB3

    dims, heads = (16, 32, 40, 64), (1, 2, 5, 8)
    depths, srs = (3, 4, 18, 3), (8, 4, 2, 1)
    dd = 32
    torch.manual_seed(17)
    tmodel = SegformerTorch(
        C, dims=dims, heads=heads, depths=depths, sr_ratios=srs,
        decoder_dim=dd,
    ).eval()
    variables = convert_segformer(_state_dict_np(tmodel), depths, srs)

    fmodel = SegFormerMiTB3(
        num_classes=C, decoder_dim=dd, dims=dims, depths=depths,
        heads=heads, sr_ratios=srs,
    )
    x = np.random.default_rng(17).standard_normal((1, 64, 64, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, x: fmodel.apply(v, x))(variables, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_resunet_conversion_parity():
    """ResUnet_VB: reference-naming oracle -> convert_resunet -> flax;
    validates WS-conv raw-kernel conversion and the pixel-unshuffle
    channel order feeding the 1x1 downsample convs."""
    from tests.torch_resunet_ref import ResUnetVBTorch
    from mfcnet_tpu.compat.torch_convert import convert_resunet
    from mfcnet_tpu.models.resunet import ResUNetVB

    torch.manual_seed(19)
    tmodel = ResUnetVBTorch(channels=3, dim=16, out_dim=C).eval()
    variables = convert_resunet(_state_dict_np(tmodel))

    fmodel = ResUNetVB(out_channels=C, dim=16)
    x = np.random.default_rng(19).standard_normal((1, 64, 64, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, x: fmodel.apply(v, x))(variables, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_flowformerpp_conversion_parity():
    """Full-default-dims FlowFormer++ ('things' path): reference-naming
    oracle -> convert_flowformerpp -> flax; final flow must match.
    Exercises the timm twins encoders (fused qkv / GSA), the RPE+Context
    vertical twins attention, the cost perceiver, and the GMA decoder."""
    from tests.torch_ffpp_ref import FlowFormerTorch
    from mfcnet_tpu.compat.torch_convert import convert_flowformerpp
    from mfcnet_tpu.models.flowformerpp import FlowFormerPP

    iters = 2
    torch.manual_seed(23)
    tmodel = FlowFormerTorch(decoder_depth=iters).eval()
    variables = convert_flowformerpp(_state_dict_np(tmodel))

    fmodel = FlowFormerPP(iters=iters)
    rng = np.random.default_rng(23)
    # 96x96: H1=12 exercises window padding (ws=7 -> 14) in both the timm
    # LSA and the vertical RPE attention
    a = rng.uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(np.moveaxis(a, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(b, -1, 1).copy()),
        )
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, a, b: fmodel.apply(v, a, b))(
            {"params": variables["params"]}, jnp.asarray(a), jnp.asarray(b)
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_flowformerpp_default_depth_12iter_parity():
    """FULL default decoder depth: 12 recurrent GRU iterations
    (reference decoder.py:308-352, cfg decoder_depth=12 in
    ffpp_cfg_things.py:66) — pins error accumulation through the cached
    cross-attention + GMA + SepConvGRU recurrence, which the 2-iter case
    above cannot see. 64x64 input (cost maps 8x8, ws=7 window padding
    still exercised). Tolerance 2e-3 as for the 2-iter case: the per-iter
    flax/torch divergence is dominated by the non-accumulating final
    convex upsample, not by GRU drift."""
    from tests.torch_ffpp_ref import FlowFormerTorch
    from mfcnet_tpu.compat.torch_convert import convert_flowformerpp
    from mfcnet_tpu.models.flowformerpp import FlowFormerPP

    iters = 12
    torch.manual_seed(29)
    tmodel = FlowFormerTorch(decoder_depth=iters).eval()
    variables = convert_flowformerpp(_state_dict_np(tmodel))

    fmodel = FlowFormerPP(iters=iters)
    rng = np.random.default_rng(29)
    a = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(np.moveaxis(a, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(b, -1, 1).copy()),
        )
    want = np.moveaxis(want.numpy(), 1, -1)
    got = np.asarray(
        jax.jit(lambda v, a, b: fmodel.apply(v, a, b))(
            {"params": variables["params"]}, jnp.asarray(a), jnp.asarray(b)
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_ffpp_flow_conditioned_mfcnet_parity():
    """Heatmaps through a FLOW-CONDITIONED MFCNet forward with
    FlowFormer++ as the frozen provider, torch vs converted flax —
    the FFPP analogue of test_raft_flow_conditioned_mfcnet_parity.

    Mirrors src/engine.py:39-53 for a 'Basic' model INCLUDING the
    0.225/0.5 input-range hack applied to the flow model's inputs only
    (:43,:47): per pair i>=1, flow_i = FFPP(scaled frame_i, scaled
    frame_0); base seg maps on the unscaled frames + flows + depth fused
    by the warped Basic head."""
    from tests.torch_ffpp_ref import FlowFormerTorch
    from tests.torch_ref import (
        MultiFrameNetBasicFlowTorch,
        TernausNet16Torch,
    )
    from mfcnet_tpu.compat.torch_convert import (
        _multiframe_head,
        convert_flowformerpp,
        convert_ternausnet,
    )
    from mfcnet_tpu.models.flowformerpp import make_ffpp_flow_fn, FlowFormerPP

    iters = 4
    Hf, Wf = 64, 64
    torch.manual_seed(31)
    ffpp_t = FlowFormerTorch(decoder_depth=iters).eval()
    base_t = TernausNet16Torch(C, num_filters=NF, width_mult=WM).eval()
    fuse_t = MultiFrameNetBasicFlowTorch(C, T, with_depth=True).eval()

    ffpp_v = convert_flowformerpp(_state_dict_np(ffpp_t))
    base_v = convert_ternausnet(_state_dict_np(base_t), "TernausNet16")
    head_params, head_stats = _multiframe_head(
        _state_dict_np(fuse_t), "multiframe_net"
    )

    rng = np.random.default_rng(31)
    frames = rng.uniform(-1, 1, (1, T, Hf, Wf, 3)).astype(np.float32)
    depth = rng.uniform(0, 1, (1, T, Hf, Wf, 1)).astype(np.float32)

    # --- torch chain (engine.py semantics incl. the range hack) ---
    with torch.no_grad():
        tframes = [
            torch.from_numpy(np.moveaxis(frames[:, i], -1, 1).copy())
            for i in range(T)
        ]
        tdepth = [
            torch.from_numpy(np.moveaxis(depth[:, i], -1, 1).copy())
            for i in range(T)
        ]
        segs = [base_t(f).exp() for f in tframes]
        scale = 0.225 / 0.5
        flows = [
            ffpp_t(tframes[i] * scale, tframes[0] * scale)
            for i in range(1, T)
        ]
        x_t = torch.cat(segs + flows + tdepth, dim=1)
        want = fuse_t(x_t)
    want = np.moveaxis(want.numpy(), 1, -1)

    # --- flax chain (the production flow_fn path) ---
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16

    base_f = TernausNet16(num_classes=C, num_filters=NF,
                          stage_convs=SCALED_STAGES)
    fmodel = MultiFrameSegmenter(
        base=base_f, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = {
        "params": {
            "base": base_v["params"],
            "multiframe_net": {"head": head_params},
        },
        "batch_stats": {"multiframe_net": {"head": head_stats}},
    }
    flow_fn = make_ffpp_flow_fn(
        basic=True, iters=iters, variables={"params": ffpp_v["params"]}
    )

    @jax.jit
    def fwd(variables, frames, depth):
        flows = flow_fn(frames)
        return fmodel.apply(variables, frames, optflow=flows, depth=depth)

    got = np.asarray(fwd(variables, jnp.asarray(frames), jnp.asarray(depth)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
