"""PyTorch ``.pth`` checkpoint -> flax params conversion.

Required by the parity gate (BASELINE.json): published reference checkpoints
must reproduce heatmaps within 1e-3. Conversions here are *exact* (pure
layout transposition):

  * Conv2d weight OIHW -> HWIO: ``transpose(2, 3, 1, 0)``
  * ConvTranspose2d weight (in, out, kh, kw) -> the dense-conv-equivalent
    (kh, kw, in, out) layout used by
    :class:`mfcnet_tpu.models.common.TorchConvTranspose`: spatial flip then
    ``transpose(2, 3, 0, 1)``
  * BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats

The reference saves ``{model, optimizer, epoch}`` dicts with optional
DataParallel ``module.`` prefixes (utils/model_utils.py:14-39); loading
handles both.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path) -> Tuple[Dict[str, np.ndarray], int]:
    """Load a reference checkpoint to {key: np.ndarray}, stripping
    DataParallel 'module.' prefixes; returns (state_dict, epoch)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    epoch = 0
    if isinstance(blob, dict) and "model" in blob:
        epoch = int(blob.get("epoch", 0))
        sd = blob["model"]
    else:
        sd = blob
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else v
    return out, epoch


def _conv(sd, key, bias=True):
    p = {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0)}
    if bias and f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def _deconv(sd, key):
    w = sd[f"{key}.weight"]  # (in, out, kh, kw)
    p = {"kernel": np.flip(w, axis=(2, 3)).transpose(2, 3, 0, 1).copy()}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def _bn(sd, key):
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}
    return params, stats


# torchvision vgg .features conv indices
VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
VGG11_CONV_IDX = (0, 3, 6, 8, 11, 13, 16, 18)


def _decoder_block(sd, prefix):
    """torch DecoderBlock (deconv variant): block.0 = ConvRelu(conv),
    block.1 = ConvTranspose2d (reference: models/ternausnet.py:33-36)."""
    return {
        "ConvReLU_0": {"Conv_0": _conv(sd, f"{prefix}.block.0.conv")},
        "TorchConvTranspose_0": _deconv(sd, f"{prefix}.block.1"),
    }


def convert_ternausnet(sd: Dict[str, np.ndarray], arch: str = "TernausNet16"):
    """Reference TernausNet11/16 state_dict -> flax {'params': ...} tree."""
    conv_idx = VGG16_CONV_IDX if arch == "TernausNet16" else VGG11_CONV_IDX
    params = {
        "encoder": {
            f"Conv_{i}": _conv(sd, f"encoder.{idx}")
            for i, idx in enumerate(conv_idx)
        }
    }
    for name in ("center", "dec5", "dec4", "dec3", "dec2"):
        params[name] = _decoder_block(sd, name)
    params["dec1"] = {"Conv_0": _conv(sd, "dec1.conv")}
    params["final"] = _conv(sd, "final")
    return {"params": params}


def _multiframe_head(sd, prefix):
    """MultiFrameNet head Sequential indices 0,1,3,4,6,7,9
    (reference: models/multiframe_model.py:62-73)."""
    params = {
        "Conv_0": _conv(sd, f"{prefix}.0", bias=False),
        "Conv_1": _conv(sd, f"{prefix}.3", bias=False),
        "Conv_2": _conv(sd, f"{prefix}.6", bias=False),
        "Conv_3": _conv(sd, f"{prefix}.9", bias=False),
    }
    stats = {}
    for i, tidx in enumerate((1, 4, 7)):
        p, s = _bn(sd, f"{prefix}.{tidx}")
        params[f"BatchNorm_{i}"] = p
        stats[f"BatchNorm_{i}"] = s
    return params, stats


def convert_multiframe_ternausnet(
    sd: Dict[str, np.ndarray], arch: str = "TernausNet16"
):
    """Reference TernausNetMulti{Basic,Large} -> flax variables
    (params + batch_stats) for MultiFrameSegmenter."""
    base = convert_ternausnet(
        {
            k[len("base_model."):]: v
            for k, v in sd.items()
            if k.startswith("base_model.")
        },
        arch,
    )["params"]
    head_params, head_stats = _multiframe_head(
        sd, "multiframe_net.multiframe_net"
    )
    return {
        "params": {
            "base": base,
            "multiframe_net": {"head": head_params},
        },
        "batch_stats": {
            "multiframe_net": {"head": head_stats},
        },
    }


# ---------------------------------------------------------------------------
# UnFlow (reference checkpoint naming: moduleFlownets.{0,1,2}.module*)
# ---------------------------------------------------------------------------
def _unflow_upconv(sd, prefix):
    """Upconv decoder params (reference: models/unflow_model.py:25-88)."""
    return {
        "six_out": _conv(sd, f"{prefix}.moduleSixOut"),
        "six_up": _deconv(sd, f"{prefix}.moduleSixUp"),
        "fiv_next": _deconv(sd, f"{prefix}.moduleFivNext.0"),
        "fiv_out": _conv(sd, f"{prefix}.moduleFivOut"),
        "fiv_up": _deconv(sd, f"{prefix}.moduleFivUp"),
        "fou_next": _deconv(sd, f"{prefix}.moduleFouNext.0"),
        "fou_out": _conv(sd, f"{prefix}.moduleFouOut"),
        "fou_up": _deconv(sd, f"{prefix}.moduleFouUp"),
        "thr_next": _deconv(sd, f"{prefix}.moduleThrNext.0"),
        "thr_out": _conv(sd, f"{prefix}.moduleThrOut"),
        "thr_up": _deconv(sd, f"{prefix}.moduleThrUp"),
        "two_next": _deconv(sd, f"{prefix}.moduleTwoNext.0"),
        "two_out": _conv(sd, f"{prefix}.moduleTwoOut"),
        # applied twice with shared weights (:87)
        "upscale": _deconv(sd, f"{prefix}.moduleUpscale.0"),
    }


def convert_unflow(sd: Dict[str, np.ndarray]):
    """Reference UnFlow .pth -> flax variables for models/unflow.py.

    Sequential indices: module{One,Two,Thr}[1] are the convs after the
    ZeroPad2d at [0]; module{Fou,Fiv,Six}[1]/[3] are the stride-2/stride-1
    conv pair after the pad (reference: models/unflow_model.py:95-147,
    178-220).
    """
    complex_p = {
        "one": _conv(sd, "moduleFlownets.0.moduleOne.1"),
        "two": _conv(sd, "moduleFlownets.0.moduleTwo.1"),
        "thr": _conv(sd, "moduleFlownets.0.moduleThr.1"),
        "redir": _conv(sd, "moduleFlownets.0.moduleRedir.0"),
        "combined": _conv(sd, "moduleFlownets.0.moduleCombined.0"),
        "fou_a": _conv(sd, "moduleFlownets.0.moduleFou.1"),
        "fou_b": _conv(sd, "moduleFlownets.0.moduleFou.3"),
        "fiv_a": _conv(sd, "moduleFlownets.0.moduleFiv.1"),
        "fiv_b": _conv(sd, "moduleFlownets.0.moduleFiv.3"),
        "six_a": _conv(sd, "moduleFlownets.0.moduleSix.1"),
        "six_b": _conv(sd, "moduleFlownets.0.moduleSix.3"),
        "upconv": _unflow_upconv(sd, "moduleFlownets.0.moduleUpconv"),
    }

    def simple(i):
        p = f"moduleFlownets.{i}"
        return {
            "one": _conv(sd, f"{p}.moduleOne.1"),
            "two": _conv(sd, f"{p}.moduleTwo.1"),
            "thr_a": _conv(sd, f"{p}.moduleThr.1"),
            "thr_b": _conv(sd, f"{p}.moduleThr.3"),
            "fou_a": _conv(sd, f"{p}.moduleFou.1"),
            "fou_b": _conv(sd, f"{p}.moduleFou.3"),
            "fiv_a": _conv(sd, f"{p}.moduleFiv.1"),
            "fiv_b": _conv(sd, f"{p}.moduleFiv.3"),
            "six_a": _conv(sd, f"{p}.moduleSix.1"),
            "six_b": _conv(sd, f"{p}.moduleSix.3"),
            "upconv": _unflow_upconv(sd, f"{p}.moduleUpconv"),
        }

    return {
        "params": {
            "flownet0": complex_p,
            "flownet1": simple(1),
            "flownet2": simple(2),
        }
    }


# ---------------------------------------------------------------------------
# torchvision segmentation models: fcn_resnet101 / deeplabv3_resnet101
# (reference loads these as base models: models/__init__.py:32-37)
# ---------------------------------------------------------------------------
def _resnet_backbone(sd, layers=(3, 4, 23, 3), prefix="backbone."):
    params = {"conv1": _conv(sd, f"{prefix}conv1", bias=False)}
    stats = {}
    p, s = _bn(sd, f"{prefix}bn1")
    params["bn1"], stats["bn1"] = p, s
    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            tp = f"{prefix}layer{li + 1}.{bi}"
            name = f"layer{li + 1}_block{bi}"
            bp = {
                "conv1": _conv(sd, f"{tp}.conv1", bias=False),
                "conv2": _conv(sd, f"{tp}.conv2", bias=False),
                "conv3": _conv(sd, f"{tp}.conv3", bias=False),
            }
            bs = {}
            for i in (1, 2, 3):
                p, s = _bn(sd, f"{tp}.bn{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = p, s
            if f"{tp}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(sd, f"{tp}.downsample.0", bias=False)
                p, s = _bn(sd, f"{tp}.downsample.1")
                bp["down_bn"], bs["down_bn"] = p, s
            params[name], stats[name] = bp, bs
    return params, stats


def convert_fcn_resnet101(sd: Dict[str, np.ndarray], layers=(3, 4, 23, 3)):
    """torchvision fcn_resnet101 (FCNHead-swapped) -> flax variables.

    classifier naming: Sequential[conv3x3, BN, ReLU, Dropout, conv1x1]
    -> indices 0, 1, 4."""
    bparams, bstats = _resnet_backbone(sd, layers)
    head_params = {
        "conv": _conv(sd, "classifier.0", bias=False),
        "final": _conv(sd, "classifier.4"),
    }
    head_stats = {}
    p, s = _bn(sd, "classifier.1")
    head_params["bn"], head_stats["bn"] = p, s
    return {
        "params": {"backbone": bparams, "classifier": head_params},
        "batch_stats": {"backbone": bstats, "classifier": head_stats},
    }


def convert_deeplabv3_resnet101(
    sd: Dict[str, np.ndarray], layers=(3, 4, 23, 3)
):
    """torchvision deeplabv3_resnet101 (DeepLabHead-swapped) -> flax.

    DeepLabHead naming: classifier.0 = ASPP (convs.0 = conv1x1+bn,
    convs.1-3 = ASPPConv, convs.4 = ASPPPooling[pool, conv, bn], project),
    classifier.1 = conv3x3, classifier.2 = BN, classifier.4 = final."""
    bparams, bstats = _resnet_backbone(sd, layers)
    aspp_p, aspp_s = {}, {}
    aspp_p["conv1x1"] = _conv(sd, "classifier.0.convs.0.0", bias=False)
    p, s = _bn(sd, "classifier.0.convs.0.1")
    aspp_p["bn1x1"], aspp_s["bn1x1"] = p, s
    for i in range(3):
        cp = {"conv": _conv(sd, f"classifier.0.convs.{i + 1}.0", bias=False)}
        cs = {}
        p, s = _bn(sd, f"classifier.0.convs.{i + 1}.1")
        cp["bn"], cs["bn"] = p, s
        aspp_p[f"aspp_conv{i}"], aspp_s[f"aspp_conv{i}"] = cp, cs
    aspp_p["pool_conv"] = _conv(sd, "classifier.0.convs.4.1", bias=False)
    p, s = _bn(sd, "classifier.0.convs.4.2")
    aspp_p["pool_bn"], aspp_s["pool_bn"] = p, s
    aspp_p["project"] = _conv(sd, "classifier.0.project.0", bias=False)
    p, s = _bn(sd, "classifier.0.project.1")
    aspp_p["project_bn"], aspp_s["project_bn"] = p, s

    head_params = {
        "aspp": aspp_p,
        "conv": _conv(sd, "classifier.1", bias=False),
        "final": _conv(sd, "classifier.4"),
    }
    head_stats = {"aspp": aspp_s}
    p, s = _bn(sd, "classifier.2")
    head_params["bn"], head_stats["bn"] = p, s
    return {
        "params": {"backbone": bparams, "classifier": head_params},
        "batch_stats": {"backbone": bstats, "classifier": head_stats},
    }


def convert_vgg_features(sd: Dict[str, np.ndarray],
                         arch: str = "TernausNet16"):
    """torchvision vgg11/16 ``features.N`` weights -> the VGGFeatures
    encoder subtree (for ``pretrained=True`` initialization of
    TernausNet/TAPNet encoders, reference models/ternausnet.py:112)."""
    conv_idx = VGG16_CONV_IDX if "16" in arch else VGG11_CONV_IDX
    return {
        f"Conv_{i}": _conv(sd, f"features.{idx}")
        for i, idx in enumerate(conv_idx)
    }


# ---------------------------------------------------------------------------
# HRNet-W48 (reference models/hrnet.py naming, checkpoint
# hrnet_cs_8090_torch11.pth; registry head swap at models/__init__.py:38-46)
# ---------------------------------------------------------------------------
def _hrnet_bottleneck(sd, tp):
    """torch Bottleneck -> flax auto-named Conv_0..3 / BatchNorm_0..3."""
    params, stats = {}, {}
    for i, name in enumerate(("conv1", "conv2", "conv3")):
        params[f"Conv_{i}"] = _conv(sd, f"{tp}.{name}", bias=False)
        p, s = _bn(sd, f"{tp}.bn{i + 1}")
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = p, s
    if f"{tp}.downsample.0.weight" in sd:
        params["Conv_3"] = _conv(sd, f"{tp}.downsample.0", bias=False)
        p, s = _bn(sd, f"{tp}.downsample.1")
        params["BatchNorm_3"], stats["BatchNorm_3"] = p, s
    return params, stats


def _hrnet_basicblock(sd, tp):
    params, stats = {}, {}
    for i in (1, 2):
        params[f"Conv_{i - 1}"] = _conv(sd, f"{tp}.conv{i}", bias=False)
        p, s = _bn(sd, f"{tp}.bn{i}")
        params[f"BatchNorm_{i - 1}"], stats[f"BatchNorm_{i - 1}"] = p, s
    return params, stats


def convert_hrnet(
    sd: Dict[str, np.ndarray],
    channels=(48, 96, 192, 384),
    stage_modules=(1, 4, 3),
    num_blocks: int = 4,
    stage1_blocks: int = 4,
    with_head: bool = True,
):
    """Reference HighResolutionNet state_dict -> flax HRNetW48 variables."""
    params, stats = {}, {}
    for i, nm in ((1, "stem1"), (2, "stem2")):
        params[nm] = _conv(sd, f"conv{i}", bias=False)
        p, s = _bn(sd, f"bn{i}")
        params[f"{nm}_bn"], stats[f"{nm}_bn"] = p, s
    for b in range(stage1_blocks):
        p, s = _hrnet_bottleneck(sd, f"layer1.{b}")
        params[f"layer1_{b}"], stats[f"layer1_{b}"] = p, s

    # transitions: t1 branch0 conv (transition1.0.{0,1}), new-branch convs
    # live in a nested Sequential (transition{n}.{i}.0.{0,1})
    params["t1_0"] = _conv(sd, "transition1.0.0", bias=False)
    p, s = _bn(sd, "transition1.0.1")
    params["t1_0_bn"], stats["t1_0_bn"] = p, s
    params["t1_1"] = _conv(sd, "transition1.1.0.0", bias=False)
    p, s = _bn(sd, "transition1.1.0.1")
    params["t1_1_bn"], stats["t1_1_bn"] = p, s
    params["t2"] = _conv(sd, "transition2.2.0.0", bias=False)
    p, s = _bn(sd, "transition2.2.0.1")
    params["t2_bn"], stats["t2_bn"] = p, s
    params["t3"] = _conv(sd, "transition3.3.0.0", bias=False)
    p, s = _bn(sd, "transition3.3.0.1")
    params["t3_bn"], stats["t3_bn"] = p, s

    for si, n_mod in enumerate(stage_modules):
        stage = si + 2
        n_br = stage
        for m in range(n_mod):
            mp, ms = {}, {}
            tp = f"stage{stage}.{m}"
            for br in range(n_br):
                for b in range(num_blocks):
                    p, s = _hrnet_basicblock(
                        sd, f"{tp}.branches.{br}.{b}"
                    )
                    mp[f"branch{br}_block{b}"] = p
                    ms[f"branch{br}_block{b}"] = s
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        mp[f"fuse{i}_{j}_conv"] = _conv(
                            sd, f"{tp}.fuse_layers.{i}.{j}.0", bias=False
                        )
                        p, s = _bn(sd, f"{tp}.fuse_layers.{i}.{j}.1")
                        mp[f"fuse{i}_{j}_bn"] = p
                        ms[f"fuse{i}_{j}_bn"] = s
                    elif j < i:
                        for k in range(i - j):
                            mp[f"fuse{i}_{j}_down{k}"] = _conv(
                                sd, f"{tp}.fuse_layers.{i}.{j}.{k}.0",
                                bias=False,
                            )
                            p, s = _bn(
                                sd, f"{tp}.fuse_layers.{i}.{j}.{k}.1"
                            )
                            mp[f"fuse{i}_{j}_down{k}_bn"] = p
                            ms[f"fuse{i}_{j}_down{k}_bn"] = s
            params[f"stage{stage}_m{m}"] = mp
            stats[f"stage{stage}_m{m}"] = ms

    if with_head and "last_layer.0.weight" in sd:
        params["head1"] = _conv(sd, "last_layer.0")
        p, s = _bn(sd, "last_layer.1")
        params["head_bn"], stats["head_bn"] = p, s
        params["head2"] = _conv(sd, "last_layer.3")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# TAPNet11/16 (reference models/tap_model.py naming)
# ---------------------------------------------------------------------------
def _conv2drelu(sd, prefix):
    """Conv2dReLU -> {'Conv_0': ...} (torch key '{prefix}.l.conv')."""
    return {"Conv_0": _conv(sd, f"{prefix}.l.conv")}


def _tap_decoder(sd, prefix, upsample: bool):
    """DecoderModule (reference tap_model.py:56-91): upsample variant keys
    '{p}.l.conv1/.l.conv2' (Conv2dReLU each); deconv variant '{p}.l.conv'
    (Conv2dReLU) + '{p}.l.deconv' (ConvTranspose2d)."""
    if upsample:
        return {
            "ConvReLU_0": {"Conv_0": _conv(sd, f"{prefix}.l.conv1.l.conv")},
            "ConvReLU_1": {"Conv_0": _conv(sd, f"{prefix}.l.conv2.l.conv")},
        }
    return {
        "ConvReLU_0": {"Conv_0": _conv(sd, f"{prefix}.l.conv.l.conv")},
        "TorchConvTranspose_0": _deconv(sd, f"{prefix}.l.deconv"),
    }


def _tap_attention(sd, prefix):
    """AttentionModule (tap_model.py:93-118): firstconv Conv2dReLU +
    learnable_attmap Sequential(Conv2dReLU(1x1), Sigmoid)."""
    return {
        "ConvReLU_0": {"Conv_0": _conv(sd, f"{prefix}.firstconv.l.conv")},
        "att_conv": _conv(sd, f"{prefix}.learnable_attmap.0.l.conv"),
    }


def convert_tapnet(sd: Dict[str, np.ndarray], arch: str = "TAPNet16"):
    """Reference TAPNet11/16 state_dict -> flax variables."""
    if arch == "TAPNet16":
        conv_idx, upsample, vgg_key = VGG16_CONV_IDX, True, "vgg16"
    else:
        conv_idx, upsample, vgg_key = VGG11_CONV_IDX, False, "vgg11"
    body = {
        "encoder": {
            f"Conv_{i}": _conv(sd, f"{vgg_key}.{idx}")
            for i, idx in enumerate(conv_idx)
        }
    }
    for name in ("center", "dec5", "dec4", "dec3", "dec2"):
        body[name] = _tap_decoder(sd, name, upsample)
    for name in ("att5", "att4", "att3", "att2", "att1"):
        body[name] = _tap_attention(sd, name)
    body["dec1"] = {"Conv_0": _conv(sd, "dec1.l.conv")}
    body["final"] = _conv(sd, "final")
    return {"params": {"body": body}}


# ---------------------------------------------------------------------------
# ResUNet (reference models/resunet.py:97-180 naming)
# ---------------------------------------------------------------------------
def _gn(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _resunet_block(sd, prefix):
    """ResnetBlock -> flax ResBlock (WSConv stores the RAW kernel; the
    standardization is recomputed at forward in both frameworks)."""
    p = {
        "WSConv_0": _conv(sd, f"{prefix}.block1.proj"),
        "GroupNorm_0": _gn(sd, f"{prefix}.block1.norm"),
        "WSConv_1": _conv(sd, f"{prefix}.block2.proj"),
        "GroupNorm_1": _gn(sd, f"{prefix}.block2.norm"),
    }
    if f"{prefix}.res_conv.weight" in sd:
        p["Conv_0"] = _conv(sd, f"{prefix}.res_conv")
    return p


def convert_resunet(sd: Dict[str, np.ndarray], num_stages: int = 4):
    """Reference ResUnet_VB state_dict -> flax ResUNetVB variables.

    Flax auto-naming order (models/resunet.py ResUNetVB.__call__):
    down i -> ResBlock_i + Conv_i (downsample 1x1 after pixel-unshuffle for
    i<last; plain 3x3 for last), mid -> ResBlock_{n}, up i -> ResBlock_{n+1+i}
    + Conv_{n+i} (3x3 after nearest-2x for i<last; plain 3x3 for last),
    final -> ResBlock_{2n+1}. The pixel-unshuffle channel order
    (c*4 + p1*2 + p2) matches torch's Rearrange, so the 1x1 downsample
    weights convert without permutation."""
    n = num_stages
    params = {"init_conv": _conv(sd, "init_conv")}
    for i in range(n):
        params[f"ResBlock_{i}"] = _resunet_block(sd, f"downs.{i}.0")
        key = f"downs.{i}.1.1" if i < n - 1 else f"downs.{i}.1"
        params[f"Conv_{i}"] = _conv(sd, key)
    params[f"ResBlock_{n}"] = _resunet_block(sd, "mid_block")
    for i in range(n):
        params[f"ResBlock_{n + 1 + i}"] = _resunet_block(sd, f"ups.{i}.0")
        key = f"ups.{i}.1.1" if i < n - 1 else f"ups.{i}.1"
        params[f"Conv_{n + i}"] = _conv(sd, key)
    params[f"ResBlock_{2 * n + 1}"] = _resunet_block(sd, "final_res_block")
    params["output_layer"] = _conv(sd, "output_layer")
    return {"params": params}


# ---------------------------------------------------------------------------
# SegFormer (smp.Segformer(mit_b3, activation='logsoftmax') naming —
# reference models/__init__.py:6,47-49)
# ---------------------------------------------------------------------------
def _linear(sd, key):
    """torch nn.Linear (out, in) -> flax Dense kernel (in, out)."""
    p = {"kernel": sd[f"{key}.weight"].transpose(1, 0)}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def convert_segformer(
    sd: Dict[str, np.ndarray],
    depths=(3, 4, 18, 3),
    sr_ratios=(8, 4, 2, 1),
):
    """smp Segformer state_dict -> flax variables for
    :class:`mfcnet_tpu.models.segformer.SegFormerMiTB3`.

    Key layout: ``encoder.*`` is smp's vendored NVlabs MixVisionTransformer;
    ``decoder.mlp_stage.{0-3}`` maps c4..c1 projections; ``decoder.
    fuse_stage.{0,1}`` is Conv2dReLU; ``segmentation_head.0`` the 3x3 conv
    (upsampling + LogSoftmax are parameter-free)."""
    enc = {}
    enc_stats = {}
    for s in range(4):
        enc[f"embed{s + 1}"] = {
            "Conv_0": _conv(sd, f"encoder.patch_embed{s + 1}.proj"),
            "LayerNorm_0": _ln(sd, f"encoder.patch_embed{s + 1}.norm"),
        }
        for b in range(depths[s]):
            tp = f"encoder.block{s + 1}.{b}"
            attn = {
                "q": _linear(sd, f"{tp}.attn.q"),
                "kv": _linear(sd, f"{tp}.attn.kv"),
                "proj": _linear(sd, f"{tp}.attn.proj"),
            }
            if sr_ratios[s] > 1:
                attn["sr"] = _conv(sd, f"{tp}.attn.sr")
                attn["sr_norm"] = _ln(sd, f"{tp}.attn.norm")
            enc[f"stage{s + 1}_block{b}"] = {
                "LayerNorm_0": _ln(sd, f"{tp}.norm1"),
                "EfficientAttention_0": attn,
                "LayerNorm_1": _ln(sd, f"{tp}.norm2"),
                "MixFFN_0": {
                    "fc1": _linear(sd, f"{tp}.mlp.fc1"),
                    "dwconv": _conv(sd, f"{tp}.mlp.dwconv.dwconv"),
                    "fc2": _linear(sd, f"{tp}.mlp.fc2"),
                },
            }
        enc[f"norm{s + 1}"] = _ln(sd, f"encoder.norm{s + 1}")
    params = {"encoder": enc}
    # decoder.mlp_stage.0 projects c4 (deepest) ... .3 projects c1
    for i in range(4):
        params[f"linear_c{4 - i}"] = _linear(
            sd, f"decoder.mlp_stage.{i}.linear"
        )
    params["fuse"] = {
        "kernel": sd["decoder.fuse_stage.0.weight"].transpose(2, 3, 1, 0)
    }
    bnp, bns = _bn(sd, "decoder.fuse_stage.1")
    params["fuse_bn"] = bnp
    params["pred"] = _conv(sd, "segmentation_head.0")
    stats = dict(enc_stats)
    stats["fuse_bn"] = bns
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# RAFT (torchvision raft_large naming — the reference's default flow
# provider: configs/config_multiframe.py:75, loaded at
# scripts/train_multiframe_detection.py:77-83)
# ---------------------------------------------------------------------------
def _conv_zb(sd, key):
    """Conv whose torch counterpart has no bias (Conv2dNormActivation with a
    norm layer): flax nn.Conv uses bias, so supply zeros."""
    w = sd[f"{key}.weight"]
    p = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    else:
        p["bias"] = np.zeros(w.shape[0], w.dtype)
    return p


def _raft_encoder(sd, prefix, batchnorm: bool):
    """torchvision FeatureEncoder -> flax RAFTEncoder subtree.

    Layout: convnormrelu (stem) -> Conv_0 [+ BatchNorm_0]; layer{1,2,3}.{0,1}
    -> ResidualBlock_0..5 with convnormrelu1/2 -> Conv_0/1 and downsample ->
    Conv_2 (Conv2dNormActivation puts the conv at Sequential index 0 and the
    norm at index 1); final 1x1 conv -> Conv_1."""
    params = {"Conv_0": _conv_zb(sd, f"{prefix}.convnormrelu.0")}
    stats = {}
    if batchnorm:
        p, s = _bn(sd, f"{prefix}.convnormrelu.1")
        params["BatchNorm_0"], stats["BatchNorm_0"] = p, s
    for li in range(3):
        for bi in range(2):
            tp = f"{prefix}.layer{li + 1}.{bi}"
            rb = li * 2 + bi
            bp = {
                "Conv_0": _conv_zb(sd, f"{tp}.convnormrelu1.0"),
                "Conv_1": _conv_zb(sd, f"{tp}.convnormrelu2.0"),
            }
            bs = {}
            if batchnorm:
                p, s = _bn(sd, f"{tp}.convnormrelu1.1")
                bp["BatchNorm_0"], bs["BatchNorm_0"] = p, s
                p, s = _bn(sd, f"{tp}.convnormrelu2.1")
                bp["BatchNorm_1"], bs["BatchNorm_1"] = p, s
            if f"{tp}.downsample.0.weight" in sd:
                bp["Conv_2"] = _conv_zb(sd, f"{tp}.downsample.0")
                if batchnorm:
                    p, s = _bn(sd, f"{tp}.downsample.1")
                    bp["BatchNorm_2"], bs["BatchNorm_2"] = p, s
            params[f"ResidualBlock_{rb}"] = bp
            if bs:
                stats[f"ResidualBlock_{rb}"] = bs
    params["Conv_1"] = _conv(sd, f"{prefix}.conv")
    return params, stats


def convert_raft(sd: Dict[str, np.ndarray]):
    """torchvision ``raft_large`` state_dict -> flax variables for
    :class:`mfcnet_tpu.models.raft.RAFT`.

    Channel-order quirks handled structurally on the flax side (no permutes
    needed): the corr-lookup window is x-offset-major and the convex-upsample
    mask unpacks as (9, 8, 8), both matching torchvision (models/raft.py)."""
    fnet_p, _ = _raft_encoder(sd, "feature_encoder", batchnorm=False)
    cnet_p, cnet_s = _raft_encoder(sd, "context_encoder", batchnorm=True)
    me = "update_block.motion_encoder"
    rb = "update_block.recurrent_block"
    update_p = {
        "encoder": {
            "convc1": _conv(sd, f"{me}.convcorr1.0"),
            "convc2": _conv(sd, f"{me}.convcorr2.0"),
            "convf1": _conv(sd, f"{me}.convflow1.0"),
            "convf2": _conv(sd, f"{me}.convflow2.0"),
            "conv": _conv(sd, f"{me}.conv.0"),
        },
        "gru": {
            "convz_h": _conv(sd, f"{rb}.convgru1.convz"),
            "convr_h": _conv(sd, f"{rb}.convgru1.convr"),
            "convq_h": _conv(sd, f"{rb}.convgru1.convq"),
            "convz_v": _conv(sd, f"{rb}.convgru2.convz"),
            "convr_v": _conv(sd, f"{rb}.convgru2.convr"),
            "convq_v": _conv(sd, f"{rb}.convgru2.convq"),
        },
        "flow1": _conv(sd, "update_block.flow_head.conv1"),
        "flow2": _conv(sd, "update_block.flow_head.conv2"),
        "mask1": _conv(sd, "mask_predictor.convrelu.0"),
        "mask2": _conv(sd, "mask_predictor.conv"),
    }
    return {
        "params": {
            "fnet": fnet_p,
            "cnet": cnet_p,
            "update_block": update_p,
        },
        "batch_stats": {"cnet": cnet_s},
    }


# ---------------------------------------------------------------------------
# FlowFormer++ (reference models/optical_flow/flowformerplusplus/ naming,
# default 'things' path; checkpoint ffpp_things.pth after 'module.' strip)
# ---------------------------------------------------------------------------
def _ffn_pair(sd, prefix):
    """reference ffn = Sequential(Linear, GELU, Dropout, Linear, Dropout)
    -> params at indices 0 and 3."""
    return {
        "ffn0": _linear(sd, f"{prefix}.0"),
        "ffn1": _linear(sd, f"{prefix}.3"),
    }


def _ffpp_twins_encoder(sd, prefix, depths=(2, 2)):
    """timm twins_svt_large (2-stage, encoders.py del_layers) ->
    TwinsSVTEncoder subtree."""
    p = {}
    for si in range(len(depths)):
        p[f"embed{si}"] = _conv(sd, f"{prefix}.patch_embeds.{si}.proj")
        p[f"embed_norm{si}"] = _ln(sd, f"{prefix}.patch_embeds.{si}.norm")
        p[f"pos{si}"] = {
            "conv": _conv(sd, f"{prefix}.pos_block.{si}.proj.0")
        }
        for bi in range(depths[si]):
            tp = f"{prefix}.blocks.{si}.{bi}"
            if bi % 2 == 0:  # LocallyGroupedAttn: fused qkv
                attn = {
                    "qkv": _linear(sd, f"{tp}.attn.qkv"),
                    "proj": _linear(sd, f"{tp}.attn.proj"),
                }
            else:  # GlobalSubSampleAttn
                attn = {
                    "q": _linear(sd, f"{tp}.attn.q"),
                    "kv": _linear(sd, f"{tp}.attn.kv"),
                    "sr": _conv(sd, f"{tp}.attn.sr"),
                    "norm": _ln(sd, f"{tp}.attn.norm"),
                    "proj": _linear(sd, f"{tp}.attn.proj"),
                }
            p[f"s{si}_b{bi}"] = {
                "norm1": _ln(sd, f"{tp}.norm1"),
                "attn": attn,
                "norm2": _ln(sd, f"{tp}.norm2"),
                "mlp": {
                    "fc1": _linear(sd, f"{tp}.mlp.fc1"),
                    "fc2": _linear(sd, f"{tp}.mlp.fc2"),
                },
            }
    return p


def _ffpp_vert_block(sd, prefix, is_global: bool):
    attn = {
        "context_proj": _linear(sd, f"{prefix}.attn.context_proj"),
        "q": _linear(sd, f"{prefix}.attn.q"),
        "k": _linear(sd, f"{prefix}.attn.k"),
        "v": _linear(sd, f"{prefix}.attn.v"),
        "proj": _linear(sd, f"{prefix}.attn.proj"),
    }
    if is_global:
        attn["sr_key"] = _conv(sd, f"{prefix}.attn.sr_key")
        attn["sr_value"] = _conv(sd, f"{prefix}.attn.sr_value")
        attn["norm"] = _ln(sd, f"{prefix}.attn.norm")
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": attn,
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def _ffpp_attn_layer(sd, prefix):
    """Shared layout of crossattentionlayer/SelfAttentionLayer/decoder
    CrossAttentionLayer: norm1/norm2, q/k/v/proj linears, ffn.0/.3."""
    p = {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "q": _linear(sd, f"{prefix}.q"),
        "k": _linear(sd, f"{prefix}.k"),
        "v": _linear(sd, f"{prefix}.v"),
        "proj": _linear(sd, f"{prefix}.proj"),
    }
    p.update(_ffn_pair(sd, f"{prefix}.ffn"))
    return p


def convert_flowformerpp(sd: Dict[str, np.ndarray], depth: int = 3):
    """FlowFormer++ 'things' checkpoint -> flax FlowFormerPP variables.

    The GMA RelPosEmb tables (memory_decoder.att.pos_emb.*) are present in
    checkpoints but unused by the default forward (gma.py:60-72) — dropped
    here. Unused timm leftovers (svt.norm / final-stage remnants) are
    ignored by construction since only referenced keys are read.

    Checkpoints trained with the reference's OPTIONAL branches are
    rejected up front (their parameters would be silently dropped and
    the converted model would compute a different function): NATTEN
    neighborhood attention (``.rpb`` tables — NA.py:97), SK update
    blocks (``.conv_list.`` PCBlocks — sk.py:9), and the quarter
    refinement upsampler (``quater_upsampler.`` — quater_upsampler.py).
    See the scope note in mfcnet_tpu/models/flowformerpp.py."""
    _BRANCH_MARKERS = {
        ".rpb": "NATTEN neighborhood attention "
                "(vertical_encoder_attn=NA/NA-twins, NA.py:97)",
        ".conv_list.": "SK update blocks (gma=GMA-SK, sk.py:9)",
        "quater_upsampler.": "quarter refinement upsampler "
                             "(quater_refine=True, quater_upsampler.py)",
    }
    for marker, what in _BRANCH_MARKERS.items():
        hits = [k for k in sd if marker in k]
        if hits:
            raise NotImplementedError(
                f"FlowFormer++ checkpoint contains {what} parameters "
                f"(e.g. {hits[0]!r}): this optional reference branch is "
                "not implemented — converting would silently drop these "
                "weights. See the scope note in "
                "mfcnet_tpu/models/flowformerpp.py."
            )
    cpe = "memory_encoder.cost_perceiver_encoder"
    dec = "memory_decoder"
    perceiver = {
        "patch_embed": {
            "proj0": _conv(sd, f"{cpe}.patch_embed.proj.0"),
            "proj1": _conv(sd, f"{cpe}.patch_embed.proj.2"),
            "proj2": _conv(sd, f"{cpe}.patch_embed.proj.4"),
            "ffn0": _conv(sd, f"{cpe}.patch_embed.ffn_with_coord.0"),
            "ffn1": _conv(sd, f"{cpe}.patch_embed.ffn_with_coord.2"),
            "norm": _ln(sd, f"{cpe}.patch_embed.norm"),
        },
        "latent_tokens": sd[f"{cpe}.latent_tokens"],
        "input_layer": _ffpp_attn_layer(sd, f"{cpe}.input_layer"),
    }
    for i in range(depth):
        perceiver[f"self{i}"] = _ffpp_attn_layer(
            sd, f"{cpe}.encoder_layers.{i}"
        )
        vp = f"{cpe}.vertical_encoder_layers.{i}"
        perceiver[f"vert{i}_local"] = _ffpp_vert_block(
            sd, f"{vp}.local_block", is_global=False
        )
        perceiver[f"vert{i}_global"] = _ffpp_vert_block(
            sd, f"{vp}.global_block", is_global=True
        )

    update = {
        "convc1": _conv(sd, f"{dec}.update_block.encoder.convc1"),
        "convc2": _conv(sd, f"{dec}.update_block.encoder.convc2"),
        "convf1": _conv(sd, f"{dec}.update_block.encoder.convf1"),
        "convf2": _conv(sd, f"{dec}.update_block.encoder.convf2"),
        "conv": _conv(sd, f"{dec}.update_block.encoder.conv"),
        "to_v": _conv(sd, f"{dec}.update_block.aggregator.to_v"),
        "gamma": sd[f"{dec}.update_block.aggregator.gamma"],
        "gru": {
            "convz_h": _conv(sd, f"{dec}.update_block.gru.convz1"),
            "convr_h": _conv(sd, f"{dec}.update_block.gru.convr1"),
            "convq_h": _conv(sd, f"{dec}.update_block.gru.convq1"),
            "convz_v": _conv(sd, f"{dec}.update_block.gru.convz2"),
            "convr_v": _conv(sd, f"{dec}.update_block.gru.convr2"),
            "convq_v": _conv(sd, f"{dec}.update_block.gru.convq2"),
        },
        "flow1": _conv(sd, f"{dec}.update_block.flow_head.conv1"),
        "flow2": _conv(sd, f"{dec}.update_block.flow_head.conv2"),
        "mask1": _conv(sd, f"{dec}.update_block.mask.0"),
        "mask2": _conv(sd, f"{dec}.update_block.mask.2"),
    }
    return {
        "params": {
            "feat_encoder": _ffpp_twins_encoder(
                sd, "memory_encoder.feat_encoder.svt"
            ),
            "context_encoder": _ffpp_twins_encoder(
                sd, "context_encoder.svt"
            ),
            "cost_perceiver": perceiver,
            "proj": _conv(sd, f"{dec}.proj"),
            "ft_enc0": _conv(sd, f"{dec}.flow_token_encoder.0"),
            "ft_enc1": _conv(sd, f"{dec}.flow_token_encoder.2"),
            "decoder_cross": _ffpp_attn_layer(
                sd, f"{dec}.decoder_layer.cross_attend"
            ),
            "att": {"to_qk": _conv(sd, f"{dec}.att.to_qk")},
            "update_block": update,
        }
    }


# ---------------------------------------------------------------------------
# generic multi-frame wrapper conversion (any base family)
# ---------------------------------------------------------------------------
_BASE_CONVERTERS = {
    "TernausNet16": lambda sd: convert_ternausnet(sd, "TernausNet16"),
    "TernausNet11": lambda sd: convert_ternausnet(sd, "TernausNet11"),
    "FCN": convert_fcn_resnet101,
    "DeepLab_v3": convert_deeplabv3_resnet101,
    "HRNet": convert_hrnet,
    "SegFormer": convert_segformer,
}


def convert_multiframe(sd: Dict[str, np.ndarray], base_kind: str):
    """Reference {family}Multi{Basic,Large} checkpoint -> flax variables:
    base_model.* through the family converter + the fusion head
    (reference wrappers: models/multiframe_model.py:207-540)."""
    base_sd = {
        k[len("base_model."):]: v
        for k, v in sd.items()
        if k.startswith("base_model.")
    }
    base_vars = _BASE_CONVERTERS[base_kind](base_sd)
    head_params, head_stats = _multiframe_head(
        sd, "multiframe_net.multiframe_net"
    )
    return {
        "params": {
            "base": base_vars["params"],
            "multiframe_net": {"head": head_params},
        },
        "batch_stats": {
            "base": base_vars.get("batch_stats", {}),
            "multiframe_net": {"head": head_stats},
        },
    }
