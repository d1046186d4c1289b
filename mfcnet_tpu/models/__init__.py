"""Model zoo registry — string name → Flax module.

Mirrors the reference's two registries
(``get_tooltip_segmentation_model`` models/__init__.py:23-52 and
``get_multiframe_segmentation_model`` models/__init__.py:54-87) with the same
model-type strings, so the CLI surface stays drop-in compatible.
"""

from __future__ import annotations

from flax import linen as nn

from mfcnet_tpu.models.mfcnet import (
    MultiFrameHead,
    MultiFrameNet,
    MultiFrameSegmenter,
)
from mfcnet_tpu.models.ternausnet import TernausNet11, TernausNet16


class IdentityModel(nn.Module):
    """reference: models/__init__.py:17-21."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


def _scaled_vgg(stages, scale: float):
    return tuple(
        tuple(max(4, int(c * scale)) for c in stage) for stage in stages
    )


def _build_base(
    kind: str, num_classes: int, pretrained: bool = False,
    scale: float = 1.0, remat: bool = False,
):
    """Build a single-frame base model by family name.

    ``scale`` < 1 shrinks channel widths uniformly (smoke tests / fast CI);
    1.0 is the reference-sized architecture.

    ``pretrained=True`` in the reference downloads torchvision/timm/smp
    weights; this environment has no network egress, so pretrained
    initialization is done by converting a local ``.pth`` with
    :mod:`mfcnet_tpu.compat.torch_convert` (e.g. ``convert_vgg_features``)
    and loading the result — the flag alone cannot fetch weights.
    """
    import logging

    if pretrained:
        logging.getLogger(__name__).warning(
            "pretrained=True: supply converted weights via "
            "mfcnet_tpu.compat (no network egress; the flag does not "
            "download torchvision/timm checkpoints)"
        )
    from mfcnet_tpu.models.common import VGG11_STAGES, VGG16_STAGES

    if kind == "TernausNet11":
        return TernausNet11(
            num_classes=num_classes,
            num_filters=max(4, int(64 * scale)),
            stage_convs=_scaled_vgg(VGG11_STAGES, scale),
            remat=remat,
        ), "exp"
    if kind == "TernausNet16":
        return TernausNet16(
            num_classes=num_classes,
            num_filters=max(4, int(64 * scale)),
            stage_convs=_scaled_vgg(VGG16_STAGES, scale),
            remat=remat,
        ), "exp"
    if kind == "UNet":
        from mfcnet_tpu.models.unet import UNet

        dims = tuple(max(4, int(d * scale))
                     for d in (64, 128, 256, 512, 1024, 2048))
        return UNet(output_channels=num_classes, dims=dims), "identity"
    if kind == "ResUNet":
        from mfcnet_tpu.models.resunet import ResUNetVB

        return ResUNetVB(
            out_channels=num_classes,
            dim=max(8, int(16 * scale)),
            groups=8 if scale >= 0.5 else 4,
        ), "identity"
    if kind == "TAPNet11":
        from mfcnet_tpu.models.tapnet import TAPNet11

        return TAPNet11(
            num_classes=num_classes,
            stage_convs=_scaled_vgg(VGG11_STAGES, scale),
            remat=remat,
        ), "exp"
    if kind == "TAPNet16":
        from mfcnet_tpu.models.tapnet import TAPNet16

        return TAPNet16(
            num_classes=num_classes,
            stage_convs=_scaled_vgg(VGG16_STAGES, scale),
            remat=remat,
        ), "exp"
    if kind == "HRNet":
        from mfcnet_tpu.models.hrnet import HRNetW48

        if scale >= 1.0:
            return HRNetW48(num_classes=num_classes), "identity"
        return HRNetW48(
            num_classes=num_classes,
            channels=tuple(max(4, int(c * scale))
                           for c in (48, 96, 192, 384)),
            stage_modules=(1, 1, 1),
            num_blocks=1,
            stage1_width=max(4, int(64 * scale)),
        ), "identity"
    if kind == "DeepLab_v3" or kind == "DeepLab":
        from mfcnet_tpu.models.deeplab import DeepLabV3ResNet101

        layers = (3, 4, 23, 3) if scale >= 1.0 else (1, 1, 1, 1)
        return DeepLabV3ResNet101(
            num_classes=num_classes, layers=layers,
            width=max(4, int(64 * scale)),
        ), "identity"
    if kind == "FCN":
        from mfcnet_tpu.models.fcn import FCNResNet101

        layers = (3, 4, 23, 3) if scale >= 1.0 else (1, 1, 1, 1)
        return FCNResNet101(
            num_classes=num_classes, layers=layers,
            width=max(4, int(64 * scale)),
        ), "identity"
    if kind == "SegFormer":
        from mfcnet_tpu.models.segformer import SegFormerMiTB3

        if scale >= 1.0:
            return SegFormerMiTB3(num_classes=num_classes), "identity"
        return SegFormerMiTB3(
            num_classes=num_classes,
            decoder_dim=max(8, int(256 * scale)),
            dims=tuple(max(8, int(d * scale)) for d in (64, 128, 320, 512)),
            depths=(1, 1, 1, 1),
            heads=(1, 1, 1, 1),
        ), "identity"
    raise ValueError(f"Model type {kind} not recognized")


def get_tooltip_segmentation_model(
    model_type: str, num_classes: int, pretrained: bool = False,
    scale: float = 1.0, remat: bool = False,
) -> nn.Module:
    """Single-frame registry (reference: models/__init__.py:23-52).

    ``remat``: rematerialize training activations (TernausNet backbones;
    no-op structurally — the param tree is unchanged).
    """
    model, _ = _build_base(model_type, num_classes, pretrained, scale, remat)
    return model


_MULTI_BASES = {
    "TernausNetMulti": "TernausNet16",
    "DeepLabMulti": "DeepLab_v3",
    "FCNMulti": "FCN",
    "SegFormerMulti": "SegFormer",
    "HRNetMulti": "HRNet",
    "UNetMulti": "UNet",
    "ResUNetMulti": "ResUNet",
}


def get_multiframe_segmentation_model(
    model_type: str,
    num_classes: int,
    num_input_frames: int,
    pretrained: bool = False,
    add_optflow_inputs: bool = False,
    add_depth_inputs: bool = False,
    parity_grid: bool = True,
    scale: float = 1.0,
    remat: bool = False,
) -> MultiFrameSegmenter:
    """Multi-frame registry (reference: models/__init__.py:54-87).

    ``model_type`` strings are the reference's, e.g. 'TernausNetMulti-Basic'.
    """
    try:
        family, variant = model_type.rsplit("-", 1)
        base_kind = _MULTI_BASES[family]
        variant = variant.lower()
        assert variant in ("basic", "large")
    except (ValueError, KeyError, AssertionError):
        raise ValueError(f"Model type {model_type} not recognized") from None
    base, base_output = _build_base(
        base_kind, num_classes, pretrained, scale, remat
    )
    return MultiFrameSegmenter(
        base=base,
        num_classes=num_classes,
        num_frames=num_input_frames,
        variant=variant,
        base_output=base_output,
        parity_grid=parity_grid,
    )


__all__ = [
    "IdentityModel",
    "TernausNet11",
    "TernausNet16",
    "MultiFrameHead",
    "MultiFrameNet",
    "MultiFrameSegmenter",
    "get_tooltip_segmentation_model",
    "get_multiframe_segmentation_model",
]
