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


def _build_base(kind: str, num_classes: int, pretrained: bool = False):
    """Build a single-frame base model by family name."""
    if kind == "TernausNet11":
        return TernausNet11(num_classes=num_classes, num_filters=64), "exp"
    if kind == "TernausNet16":
        return TernausNet16(num_classes=num_classes, num_filters=64), "exp"
    if kind == "UNet":
        from mfcnet_tpu.models.unet import UNet

        return UNet(output_channels=num_classes), "identity"
    if kind == "ResUNet":
        from mfcnet_tpu.models.resunet import ResUNetVB

        return ResUNetVB(out_channels=num_classes), "identity"
    if kind == "TAPNet11":
        from mfcnet_tpu.models.tapnet import TAPNet11

        return TAPNet11(num_classes=num_classes), "exp"
    if kind == "TAPNet16":
        from mfcnet_tpu.models.tapnet import TAPNet16

        return TAPNet16(num_classes=num_classes), "exp"
    if kind == "HRNet":
        from mfcnet_tpu.models.hrnet import HRNetW48

        return HRNetW48(num_classes=num_classes), "identity"
    if kind == "DeepLab_v3" or kind == "DeepLab":
        from mfcnet_tpu.models.deeplab import DeepLabV3ResNet101

        return DeepLabV3ResNet101(num_classes=num_classes), "identity"
    if kind == "FCN":
        from mfcnet_tpu.models.fcn import FCNResNet101

        return FCNResNet101(num_classes=num_classes), "identity"
    if kind == "SegFormer":
        from mfcnet_tpu.models.segformer import SegFormerMiTB3

        return SegFormerMiTB3(num_classes=num_classes), "identity"
    raise ValueError(f"Model type {kind} not recognized")


def get_tooltip_segmentation_model(
    model_type: str, num_classes: int, pretrained: bool = False
) -> nn.Module:
    """Single-frame registry (reference: models/__init__.py:23-52)."""
    model, _ = _build_base(model_type, num_classes, pretrained)
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
    base, base_output = _build_base(base_kind, num_classes, pretrained)
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
