"""PyTorch checkpoint interchange."""

from mfcnet_tpu.compat.torch_convert import (
    convert_multiframe_ternausnet,
    convert_ternausnet,
    load_torch_state_dict,
)

__all__ = [
    "convert_ternausnet",
    "convert_multiframe_ternausnet",
    "load_torch_state_dict",
]
