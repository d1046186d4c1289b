"""Device-side image/tensor ops with exact PyTorch reference semantics.

Every op here is jit-safe (static shapes, no Python control flow on traced
values) and ships with tests that pin its numerics against ``torch`` CPU
implementations of the same op.
"""

from mfcnet_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample_bilinear_2x,
)
from mfcnet_tpu.ops.warp import grid_sample_bilinear, flow_warp
from mfcnet_tpu.ops.color import (
    adjust_brightness,
    adjust_contrast,
    adjust_saturation,
)
from mfcnet_tpu.ops.rotate import rotate_nearest
from mfcnet_tpu.ops.correlation import correlation_cost_volume
from mfcnet_tpu.ops.peaks import gaussian_blur, local_maxima

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "upsample_bilinear_2x",
    "grid_sample_bilinear",
    "flow_warp",
    "adjust_brightness",
    "adjust_contrast",
    "adjust_saturation",
    "rotate_nearest",
    "correlation_cost_volume",
    "gaussian_blur",
    "local_maxima",
]
