"""Typed configs + argparse parsers mirroring the reference CLI flags."""

from mfcnet_tpu.configs.base import MultiFrameConfig, SingleFrameConfig
from mfcnet_tpu.configs.parsers import (
    multiframe_test_parser,
    multiframe_train_parser,
    toolposeseg_test_parser,
    toolposeseg_train_parser,
)

__all__ = [
    "MultiFrameConfig",
    "SingleFrameConfig",
    "multiframe_train_parser",
    "multiframe_test_parser",
    "toolposeseg_train_parser",
    "toolposeseg_test_parser",
]
