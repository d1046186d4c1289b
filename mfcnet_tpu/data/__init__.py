"""Data layer: host-side file IO + device-side fused transform pipeline."""

from mfcnet_tpu.data.files import (
    get_dataset_filenames,
    get_JIGSAWS_dataset_filenames,
    get_MICCAI2015_dataset_filenames,
    get_MICCAI2017_dataset_filenames,
)
from mfcnet_tpu.data.masks import (
    load_depthmap,
    load_image,
    load_mask,
    load_optflow_map,
    write_flo,
)
from mfcnet_tpu.data.dataset import MultiFrameDataset, SingleFrameDataset
from mfcnet_tpu.data.transforms import (
    TransformConfig,
    augment_train_batch,
    preprocess_eval_batch,
)
from mfcnet_tpu.data.loader import DataLoader, Prefetcher, get_data_loader

__all__ = [
    "get_dataset_filenames",
    "get_JIGSAWS_dataset_filenames",
    "get_MICCAI2015_dataset_filenames",
    "get_MICCAI2017_dataset_filenames",
    "load_image",
    "load_mask",
    "load_depthmap",
    "load_optflow_map",
    "write_flo",
    "MultiFrameDataset",
    "SingleFrameDataset",
    "TransformConfig",
    "augment_train_batch",
    "preprocess_eval_batch",
    "DataLoader",
    "Prefetcher",
    "get_data_loader",
]
