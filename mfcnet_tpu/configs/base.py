"""Typed experiment configs.

The reference plumbs a configargparse ``args`` namespace through every layer
(configs/config_multiframe.py, configs/config_toolposeseg.py). Here the CLI
parses into frozen dataclasses; library code takes explicit arguments.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data_dir: Path = Path(".")
    dataset: str = "MICCAI2017"  # MICCAI2015 | MICCAI2017 | JIGSAWS
    fold_index: int = -1
    prediction_task: str = "toolpose_segmentation"
    mode: str = "training"
    num_frames_per_video: int = 225
    num_input_frames: int = 3
    input_height: int = 480
    input_width: int = 640
    add_optflow_inputs: bool = False
    add_depth_inputs: bool = False
    batch_size: int = 8
    num_workers: int = 4


@dataclasses.dataclass(frozen=True)
class IOConfig:
    expt_savedir: Path = Path("./")
    expt_name: str = "expt"
    print_freq: int = 10
    save_freq: int = 10
    save_output_freq: int = 10
    debug: bool = False


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    scheduler: str = "StepDecay"  # StepDecay | Constant
    num_epochs: int = 10
    seed: int = 42
    resume: bool = False
    starting_epoch: int = 0
    loss_fns: Tuple[str, ...] = ("nll",)
    loss_wts: Tuple[float, ...] = (1.0,)
    metric_fns: Tuple[str, ...] = ("iou", "dice")
    class_weights: Tuple[float, ...] = (1, 100, 100, 100, 100)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    model_type: str = "TernausNetMulti-Basic"
    num_classes: int = 5
    pretrained: bool = False
    train_base_model: bool = False
    load_wts_base_model: Optional[str] = None
    load_wts_model: Optional[str] = None
    optflow_model: str = "RAFT"  # RAFT | FlowFormerPlusPlus | UnFlow
    # jax-specific extras
    compute_dtype: str = "float32"  # float32 | bfloat16
    parity_grid: bool = True


@dataclasses.dataclass(frozen=True)
class MultiFrameConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    io: IOConfig = dataclasses.field(default_factory=IOConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)


@dataclasses.dataclass(frozen=True)
class SingleFrameConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    io: IOConfig = dataclasses.field(default_factory=IOConfig)
    optim: OptimConfig = dataclasses.field(
        default_factory=lambda: OptimConfig(lr=3e-5)
    )
    model: ModelConfig = dataclasses.field(
        default_factory=lambda: ModelConfig(model_type="TernausNet16")
    )
