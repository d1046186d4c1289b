"""argparse parsers with the reference's exact flag names.

Mirrors configs/config_multiframe.py:5-129 and
configs/config_toolposeseg.py:5-118 so README commands port verbatim. One
deliberate fix: the reference declares boolean flags as ``type=bool`` (any
non-empty string parses True — config_multiframe.py:32,52,64,...); here they
accept true/false/1/0/yes/no explicitly.

Config files: pass ``-c FILE`` / ``--config FILE`` with ``key = value``
lines (the subset of configargparse behavior the reference README uses).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from mfcnet_tpu.configs.base import (
    DataConfig,
    IOConfig,
    ModelConfig,
    MultiFrameConfig,
    OptimConfig,
    SingleFrameConfig,
)

_SINGLEFRAME_MODELS = [
    "TernausNet11",
    "TernausNet16",
    "TAPNet11",
    "TAPNet16",
    "DeepLab_v3",
    "FCN",
    "HRNet",
    "SegFormer",
    "UNet",
    "ResUNet",
]
_MULTIFRAME_MODELS = [
    f"{fam}Multi-{var}"
    for fam in (
        "TernausNet",
        "DeepLab",
        "FCN",
        "SegFormer",
        "HRNet",
        "UNet",
        "ResUNet",
    )
    for var in ("Basic", "Large")
]


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "1", "yes", "y"):
        return True
    if v.lower() in ("false", "0", "no", "n", ""):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


class _ConfigFileParser(argparse.ArgumentParser):
    """ArgumentParser with a minimal configargparse-style ``-c file``."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.add_argument("-c", "--config", type=str, default=None,
                          help="Config file with 'key = value' lines")

    def parse_args(self, args=None, namespace=None):  # noqa: D102
        ns, _ = super().parse_known_args(args=args, namespace=namespace)
        if ns.config:
            file_args = []
            for line in Path(ns.config).read_text().splitlines():
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                key, _, val = line.partition("=")
                key, val = key.strip(), val.strip()
                file_args.append(f"--{key}")
                file_args.extend(val.split() if " " in val else [val])
            # CLI args take precedence over file args (configargparse order)
            args = file_args + (args if args is not None else __import__("sys").argv[1:])
        return super().parse_args(args=args, namespace=namespace)


def _add_common(parser, multiframe: bool, train: bool):
    g = parser.add_argument_group("dataset")
    g.add_argument("--data_dir", type=str, default="./data")
    g.add_argument("--dataset", type=str, default="MICCAI2017",
                   choices=["MICCAI2015", "MICCAI2017", "JIGSAWS"])
    g.add_argument("--fold_index", type=int, default=-1,
                   choices=[-1, 0, 1, 2, 3])
    g.add_argument("--prediction_task", type=str,
                   default="toolpose_segmentation",
                   choices=["tooltip_segmentation", "toolpose_segmentation",
                            "endovis15_segmentation", "binary"])
    g.add_argument("--mode", type=str,
                   default="training" if train else "testing",
                   choices=["training", "testing"])
    g.add_argument("--num_frames_per_video", type=int,
                   default=225 if train else 75)
    if multiframe:
        g.add_argument("--num_input_frames", type=int, default=3)
        g.add_argument("--packed_dir", type=str, default=None,
                       help="read zero-decode memmap shards written by "
                            "tools/pack_dataset.py instead of decoding "
                            "the --data_dir image tree (same samples)")

    g = parser.add_argument_group("io")
    g.add_argument("--expt_savedir", type=str, default="./")
    g.add_argument("--expt_name", type=str, default="expt")
    g.add_argument("--print_freq", type=int, default=10)
    if train:
        g.add_argument("--save_freq", type=int, default=10)
        g.add_argument("--multihost", type=_str2bool, default=False,
                       help="bootstrap jax.distributed with cluster "
                            "autodetection (TPU pod); --batch_size is "
                            "then PER PROCESS and training data is "
                            "sharded across hosts")
        g.add_argument("--ckpt_backend", type=str, default="msgpack",
                       choices=["msgpack", "orbax"],
                       help="checkpoint format: flax msgpack files or "
                            "orbax (async, tensorstore-backed) dirs")
        g.add_argument("--debug", type=_str2bool, default=False)
    else:
        g.add_argument("--save_output_freq", type=int, default=10)

    g = parser.add_argument_group("optimizer")
    g.add_argument("--batch_size", type=int, default=8 if multiframe else 4)
    g.add_argument("--num_workers", type=int, default=4)
    g.add_argument("--num_classes", type=int, default=5)
    g.add_argument("--metric_fns", type=str, nargs="+",
                   default=["iou", "dice"], choices=["iou", "dice"])
    if train:
        g.add_argument("--loss_fns", type=str, nargs="+", default=["nll"],
                       choices=["mse", "nll", "soft_jaccard"])
        g.add_argument("--loss_wts", type=float, nargs="+", default=[1.0])
        g.add_argument("--lr", type=float,
                       default=1e-4 if multiframe else 3e-5)
        g.add_argument("--scheduler", type=str, default="StepDecay",
                       choices=["StepDecay", "Constant"])
        g.add_argument("--num_epochs", type=int, default=10)
        g.add_argument("--class_weights", type=float, nargs="+",
                       default=[1, 100, 100, 100, 100])
        g.add_argument("--grad_accum", type=int, default=1,
                       help="accumulate gradients over N micro-batches "
                            "per optimizer update (optax.MultiSteps) — "
                            "train at N x the per-device-memory batch "
                            "size; the LR schedule counts real updates")
        g.add_argument("--ema_decay", type=float, default=0.0,
                       help="keep an exponential moving average of the "
                            "params (e.g. 0.999); stored in checkpoints "
                            "as ema_params, servable via export_model "
                            "--use_ema. 0 disables")
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--resume", type=_str2bool, default=False)
    if train:
        g.add_argument("--starting_epoch", type=int, default=0)

    g = parser.add_argument_group("model")
    if multiframe:
        g.add_argument("--model_type", type=str,
                       default="TernausNetMulti-Basic",
                       choices=_MULTIFRAME_MODELS)
        g.add_argument("--train_base_model", type=_str2bool, default=False)
        g.add_argument("--load_wts_base_model", type=str, default=None)
    else:
        g.add_argument("--model_type", type=str, default="TernausNet16",
                       choices=_SINGLEFRAME_MODELS)
    g.add_argument("--pretrained", type=_str2bool, default=False)
    g.add_argument("--load_wts_model", type=str, default=None)
    if not train:
        g.add_argument("--use_ema", type=_str2bool, default=False,
                       help="evaluate the checkpoint's EMA weights "
                            "(written by training with --ema_decay)")
    g.add_argument("--input_height", type=int, default=480)
    g.add_argument("--input_width", type=int, default=640)
    g.add_argument("--add_optflow_inputs", type=_str2bool, default=False)
    g.add_argument("--optflow_model", type=str, default="RAFT",
                   choices=["RAFT", "FlowFormerPlusPlus", "UnFlow"])
    g.add_argument("--load_wts_flow_model", type=str, default=None,
                   help="Converted flow-model weights (msgpack) for the "
                        "frozen provider behind --add_optflow_inputs. "
                        "The reference loads pretrained flow weights "
                        "implicitly (torchvision raft_large pretrained / "
                        "ffpp_things.pth); without this flag the "
                        "provider runs RANDOM-INIT and a training run "
                        "would learn against noise flow.")
    g.add_argument("--add_depth_inputs", type=_str2bool, default=False)
    # TPU-specific extras
    g.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    g.add_argument("--spatial_shards", type=int, default=1,
                   help="Shard the image HEIGHT dimension over this many "
                        "devices (a data x spatial GSPMD mesh). The "
                        "TPU-native model-parallel axis for dense "
                        "prediction: GSPMD splits every conv spatially "
                        "and inserts halo exchanges over ICI. Scales "
                        "single-stream latency and fits >HBM images; "
                        "numerically transparent. Device count must be "
                        "divisible by this.")
    g.add_argument("--parity_grid", type=_str2bool, default=True)
    g.add_argument("--model_scale", type=float, default=1.0,
                   help="Uniform channel-width scale (<1 for smoke tests)")
    if train:
        g.add_argument("--remat", type=_str2bool, default=False,
                       help="Rematerialize training activations "
                            "(TernausNet backbones): recompute "
                            "intra-segment activations in the backward "
                            "pass instead of holding them in HBM — "
                            "needed for full-res batch-4 training on a "
                            "16 GB chip. No effect on values or the "
                            "parameter tree.")
    return parser


def multiframe_train_parser() -> argparse.ArgumentParser:
    return _add_common(_ConfigFileParser(), multiframe=True, train=True)


def multiframe_test_parser() -> argparse.ArgumentParser:
    return _add_common(_ConfigFileParser(), multiframe=True, train=False)


def toolposeseg_train_parser() -> argparse.ArgumentParser:
    return _add_common(_ConfigFileParser(), multiframe=False, train=True)


def toolposeseg_test_parser() -> argparse.ArgumentParser:
    return _add_common(_ConfigFileParser(), multiframe=False, train=False)


def ns_to_config(ns: argparse.Namespace, multiframe: bool):
    """argparse Namespace -> typed config dataclasses."""
    d = vars(ns)

    def pick(cls, **over):
        fields = {f.name for f in cls.__dataclass_fields__.values()}
        vals = {k: v for k, v in d.items() if k in fields}
        vals.update(over)
        if "data_dir" in vals:
            vals["data_dir"] = Path(vals["data_dir"])
        if "expt_savedir" in vals:
            vals["expt_savedir"] = Path(vals["expt_savedir"])
        for tup_key in ("loss_fns", "loss_wts", "metric_fns", "class_weights"):
            if tup_key in vals and vals[tup_key] is not None:
                vals[tup_key] = tuple(vals[tup_key])
        return cls(**vals)

    cfg_cls = MultiFrameConfig if multiframe else SingleFrameConfig
    return cfg_cls(
        data=pick(DataConfig),
        io=pick(IOConfig),
        optim=pick(OptimConfig),
        model=pick(ModelConfig),
    )
