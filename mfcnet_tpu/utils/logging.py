"""Experiment logging & observability (reference: utils/log_utils.py).

Keeps the reference's experiment-dir contract
``{expt_savedir}/{expt_name}/{logs,outputs,ckpts}`` (utils/log_utils.py:21-33,
README.md:42-45) and its file+stream logging with a DEBUG gate. The
tensorboardX dependency is replaced by a JSONL scalar writer (one line per
scalar: {"tag", "value", "step"}) — trivially greppable/plottable and free of
host-side deps; a TensorBoard writer is used additionally when the package
is importable.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

class ScalarWriter:
    """JSONL scalar writer with optional TensorBoard mirroring."""

    def __init__(self, logdir: Path, suffix: str = ""):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.logdir / f"scalars{suffix}.jsonl", "a")
        self._tb = None
        try:  # pragma: no cover - optional dep
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.logdir))
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}
            )
            + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def init_logging(expt_savedir, expt_name, debug: bool = False,
                 to_stdout: bool = True, rank=None):
    """Create experiment dirs + logger + scalar writer.

    Returns (writer, logger, expt_dir) — mirroring ``init_logging``
    (utils/log_utils.py:16-60).

    ``rank``: multi-host runs share one experiment dir (pod shared
    filesystem); pass the process index so each rank writes its own
    ``run.rank{r}.log`` / ``scalars.rank{r}.jsonl`` instead of
    interleaving into one file. Rank 0 (or single-process ``None``)
    keeps the reference filenames.
    """
    expt_dir = Path(expt_savedir) / expt_name
    logs = expt_dir / "logs"
    for sub in ("logs", "outputs", "ckpts"):
        (expt_dir / sub).mkdir(parents=True, exist_ok=True)

    suffix = f".rank{rank}" if rank else ""
    logger = logging.getLogger(expt_name)
    logger.setLevel(logging.DEBUG if debug else logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(logs / f"run{suffix}.log")
    fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(fh)
    if to_stdout:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(sh)

    writer = ScalarWriter(logs, suffix=suffix)
    return writer, logger, expt_dir


class AverageMeter:
    """Running average meter (reference: utils/log_utils.py:63-81)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(1, self.count)

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class ProgressMeter:
    """Batch progress display (reference: utils/log_utils.py:84-103)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.batch_fmtstr = self._get_batch_fmtstr(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int, logger=None):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        line = "\t".join(entries)
        (logger.info if logger else print)(line)

    @staticmethod
    def _get_batch_fmtstr(num_batches: int) -> str:
        num_digits = len(str(num_batches // 1))
        fmt = "{:" + str(num_digits) + "d}"
        return "[" + fmt + "/" + fmt.format(num_batches) + "]"


def add_loss_meters(meters, loss_fns):
    """reference: utils/train_utils.py:3-7."""
    for fn in loss_fns:
        meters.append(AverageMeter(f"Loss {fn}", ":.3f"))
    return meters


def add_metrics_meters(meters, metric_fns, num_classes: int):
    """reference: utils/train_utils.py:9-14."""
    for fn in metric_fns:
        for cls in range(1, num_classes):
            meters.append(AverageMeter(f"{fn} {cls}", ":.3f"))
    return meters
