"""Epoch-level train/validate loops (reference: src/engine.py).

Differences from the reference, by design:
  * Per-step host syncs are avoided: losses accumulate on-device and are
    pulled once per print interval / epoch end (the reference calls
    ``loss.item()`` every step, src/engine.py:67,74).
  * Augmentation runs on-device inside ``aug_fn`` (jitted) instead of in
    dataloader workers; the flow model (if any) runs inside the jitted step.
  * Batches are prefetched one step ahead on a background thread.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np

from mfcnet_tpu.data.loader import Prefetcher
from mfcnet_tpu.utils.logging import AverageMeter, ProgressMeter


class TrainInterrupted(KeyboardInterrupt):
    """KeyboardInterrupt carrying the MID-EPOCH training progress.

    The reference's interrupt snapshot captures mid-epoch progress for
    free because torch mutates the model in place
    (train_multiframe_detection.py:179-183); with an immutable TrainState
    the caller's binding would still be the pre-epoch state, so the loop
    re-raises with the latest state + completed-batch count attached —
    the CLI snapshots these for exact preemption-safe resume."""

    def __init__(self, state, batches_done: int):
        super().__init__()
        self.state = state
        self.batches_done = batches_done


def train_one_epoch(
    loader,
    epoch: int,
    state,
    train_step: Callable,
    aug_fn: Optional[Callable],
    rng_key,
    logger,
    writer=None,
    print_freq: int = 10,
    loss_fns=(),
    skip_batches: int = 0,
):
    """Returns (state, avg_total_loss).

    ``skip_batches``: mid-epoch resume offset — per-batch augmentation
    keys are ``fold_in(rng_key, skip_batches + i)`` (a pure function of
    the batch's position in the epoch, NOT of how many batches this
    process ran), so a resumed epoch replays the interrupted run's exact
    randomness. Pair with ``loader.set_epoch(epoch, skip_batches)``.
    """
    batch_time = AverageMeter("Time", ":2.2f")
    data_time = AverageMeter("Data", ":2.2f")
    meters = [batch_time, data_time]
    progress = ProgressMeter(len(loader), meters, prefix=f"Epoch: [{epoch}]")

    prep_count = skip_batches

    def prepare(batch):
        nonlocal prep_count
        if aug_fn is None:
            return batch
        sub = jax.random.fold_in(rng_key, prep_count)
        prep_count += 1
        return aug_fn(batch, sub)

    it = Prefetcher(loader, device_fn=prepare)
    loss_sum = 0.0
    loss_parts_sum = None
    n_steps = 0
    data_t0 = time.time()
    last_logs = None
    try:
        for step_idx, batch in enumerate(it):
            data_time.update(time.time() - data_t0)
            t0 = time.time()
            state, logs = train_step(state, batch)
            last_logs = logs
            # device-side accumulation (lazy); sync only at print points
            loss_sum = loss_sum + logs["loss_total"]
            if loss_parts_sum is None:
                loss_parts_sum = {k: v for k, v in logs.items()}
            else:
                loss_parts_sum = {
                    k: loss_parts_sum[k] + v for k, v in logs.items()
                }
            n_steps += 1
            batch_time.update(time.time() - t0)
            if step_idx % print_freq == 0:
                cur = float(logs["loss_total"])
                if np.isnan(cur) or np.isinf(cur):
                    logger.error(
                        f"Loss is {cur} at step {step_idx}; aborting."
                    )
                    raise FloatingPointError(f"non-finite loss {cur}")
                progress.display(step_idx, logger=logger)
                logger.info(f"  loss_total {cur:.4f}")
            data_t0 = time.time()
    except KeyboardInterrupt:
        # `state` is the last COMPLETED step's state (an interrupt inside
        # train_step discards that step's partial update)
        raise TrainInterrupted(state, skip_batches + n_steps)

    avg = float(loss_sum) / max(1, n_steps)
    if writer is not None:
        writer.add_scalar("Training/Loss", avg, epoch)
        for name in loss_fns:
            writer.add_scalar(
                f"Training/Loss_{name}",
                float(loss_parts_sum[f"loss_{name}"]) / max(1, n_steps),
                epoch,
            )
    logger.info(f"Training loss: {avg}")
    return state, avg


def validate(
    loader,
    state,
    eval_step: Callable,
    prep_fn: Optional[Callable],
    logger,
    writer=None,
    epoch: Optional[int] = None,
    print_freq: int = 10,
    loss_fns=(),
    metric_fns=(),
    num_classes: int = 2,
):
    """Returns avg_total_loss; logs per-class metric means
    (src/engine.py:89-171)."""
    it = Prefetcher(loader, device_fn=prep_fn)
    loss_sum = 0.0
    metric_sums = {}
    n = 0
    for step_idx, batch in enumerate(it):
        _, parts = eval_step(state, batch)
        loss_sum = loss_sum + parts["loss_total"]
        for mf in metric_fns:
            key = f"{mf}_per_class"
            acc = parts[key].mean(axis=0)  # (C-1,)
            metric_sums[key] = (
                acc if key not in metric_sums else metric_sums[key] + acc
            )
        n += 1
        if step_idx % print_freq == 0:
            logger.info(
                f"  val [{step_idx}/{len(loader)}] loss "
                f"{float(parts['loss_total']):.4f}"
            )
    avg = float(loss_sum) / max(1, n)
    logger.info(f"Validation loss: {avg}")
    if writer is not None and epoch is not None:
        writer.add_scalar("Validation/Loss", avg, epoch)
    for mf in metric_fns:
        vals = np.asarray(metric_sums[f"{mf}_per_class"]) / max(1, n)
        for cls in range(1, num_classes):
            v = float(vals[cls - 1])
            logger.info(f"Validation metric {mf} {cls}: {v}")
            if writer is not None and epoch is not None:
                writer.add_scalar(f"Validation/{mf} {cls}", v, epoch)
    return avg
