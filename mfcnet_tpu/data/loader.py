"""Host loader + device prefetcher.

Replaces torch ``DataLoader(num_workers=12, pin_memory=True)`` +
``.cuda(non_blocking=True)`` (src/dataloader_multiframe.py:239-241,
src/engine.py:33-36) with a thread-pool file reader feeding a
double-buffered device prefetch queue: batch N+1 is decoded and
device_put while the jitted step runs batch N, so the TPU never waits on
host IO in steady state.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Callable, Iterator, Optional

import numpy as np


def _collate(samples):
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples])
    return out


class DataLoader:
    """Shuffling, batching host loader over an indexable dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = False,
        shard: Optional[tuple] = None,
    ):
        """``shard=(rank, count)``: multi-host data parallelism — every
        process shuffles the SAME global permutation (same seed),
        truncates it to a multiple of ``count``, and takes the strided
        slice ``idxs[rank::count]``. The truncation guarantees every
        rank holds exactly ``len(dataset) // count`` samples, so all
        processes launch the SAME number of train steps per epoch: each
        step is a global SPMD program with cross-host collectives, and a
        rank with one extra batch would deadlock the pod mid-epoch."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.shard = shard
        self._epoch = None
        self._skip_batches = 0

    def set_epoch(self, epoch: int, skip_batches: int = 0):
        """Make the next iteration's shuffle a pure function of
        (seed, epoch) and optionally skip its first ``skip_batches``
        batches (no file reads for skipped samples).

        This is the preemption-safe-resume contract: a resumed process
        can reproduce exactly the permutation the interrupted run was
        mid-way through and fast-forward to the interruption point —
        with the default stateful rng the permutation depends on how
        many epochs THIS process has already iterated. Same role as
        torch DistributedSampler.set_epoch."""
        self._epoch = int(epoch)
        self._skip_batches = max(0, int(skip_batches))

    def _num_local(self):
        n = len(self.dataset)
        if self.shard is None:
            return n
        _, count = self.shard
        return n // count

    def __len__(self):
        n = self._num_local()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            if self._epoch is not None:
                # (seed, epoch)-keyed permutation — reproducible across
                # process restarts (see set_epoch)
                np.random.default_rng([self.seed, self._epoch]).shuffle(
                    idxs
                )
            else:
                self.rng.shuffle(idxs)
        if self.shard is not None:
            rank, count = self.shard
            idxs = idxs[: (len(idxs) // count) * count][rank::count]
        if self.drop_last:
            idxs = idxs[: len(self) * self.batch_size]
        if self._skip_batches:
            # mid-epoch resume fast-forward (batches, after shard slicing
            # and drop_last trimming, so it counts the batches this rank
            # would actually have run); consumed once
            idxs = idxs[self._skip_batches * self.batch_size:]
            self._skip_batches = 0
        with ThreadPoolExecutor(self.num_workers) as pool:
            # pipeline two batches of reads ahead
            batches = [
                idxs[i : i + self.batch_size]
                for i in range(0, len(idxs), self.batch_size)
            ]
            futures = []
            ahead = 2
            bi = 0

            def submit(batch_idx):
                return [
                    pool.submit(self.dataset.__getitem__, int(j))
                    for j in batch_idx
                ]

            while bi < len(batches) or futures:
                while bi < len(batches) and len(futures) < ahead + 1:
                    futures.append(submit(batches[bi]))
                    bi += 1
                fs = futures.pop(0)
                yield _collate([f.result() for f in fs])


class Prefetcher:
    """Wraps a host batch iterator with device transform + transfer,
    running one batch ahead on a background thread."""

    def __init__(
        self,
        host_iter,
        device_fn: Optional[Callable] = None,
        put_fn: Optional[Callable] = None,
        depth: int = 2,
    ):
        self.host_iter = iter(host_iter)
        self.device_fn = device_fn
        self.put_fn = put_fn or (lambda b: b)
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            for batch in self.host_iter:
                batch = self.put_fn(batch)
                if self.device_fn is not None:
                    batch = self.device_fn(batch)
                self.q.put(batch)
        except BaseException as e:  # surface errors on the consumer side
            # BaseException, not Exception: a KeyboardInterrupt-style
            # preemption raised inside the loader/worker would otherwise
            # kill the thread silently and the consumer would see a fake
            # end-of-epoch (StopIteration) instead of the interrupt
            self.q.put(e)
        finally:
            self.q.put(StopIteration)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is StopIteration:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item


def get_data_loader(
    dataset_name: str,
    data_dir,
    mode: str,
    prediction_task: str,
    num_input_frames: int,
    batch_size: int,
    num_workers: int = 4,
    fold_index: int = -1,
    add_depth_inputs: bool = False,
    seed: int = 0,
    shard: Optional[tuple] = None,
    packed_dir=None,
):
    """Multi-frame loader factory (reference:
    src/dataloader_multiframe.py:225-317): train loader shuffled at
    batch_size, val/test at batch 1 unshuffled. ``shard=(rank, count)``
    partitions the TRAIN samples across processes (multi-host; validation
    stays unsharded — every process evaluates the full set).

    ``packed_dir``: read memory-mapped zero-decode packs written by
    ``tools/pack_dataset.py`` (train/ + val/ or test/ subdirs) instead of
    decoding the image tree — samples are identical (data/packed.py)."""
    if packed_dir is not None:
        from mfcnet_tpu.data.packed import PackedMultiFrameDataset

        packed_dir = Path(packed_dir)
        # fail loudly if the pack was built for a different task/dataset/
        # fold — a silent mismatch would train on wrong labels
        expect = {
            "prediction_task": prediction_task,
            "dataset": dataset_name,
            "fold_index": fold_index,
        }
        if mode == "training":
            train_ds = PackedMultiFrameDataset(
                packed_dir / "train", num_input_frames, add_depth_inputs,
                expect=expect,
            )
            val_ds = PackedMultiFrameDataset(
                packed_dir / "val", num_input_frames, add_depth_inputs,
                expect=expect,
            )
            return (
                DataLoader(train_ds, batch_size, shuffle=True,
                           num_workers=num_workers, seed=seed, shard=shard),
                DataLoader(val_ds, 1, shuffle=False,
                           num_workers=num_workers),
            )
        test_ds = PackedMultiFrameDataset(
            packed_dir / "test", num_input_frames, add_depth_inputs,
            expect={**expect, "mode": mode},
        )
        return None, DataLoader(test_ds, 1, shuffle=False,
                                num_workers=num_workers)

    from mfcnet_tpu.data.dataset import MultiFrameDataset
    from mfcnet_tpu.data.files import get_dataset_filenames

    train_files, val_files = get_dataset_filenames(
        dataset_name, data_dir, mode, fold_index
    )
    if mode == "training":
        train_ds = MultiFrameDataset(
            train_files, prediction_task, num_input_frames, add_depth_inputs
        )
        val_ds = MultiFrameDataset(
            val_files, prediction_task, num_input_frames, add_depth_inputs
        )
        return (
            DataLoader(train_ds, batch_size, shuffle=True,
                       num_workers=num_workers, seed=seed, shard=shard),
            DataLoader(val_ds, 1, shuffle=False, num_workers=num_workers),
        )
    test_ds = MultiFrameDataset(
        train_files, prediction_task, num_input_frames, add_depth_inputs
    )
    return None, DataLoader(test_ds, 1, shuffle=False,
                            num_workers=num_workers)
