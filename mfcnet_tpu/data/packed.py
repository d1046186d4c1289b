"""Packed zero-decode dataset shards (memory-mapped raw uint8).

Why: the live datasets decode JPEG/PNG and compose the class mask from two
pose-map PNGs on every access (data/masks.py; reference
utils/dataloader_utils.py:24-85 does the same work inside 12 torch worker
processes). At TPU training rates the host decode becomes the input
bottleneck — the idiomatic fix is to pack the dataset ONCE into flat
raw-uint8 files so a training-time sample read is a pure ``np.memmap``
slice: zero decode, zero allocation until collation, and the OS page
cache shares one copy across every loader thread and co-located process
(multi-host pods feeding from a shared filesystem).

Layout of a pack directory::

    index.json   {"format": "mfcnet_tpu.packed/1", "n", "height",
                  "width", "prediction_task", "has_depth",
                  "video_ids": [per-frame video id],
                  "names": [relative source names]}
    frames.u8    (N, H, W, 3) raw uint8, C-order
    masks.u8     (N, H, W)    raw uint8 class ids
    depth.u8     (N, H, W)    raw uint8 (only when has_depth)

``video_ids`` preserves the video-boundary structure so the multi-frame
window clamp (reference src/dataset_jigsaws.py:20-40) is byte-identical
to the file-tree datasets — pinned by test against ``MultiFrameDataset``
on the same files.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

FORMAT = "mfcnet_tpu.packed/1"


def pack_files(
    file_names: Sequence[Path],
    prediction_task: str,
    out_dir,
    add_depth_inputs: bool = False,
    extra: Optional[dict] = None,
) -> dict:
    """Pack image files (+ masks composed from pose maps, + depth) into
    ``out_dir``. Uses the same loaders as the live path (data/masks.py),
    so packed bytes match live decoding by construction. Returns the
    written index."""
    from mfcnet_tpu.data.masks import load_depthmap, load_image, load_mask

    file_names = [Path(f) for f in file_names]
    if not file_names:
        raise ValueError("pack_files: empty file list")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    first = load_image(file_names[0])
    H, W = first.shape[:2]
    N = len(file_names)

    fmap = np.memmap(out_dir / "frames.u8", np.uint8, "w+", shape=(N, H, W, 3))
    mmap = np.memmap(out_dir / "masks.u8", np.uint8, "w+", shape=(N, H, W))
    dmap = (
        np.memmap(out_dir / "depth.u8", np.uint8, "w+", shape=(N, H, W))
        if add_depth_inputs
        else None
    )
    video_ids: List[int] = []
    parents: dict = {}
    for i, f in enumerate(file_names):
        img = first if i == 0 else load_image(f)
        if img.shape[:2] != (H, W):
            raise ValueError(
                f"{f}: shape {img.shape[:2]} != pack shape {(H, W)}"
            )
        fmap[i] = img
        mmap[i] = load_mask(f, prediction_task)
        if dmap is not None:
            dmap[i] = load_depthmap(f)
        video_ids.append(parents.setdefault(f.parent, len(parents)))
    fmap.flush()
    mmap.flush()
    if dmap is not None:
        dmap.flush()
    index = {
        "format": FORMAT,
        "n": N,
        "height": H,
        "width": W,
        "prediction_task": prediction_task,
        "has_depth": add_depth_inputs,
        "video_ids": video_ids,
        "names": [str(f.name) for f in file_names],
    }
    index.update(extra or {})
    (out_dir / "index.json").write_text(json.dumps(index))
    return index


class PackedMultiFrameDataset:
    """Drop-in replacement for ``MultiFrameDataset`` over a pack directory.

    ``__getitem__`` returns the identical sample dict (T newest-first
    frames with video-boundary clamping, current-frame mask, optional
    depth) — but each access is a memmap slice instead of T image decodes
    + a two-PNG mask composition."""

    def __init__(
        self,
        pack_dir,
        num_input_frames: int,
        add_depth_inputs: bool = False,
        expect: Optional[dict] = None,
    ):
        """``expect``: {index key: required value} — the loader passes the
        run's prediction_task/dataset/fold so a mismatched pack fails
        loudly instead of silently training on wrong labels."""
        pack_dir = Path(pack_dir)
        index = json.loads((pack_dir / "index.json").read_text())
        if index.get("format") != FORMAT:
            raise ValueError(
                f"{pack_dir}: not a packed dataset "
                f"(format {index.get('format')!r})"
            )
        if add_depth_inputs and not index["has_depth"]:
            raise ValueError(
                f"{pack_dir}: packed without depth "
                "(re-pack with --add_depth_inputs)"
            )
        for key, want in (expect or {}).items():
            if key in index and index[key] != want:
                raise ValueError(
                    f"{pack_dir}: packed with {key}={index[key]!r} but "
                    f"this run needs {want!r} — re-pack or fix the flags"
                )
        self.index = index
        N, H, W = index["n"], index["height"], index["width"]
        self.N, self.T = N, num_input_frames
        self.add_depth_inputs = add_depth_inputs
        self.video_ids = np.asarray(index["video_ids"], np.int64)
        self.frames = np.memmap(
            pack_dir / "frames.u8", np.uint8, "r", shape=(N, H, W, 3)
        )
        self.masks = np.memmap(
            pack_dir / "masks.u8", np.uint8, "r", shape=(N, H, W)
        )
        self.depth = (
            np.memmap(pack_dir / "depth.u8", np.uint8, "r", shape=(N, H, W))
            if add_depth_inputs
            else None
        )

    def __len__(self):
        return self.N

    def window_indices(self, idx: int) -> List[int]:
        """Same clamp as MultiFrameDataset.window_indices, keyed on the
        packed video ids (reference src/dataset_jigsaws.py:20-40) —
        including the reference's single-video wrap quirk documented
        there (a one-video pack wraps idx=0's window to the video tail
        instead of clamping, exactly like the reference)."""
        out = []
        last_valid = -1
        vid = self.video_ids[idx]
        for i in range(self.T):
            j = (idx - i) % self.N
            if self.video_ids[j] != vid:
                j = last_valid % self.N
            else:
                last_valid = j
            out.append(j)
        return out

    def __getitem__(self, idx: int):
        idxs = self.window_indices(idx)
        sample = {
            # np.asarray materializes the window (the collator stacks and
            # the device upload would copy anyway); masks stay lazy views
            "frames": np.asarray(self.frames[idxs]),
            "mask": np.asarray(self.masks[idx]),
        }
        if self.depth is not None:
            sample["depth"] = np.asarray(self.depth[idxs])
        return sample


def pack_dataset_splits(
    dataset_name: str,
    data_dir,
    mode: str,
    prediction_task: str,
    out_dir,
    fold_index: int = -1,
    add_depth_inputs: bool = False,
) -> dict:
    """Pack a dataset the way ``get_data_loader`` would read it: training
    mode writes ``train/`` + ``val/`` packs, testing mode writes
    ``test/``. Returns {split: index}."""
    from mfcnet_tpu.data.files import get_dataset_filenames

    train_files, val_files = get_dataset_filenames(
        dataset_name, data_dir, mode, fold_index
    )
    out_dir = Path(out_dir)
    # provenance, checked at load time against the training run's flags
    extra = {
        "dataset": dataset_name,
        "mode": mode,
        "fold_index": fold_index,
    }
    out = {}
    if mode == "training":
        out["train"] = pack_files(
            train_files, prediction_task, out_dir / "train",
            add_depth_inputs, extra=extra,
        )
        out["val"] = pack_files(
            val_files, prediction_task, out_dir / "val", add_depth_inputs,
            extra=extra,
        )
    else:
        out["test"] = pack_files(
            train_files, prediction_task, out_dir / "test",
            add_depth_inputs, extra=extra,
        )
    return out
