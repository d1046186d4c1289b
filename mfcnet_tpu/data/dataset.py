"""Host-side datasets: index -> raw uint8 sample dicts.

The multi-frame windowing reproduces the reference's boundary clamping
(src/dataset_jigsaws.py:20-40, byte-identical in dataset_miccai2015/17):
sample idx yields frames [idx, idx-1, ..., idx-(T-1)] wrapping mod N, but
when a candidate crosses into a different video directory the last valid
in-video frame is reused.

Unlike the reference (per-worker torch Dataset + heavy torchvision
transforms on CPU), these return raw uint8 arrays only — all augmentation
runs batched on-device (data/transforms.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from mfcnet_tpu.data.masks import (
    load_attmap,
    load_depthmap,
    load_image,
    load_mask,
)


class MultiFrameDataset:
    """T-frame windows + current-frame mask (+ optional depth)."""

    def __init__(
        self,
        file_names: Sequence[Path],
        prediction_task: str,
        num_input_frames: int,
        add_depth_inputs: bool = False,
    ):
        self.file_names = list(file_names)
        self.prediction_task = prediction_task
        self.T = num_input_frames
        self.add_depth_inputs = add_depth_inputs
        self.N = len(self.file_names)

    def __len__(self):
        return self.N

    def window_indices(self, idx: int) -> List[int]:
        """Frame indices [newest, ..., oldest] with video-boundary clamping.

        Reference quirk preserved (src/dataset_jigsaws.py:20-40): the
        ``(idx - i) % N`` wrap clamps at a video boundary only because
        the wrapped index lands in a DIFFERENT video (parent dir). In a
        dataset holding exactly ONE video, idx=0's window therefore
        wraps to the video's LAST frames instead of clamping — identical
        to the reference's behavior, kept for bit-parity. Real training
        folds always contain multiple videos, so the quirk is confined
        to single-video datasets."""
        out = []
        last_valid = -1
        parent = self.file_names[idx].parent
        for i in range(self.T):
            j = (idx - i) % self.N
            if self.file_names[j].parent != parent:
                j = last_valid % self.N
            else:
                last_valid = j
            out.append(j)
        return out

    def __getitem__(self, idx: int):
        mask = load_mask(self.file_names[idx], self.prediction_task)
        idxs = self.window_indices(idx)
        frames = np.stack(
            [load_image(self.file_names[j]) for j in idxs]
        )  # (T, H, W, 3) uint8
        sample = {"frames": frames, "mask": mask}
        if self.add_depth_inputs:
            sample["depth"] = np.stack(
                [load_depthmap(self.file_names[j]) for j in idxs]
            )  # (T, H, W) uint8
        return sample


class SingleFrameDataset:
    """Single frame + mask (reference: src/dataloader.py:78-96).

    ``with_attmap`` adds the TAPNet motion-prior attention map: the previous
    frame's attention map, optionally forward-warped by precomputed optical
    flow + grey-dilated (``optflow_dir``; reference
    src/dataloader.py:20-76 RoboticSurgeryFramesDataset_withoptflow).
    """

    def __init__(
        self,
        file_names: Sequence[Path],
        prediction_task: str,
        with_attmap: bool = False,
        frames_per_video: int = 225,
        optflow_dir: Optional[str] = None,
        attmap_shape=(480, 640),
    ):
        self.file_names = list(file_names)
        self.prediction_task = prediction_task
        self.with_attmap = with_attmap
        self.frames_per_video = frames_per_video
        self.optflow_dir = optflow_dir
        self.attmap_shape = attmap_shape

    def __len__(self):
        return len(self.file_names)

    def __getitem__(self, idx: int):
        sample = {
            "image": load_image(self.file_names[idx]),
            "mask": load_mask(self.file_names[idx], self.prediction_task),
        }
        if self.with_attmap:
            att = load_attmap(
                self.file_names, idx, self.frames_per_video,
                shape=self.attmap_shape,
            )
            if self.optflow_dir and idx % self.frames_per_video != 0:
                from mfcnet_tpu.data.attmap import cal_attmap_np
                from mfcnet_tpu.data.masks import load_optflow_map

                flow = load_optflow_map(
                    self.file_names[idx], self.optflow_dir,
                    shape=att.shape,
                )
                att = cal_attmap_np(att, flow)
            sample["attmap"] = att
        return sample
