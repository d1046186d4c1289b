"""Synthetic on-disk dataset generator (JIGSAWS directory layout).

Creates tiny videos of moving colored "instruments" with pose-map masks in
the exact directory/file contract the loaders expect
(images/ + pose_maps/ with framel/framer left/right channel encoding —
utils/dataloader_utils.py:66-78). Used by tests and the demo CLI; also
useful for training smoke runs without the real datasets.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np


def _draw_instrument(img, posemap, cx, cy, angle, side_offset):
    """Draw a shaft + two tips; posemap channels: B/R -> tips, G -> shaft.

    Returns the ground-truth keypoints:
    (tip1_xy, tip2_xy, base_xy) with base = shaft-segment midpoint (the
    centroid the contour decode converges to)."""
    h, w = img.shape[:2]
    bx = int(np.clip(cx - 30 * np.cos(angle), 5, w - 6))
    by = int(np.clip(cy - 30 * np.sin(angle), 5, h - 6))
    tx1 = int(np.clip(cx + 8 * np.cos(angle + 0.4), 5, w - 6))
    ty1 = int(np.clip(cy + 8 * np.sin(angle + 0.4), 5, h - 6))
    tx2 = int(np.clip(cx + 8 * np.cos(angle - 0.4), 5, w - 6))
    ty2 = int(np.clip(cy + 8 * np.sin(angle - 0.4), 5, h - 6))
    cv2.line(img, (bx, by), (int(cx), int(cy)), (180, 180, 190), 5)
    cv2.circle(img, (tx1, ty1), 3, (220, 220, 80), -1)
    cv2.circle(img, (tx2, ty2), 3, (220, 220, 80), -1)
    # pose map: green shaft (base region), blue+red tips
    cv2.line(posemap, (bx, by), (int(cx), int(cy)), (0, 255, 0), 5)
    cv2.circle(posemap, (tx1, ty1), 3, (255, 0, 0), -1)
    cv2.circle(posemap, (tx2, ty2), 3, (0, 0, 255), -1)
    return (
        (tx1, ty1),
        (tx2, ty2),
        ((bx + int(cx)) / 2.0, (by + int(cy)) / 2.0),
    )


def make_jigsaws_like_dataset(
    root,
    num_videos: int = 2,
    frames_per_video: int = 8,
    height: int = 96,
    width: int = 128,
    seed: int = 0,
    splits=("annotations_train", "annotations_val"),
):
    """Write images/ + pose_maps/ trees; returns the root path."""
    root = Path(root)
    rng = np.random.default_rng(seed)
    for split in splits:
        for v in range(1, num_videos + 1):
            img_dir = root / split / f"video_{v}" / "images"
            pm_dir = root / split / f"video_{v}" / "pose_maps"
            img_dir.mkdir(parents=True, exist_ok=True)
            pm_dir.mkdir(parents=True, exist_ok=True)
            lx, ly = rng.uniform(0.25, 0.4) * width, rng.uniform(
                0.3, 0.7
            ) * height
            rx, ry = rng.uniform(0.6, 0.75) * width, rng.uniform(
                0.3, 0.7
            ) * height
            la, ra = rng.uniform(0, 6.28), rng.uniform(0, 6.28)
            for f in range(frames_per_video):
                img = np.full((height, width, 3), 40, np.uint8)
                img += rng.integers(0, 20, img.shape, dtype=np.uint8)
                pml = np.zeros_like(img)
                pmr = np.zeros_like(img)
                _draw_instrument(img, pml, lx, ly, la, -1)
                _draw_instrument(img, pmr, rx, ry, ra, +1)
                lx += rng.uniform(-3, 3)
                ly += rng.uniform(-3, 3)
                rx += rng.uniform(-3, 3)
                ry += rng.uniform(-3, 3)
                la += rng.uniform(-0.2, 0.2)
                ra += rng.uniform(-0.2, 0.2)
                name = f"frame_{f:04d}"
                cv2.imwrite(str(img_dir / f"{name}.jpg"),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
                cv2.imwrite(str(pm_dir / f"{name.replace('frame', 'framel')}.png"),
                            cv2.cvtColor(pml, cv2.COLOR_RGB2BGR))
                cv2.imwrite(str(pm_dir / f"{name.replace('frame', 'framer')}.png"),
                            cv2.cvtColor(pmr, cv2.COLOR_RGB2BGR))
    return root


def make_synthetic_frames(
    num_frames: int = 20, height: int = 96, width: int = 128,
    seed: int = 0, return_keypoints: bool = False,
):
    """In-RAM RGB frames (N, H, W, 3) uint8 of the moving-instrument
    scene — the decoded form of :func:`make_synthetic_video`, for
    pipelines that start from frames already in host memory
    (``bench.py --mode e2e --source ram|device``,
    :func:`mfcnet_tpu.track.tracker.track_on_frames`).

    With ``return_keypoints`` also returns the ground-truth (N, 12) array
    in the tracker-CSV column layout."""
    rng = np.random.default_rng(seed)
    frames = np.zeros((num_frames, height, width, 3), np.uint8)
    lx, ly, rx, ry = 0.3 * width, 0.5 * height, 0.7 * width, 0.5 * height
    la, ra = 0.5, 3.5
    gt = np.zeros((num_frames, 12), np.float64)
    for f in range(num_frames):
        img = np.full((height, width, 3), 40, np.uint8)
        img += rng.integers(0, 20, img.shape, dtype=np.uint8)
        pm = np.zeros_like(img)
        lt1, lt2, lb = _draw_instrument(img, pm, lx, ly, la, -1)
        rt1, rt2, rb = _draw_instrument(img, pm, rx, ry, ra, +1)
        gt[f] = [*lt1, *lt2, *rt1, *rt2, *lb, *rb]
        lx += rng.uniform(-3, 3); ly += rng.uniform(-3, 3)
        rx += rng.uniform(-3, 3); ry += rng.uniform(-3, 3)
        la += rng.uniform(-0.2, 0.2); ra += rng.uniform(-0.2, 0.2)
        frames[f] = img
    if return_keypoints:
        return frames, gt
    return frames


def make_synthetic_video(
    path, num_frames: int = 20, height: int = 96, width: int = 128,
    fps: int = 30, seed: int = 0, return_keypoints: bool = False,
):
    """Write a small mp4 of the same moving-instrument scene.

    With ``return_keypoints`` also returns the ground-truth (N, 12) array
    in the tracker-CSV column layout
    [ltip1(x,y), ltip2(x,y), rtip1(x,y), rtip2(x,y), lbase(x,y),
    rbase(x,y)] — enables quantitative tracking-accuracy evaluation
    against the BASELINE tip-RMSE metric."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    frames, gt = make_synthetic_frames(
        num_frames, height, width, seed, return_keypoints=True
    )
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(str(path), fourcc, fps, (width, height))
    for img in frames:
        writer.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    writer.release()
    if return_keypoints:
        return path, gt
    return path
