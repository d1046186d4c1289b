"""Fused device-side augmentation pipeline.

The reference runs its transform stack per-sample on CPU dataloader workers
(src/dataloader_multiframe.py:209-223: to_tensor -> random rotate ->
HSV/brightness jitter -> resize -> vertical flip -> horizontal flip with
task-specific left/right class remapping -> ImageNet normalize). Here the
whole stack is one jitted, batch-vmapped device function over raw uint8
arrays — the host only decodes files.

Semantics preserved per op (each pinned by tests):
  * rotate: same integer angle in [-15, 15) for all frames/mask/depth of a
    sample, torchvision NEAREST + zero fill (:57-72)
  * jitter: with p=0.5 per sample, each frame gets independent
    brightness/contrast/saturation factors ~ U(0.95, 1.05) (:74-95)
  * resize: bilinear frames / nearest mask+depth (:42-55)
  * flips: p=0.5 each; class-ID remaps — tooltip 1<->2, toolpose 1<->3 &
    2<->4, endovis15 horizontal 1-5<->6-10 and vertical 4<->5 & 9<->10
    (:97-186)
  * normalize: ImageNet mean/std (:188-207)
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from mfcnet_tpu.ops.color import (
    adjust_brightness,
    adjust_contrast,
    adjust_saturation,
)
from mfcnet_tpu.ops.resize import resize_bilinear, resize_nearest
from mfcnet_tpu.ops.rotate import rotate_nearest

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _hflip_table(task: str, num_classes: int) -> np.ndarray:
    t = np.arange(256, dtype=np.int32)
    if task == "tooltip_segmentation":
        t[1], t[2] = 2, 1
    elif task == "toolpose_segmentation":
        t[1], t[3] = 3, 1
        t[2], t[4] = 4, 2
    elif task == "endovis15_segmentation":
        for k in range(1, 6):
            t[k], t[k + 5] = k + 5, k
    # binary: identity
    return t


def _vflip_table(task: str) -> np.ndarray:
    t = np.arange(256, dtype=np.int32)
    if task == "endovis15_segmentation":
        t[4], t[5] = 5, 4
        t[9], t[10] = 10, 9
    return t


@dataclasses.dataclass(frozen=True)
class TransformConfig:
    out_height: int = 480
    out_width: int = 640
    prediction_task: str = "toolpose_segmentation"
    jitter_p: float = 0.5
    flip_p: float = 0.5
    rotate_lo: int = -15
    rotate_hi: int = 15  # exclusive, matching np.random.randint(-15, 15)


def _augment_one(sample, key, cfg: TransformConfig):
    """Augment one sample: frames (T,H,W,3) u8, mask (H,W) u8,
    optional depth (T,H,W) u8."""
    k_rot, k_jit, k_jitf, k_vf, k_hf = jax.random.split(key, 5)
    frames = sample["frames"].astype(jnp.float32) / 255.0
    mask = sample["mask"].astype(jnp.int32)[..., None]  # (H, W, 1)
    depth = sample.get("depth")
    if depth is not None:
        depth = depth.astype(jnp.float32)[..., None] / 255.0  # (T, H, W, 1)

    # --- rotate (shared angle) ---
    angle = jax.random.randint(k_rot, (), cfg.rotate_lo, cfg.rotate_hi)
    angle = angle.astype(jnp.float32)
    frames = rotate_nearest(frames, angle)
    mask = rotate_nearest(mask, angle)
    if depth is not None:
        depth = rotate_nearest(depth, angle)

    # --- HSV jitter (per-frame factors, one keep/skip decision) ---
    T = frames.shape[0]
    do_jit = jax.random.bernoulli(k_jit, cfg.jitter_p)
    factors = jax.random.uniform(
        k_jitf, (T, 3), minval=0.95, maxval=1.05
    )
    jittered = frames
    jittered = adjust_brightness(jittered, factors[:, 0][:, None, None, None])
    jittered = adjust_contrast(jittered, factors[:, 1][:, None, None, None])
    jittered = adjust_saturation(jittered, factors[:, 2][:, None, None, None])
    frames = jnp.where(do_jit, jittered, frames)

    # --- resize ---
    frames = resize_bilinear(frames, cfg.out_height, cfg.out_width)
    mask = resize_nearest(mask, cfg.out_height, cfg.out_width)
    if depth is not None:
        depth = resize_nearest(depth, cfg.out_height, cfg.out_width)

    # --- vertical flip ---
    vt = jnp.asarray(_vflip_table(cfg.prediction_task))
    do_v = jax.random.bernoulli(k_vf, cfg.flip_p)
    frames = jnp.where(do_v, frames[:, ::-1], frames)
    mask = jnp.where(do_v, vt[mask][::-1], mask)
    if depth is not None:
        depth = jnp.where(do_v, depth[:, ::-1], depth)

    # --- horizontal flip (with class remap) ---
    ht = jnp.asarray(_hflip_table(cfg.prediction_task, 0))
    do_h = jax.random.bernoulli(k_hf, cfg.flip_p)
    frames = jnp.where(do_h, frames[:, :, ::-1], frames)
    mask = jnp.where(do_h, ht[mask][:, ::-1], mask)
    if depth is not None:
        depth = jnp.where(do_h, depth[:, :, ::-1], depth)

    # --- normalize ---
    frames = (frames - IMAGENET_MEAN) / IMAGENET_STD

    out = {"frames": frames, "mask": mask[..., 0]}
    if depth is not None:
        out["depth"] = depth
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def augment_train_batch(batch, key, cfg: TransformConfig):
    """Batched train augmentation: dict of (B, ...) uint8 arrays -> floats.

    Output: frames (B,T,h,w,3) f32 normalized, mask (B,h,w) i32,
    depth (B,T,h,w,1) f32 if present.
    """
    B = batch["frames"].shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(lambda s, k: _augment_one(s, k, cfg))(batch, keys)


@functools.partial(jax.jit, static_argnums=(1,))
def preprocess_eval_batch(batch, cfg: TransformConfig):
    """Eval/test: to-float -> resize -> normalize (no augmentation;
    src/dataloader_multiframe.py:215-220)."""
    frames = batch["frames"].astype(jnp.float32) / 255.0
    frames = resize_bilinear(frames, cfg.out_height, cfg.out_width)
    frames = (frames - IMAGENET_MEAN) / IMAGENET_STD
    mask = batch["mask"].astype(jnp.int32)[..., None]
    mask = resize_nearest(mask, cfg.out_height, cfg.out_width)[..., 0]
    out = {"frames": frames, "mask": mask}
    if "depth" in batch:
        depth = batch["depth"].astype(jnp.float32)[..., None] / 255.0
        out["depth"] = resize_nearest(depth, cfg.out_height, cfg.out_width)
    return out
