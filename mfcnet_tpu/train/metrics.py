"""Device-side evaluation metrics (reference: src/metrics.py, NumPy on host).

The reference computes per-class IoU/Dice on CPU with NumPy after pulling
the outputs off-device each step (src/metrics.py:6-7). Here the confusion
matrix and per-class IoU/Dice are computed inside jit via a one-hot matmul
(MXU) so evaluation adds no host round-trip.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def confusion_matrix(pred, target, num_classes: int):
    """(C, C) counts, rows = ground truth, cols = prediction.

    Matches ``calculate_confusion_matrix_from_arrays`` (src/metrics.py:50-56).
    One-hot matmul formulation: cm = onehot(gt)^T @ onehot(pred).
    """
    t = jax.nn.one_hot(target.reshape(-1), num_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(pred.reshape(-1), num_classes, dtype=jnp.float32)
    return jnp.dot(t.T, p, preferred_element_type=jnp.float32)


def per_class_iou_dice(pred, target, num_classes: int, eps: float = 1e-15):
    """Per-image, per-foreground-class IoU and Dice.

    pred/target: (B, H, W) int class maps. Returns (iou, dice) each of
    shape (B, num_classes - 1), foreground classes 1..C-1 — matching
    ``get_jaccard``/``get_dice`` (src/metrics.py:41-48; the reference
    evaluates per-image since its val loader uses batch_size=1).
    """
    ious, dices = [], []
    for cls in range(1, num_classes):
        t = (target == cls).astype(jnp.float32)
        p = (pred == cls).astype(jnp.float32)
        inter = jnp.sum(p * t, axis=(-2, -1))
        tsum = jnp.sum(t, axis=(-2, -1))
        psum = jnp.sum(p, axis=(-2, -1))
        union = tsum + psum
        ious.append((inter + eps) / (union - inter + eps))
        dices.append((2.0 * inter + eps) / (union + eps))
    return jnp.stack(ious, axis=-1), jnp.stack(dices, axis=-1)


def compute_metrics(
    log_probs,
    targets,
    metric_fns: Sequence[str],
    num_classes: int,
) -> Dict[str, jnp.ndarray]:
    """Metric dispatcher (reference: src/metrics.py:4-39).

    Returns a dict with per-class arrays of shape (B, C-1) keyed by metric
    name, plus the scalar per-image means.
    """
    pred = jnp.argmax(log_probs, axis=-1)
    out: Dict[str, jnp.ndarray] = {}
    iou, dice = per_class_iou_dice(pred, targets, num_classes)
    for fn in metric_fns:
        if fn == "iou":
            out["iou_per_class"] = iou
            out["metric_iou"] = jnp.mean(iou)
        elif fn == "dice":
            out["dice_per_class"] = dice
            out["metric_dice"] = jnp.mean(dice)
        else:
            raise ValueError(f"Metric function {fn} not implemented")
    return out
