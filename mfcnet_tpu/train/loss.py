"""Device-side losses matching the reference's numerics (src/loss.py).

All losses take NHWC log-probabilities ``log_probs: (B, H, W, C)`` and
integer targets ``(B, H, W)`` and return f32 scalars, computed fully inside
jit (no host sync; the reference pulls ``.item()`` per loss each step,
src/loss.py:19-20).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp


def nll_loss(log_probs, targets, class_weights=None):
    """Weighted NLL over log-probs, torch ``nn.NLLLoss`` 'mean' semantics:
    sum(w[y] * -logp[y]) / sum(w[y]) (reference: src/loss.py:31-43)."""
    C = log_probs.shape[-1]
    picked = jnp.take_along_axis(
        log_probs, targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    if class_weights is None:
        return -jnp.mean(picked)
    w = jnp.asarray(class_weights, dtype=log_probs.dtype)[targets]
    return -jnp.sum(w * picked) / jnp.sum(w)


def soft_jaccard_loss(log_probs, targets, num_classes: int, eps: float = 1e-15):
    """Soft-Jaccard: sum over non-background classes of
    -log((I+eps)/(U+eps)), divided by num_classes (reference:
    src/loss.py:45-63 — note the divisor includes the background class)."""
    loss = 0.0
    for cls in range(1, num_classes):
        t = (targets == cls).astype(log_probs.dtype)
        p = jnp.exp(log_probs[..., cls])
        inter = jnp.sum(p * t)
        union = jnp.sum(p) + jnp.sum(t) - inter
        loss = loss - jnp.log((inter + eps) / (union + eps))
    return loss / num_classes


def mse_loss(outputs, targets):
    """Plain MSE (reference: src/loss.py:23-29)."""
    return jnp.mean((outputs - targets.astype(outputs.dtype)) ** 2)


def wasserstein_loss(
    log_probs, targets, num_classes: int, cost_matrix, eps: float = 1e-15
):
    """Wasserstein-distance loss with a precomputed pairwise pixel cost
    matrix (reference: src/loss.py:65-119; unused by the training recipes
    but part of the loss library surface).

    ``cost_matrix``: (H*W, H*W) pairwise Euclidean distances.
    """
    B = log_probs.shape[0]
    loss = 0.0
    for cls in range(num_classes):
        t = (targets == cls).astype(log_probs.dtype).reshape(B, -1)
        p = jnp.exp(log_probs[..., cls]).reshape(B, -1)
        t = t / (jnp.sum(t, axis=1, keepdims=True) + eps)
        p = p / (jnp.sum(p, axis=1, keepdims=True) + eps)
        diff = jnp.abs(t - p)  # (B, HW)
        # reference sums cost_matrix * |t - p| over both matrix axes with
        # broadcasting (src/loss.py:114) — i.e. each |t-p| entry weighted by
        # the sum of its cost-matrix row.
        w = jnp.sum(cost_matrix, axis=1)  # (HW,)
        wd = jnp.sum(diff * w[None, :], axis=1)
        loss = loss + jnp.mean(wd)
    return loss / num_classes


def compute_losses(
    log_probs,
    targets,
    loss_fns: Sequence[str],
    loss_wts: Sequence[float],
    num_classes: int,
    class_weights=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted-sum loss dispatcher (reference: src/loss.py:6-21)."""
    if len(loss_fns) != len(loss_wts):
        # the reference asserts this arity at startup
        # (scripts/train_multiframe_detection.py:47-49); without it the
        # zip silently DROPS loss terms (e.g. --loss_fns nll soft_jaccard
        # with the default single-element --loss_wts trains on nll only)
        raise ValueError(
            f"{len(loss_fns)} loss_fns but {len(loss_wts)} loss_wts — "
            "pass one weight per loss"
        )
    total = 0.0
    parts: Dict[str, jnp.ndarray] = {}
    for fn, wt in zip(loss_fns, loss_wts):
        if fn == "nll":
            val = nll_loss(log_probs, targets, class_weights)
        elif fn == "soft_jaccard":
            val = soft_jaccard_loss(log_probs, targets, num_classes)
        elif fn == "mse":
            val = mse_loss(log_probs, targets)
        else:
            raise ValueError(f"Loss function {fn} not implemented")
        total = total + wt * val
        parts["loss_" + fn] = val
    parts["loss_total"] = total
    return total, parts
