"""Jitted, sharded train/eval step factories.

The reference's hot loop (src/engine.py:29-79) does per-batch H2D copies, a
frozen-flow-model forward, the task-model forward, log_softmax, loss,
backward, and an Adam step as separate eager calls. Here the entire step —
including the optional frozen flow model — is one compiled XLA program;
batches arrive pre-sharded over the ``data`` mesh axis and XLA inserts the
gradient all-reduce + global BN statistics collectives.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from mfcnet_tpu.train.loss import compute_losses
from mfcnet_tpu.train.metrics import compute_metrics


def _cast_floats(tree, dtype):
    """Cast floating leaves of a pytree (params / inputs) to ``dtype``."""
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _resolve_dtype(compute_dtype):
    """'bfloat16'/'float32'/None -> jnp dtype or None (= no casting).

    Mixed-precision training: master params, optimizer state, and BN
    running statistics stay f32; the forward/backward compute runs in
    ``compute_dtype`` (gradients flow back to the f32 leaves through the
    cast). The loss reductions run in f32. Where the final log_softmax
    lives in the STEP (multi-frame; single-frame 'logits' models) it is
    computed on f32-cast logits; models that emit log-probs internally
    ('log_probs'/'tapnet' single-frame modes) produce them at compute
    precision — under bf16 those log-probs carry bf16 rounding (~1e-3
    relative) into the loss.
    """
    if compute_dtype in (None, "float32", jnp.float32):
        return None
    if compute_dtype in ("bfloat16", jnp.bfloat16):
        return jnp.bfloat16
    raise ValueError(f"unknown compute_dtype: {compute_dtype}")


def make_multiframe_train_step(
    model,
    loss_fns: Sequence[str],
    loss_wts: Sequence[float],
    num_classes: int,
    class_weights=None,
    train_base_model: bool = False,
    flow_fn: Optional[Callable] = None,
    donate: bool = True,
    compute_dtype=None,
):
    """Build the jitted multi-frame train step.

    Args:
      model: a MultiFrameSegmenter.
      flow_fn: optional jittable ``(frames: (B,T,H,W,3)) -> (B,T-1,H,W,2)``
        frozen flow provider (reference computes flow per frame pair inside
        the loop, src/engine.py:39-53).

    Step signature: ``step(state, batch, ...) -> (state, logs)`` where batch
    is a dict with 'frames' (B,T,H,W,3) f32, 'mask' (B,H,W) int32, optional
    'depth' (B,T,H,W,1).
    """

    cdt = _resolve_dtype(compute_dtype)

    def loss_fn(params, batch_stats, batch, rng):
        frames = batch["frames"]
        depth = batch.get("depth")
        optflow = flow_fn(frames) if flow_fn is not None else None
        if cdt is not None:
            # bf16 compute: params + inputs cast; batch_stats stay f32
            # (the head's BN computes statistics in f32 regardless)
            params = _cast_floats(params, cdt)
            frames = frames.astype(cdt)
            depth = None if depth is None else depth.astype(cdt)
            optflow = None if optflow is None else optflow.astype(cdt)
        variables = {"params": params, "batch_stats": batch_stats}
        logits, mutated = model.apply(
            variables,
            frames,
            optflow=optflow,
            depth=depth,
            train=True,
            train_base=train_base_model,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        total, parts = compute_losses(
            log_probs,
            batch["mask"],
            loss_fns,
            loss_wts,
            num_classes,
            class_weights,
        )
        new_stats = mutated["batch_stats"]
        if cdt is not None:
            # flax-BatchNorm backbones may emit bf16 batch stats under
            # bf16 compute; the stored running stats stay f32
            new_stats = _cast_floats(new_stats, jnp.float32)
        return total, (parts, new_stats)

    base_rng = jax.random.PRNGKey(17)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch):
        rng = jax.random.fold_in(base_rng, state.step)
        (_, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, parts

    return train_step


def make_multiframe_eval_step(
    model,
    loss_fns: Sequence[str],
    loss_wts: Sequence[float],
    metric_fns: Sequence[str],
    num_classes: int,
    class_weights=None,
    flow_fn: Optional[Callable] = None,
    compute_dtype=None,
):
    """Eval step: loss + on-device per-class IoU/Dice (src/engine.py:89-171)."""

    cdt = _resolve_dtype(compute_dtype)

    @jax.jit
    def eval_step(state, batch):
        frames = batch["frames"]
        depth = batch.get("depth")
        optflow = flow_fn(frames) if flow_fn is not None else None
        params = state.params
        if cdt is not None:
            params = _cast_floats(params, cdt)
            frames = frames.astype(cdt)
            depth = None if depth is None else depth.astype(cdt)
            optflow = None if optflow is None else optflow.astype(cdt)
        logits = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            frames,
            optflow=optflow,
            depth=depth,
            train=False,
        )
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        _, parts = compute_losses(
            log_probs,
            batch["mask"],
            loss_fns,
            loss_wts,
            num_classes,
            class_weights,
        )
        parts.update(
            compute_metrics(log_probs, batch["mask"], metric_fns, num_classes)
        )
        return log_probs, parts

    return eval_step


def make_singleframe_train_step(
    model,
    loss_fns: Sequence[str],
    loss_wts: Sequence[float],
    num_classes: int,
    class_weights=None,
    output_mode: str = "log_probs",
    donate: bool = True,
    compute_dtype=None,
):
    """Single-frame train step (scripts/train_toolpose_segmentation.py:142-192).

    ``output_mode`` mirrors the reference's per-model-type adapters (:160-170):
      'log_probs' — model already emits log-probs (TernausNet, SegFormer)
      'logits'    — apply log_softmax (HRNet, DeepLab, FCN, UNet, ResUNet)
      'tapnet'    — input is (B,H,W,4): RGB + attention map, model takes both
    """

    cdt = _resolve_dtype(compute_dtype)

    def adapt(variables, batch, train, rng=None):
        x = batch["image"]
        if cdt is not None:
            variables = dict(
                variables, params=_cast_floats(variables["params"], cdt)
            )
            x = x.astype(cdt)
        kwargs = dict(train=train)
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        mut = ["batch_stats"] if train else []
        if output_mode == "tapnet":
            out = model.apply(
                variables, x[..., :3], x[..., 3:], mutable=mut, **kwargs
            )
        else:
            out = model.apply(variables, x, mutable=mut, **kwargs)
        if train:
            out, mutated = out
            stats = mutated.get("batch_stats", {})
            if cdt is not None:
                stats = _cast_floats(stats, jnp.float32)
        else:
            stats = None
        out = out.astype(jnp.float32)
        if output_mode == "logits":
            out = jax.nn.log_softmax(out, axis=-1)
        return out, stats

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        log_probs, new_stats = adapt(variables, batch, train=True, rng=rng)
        total, parts = compute_losses(
            log_probs,
            batch["mask"],
            loss_fns,
            loss_wts,
            num_classes,
            class_weights,
        )
        return total, (parts, new_stats)

    base_rng = jax.random.PRNGKey(19)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch):
        rng = jax.random.fold_in(base_rng, state.step)
        (_, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        state = state.apply_gradients(
            grads, new_batch_stats=new_stats if new_stats else None
        )
        return state, parts

    return train_step


def make_singleframe_eval_step(
    model,
    loss_fns: Sequence[str],
    loss_wts: Sequence[float],
    metric_fns: Sequence[str],
    num_classes: int,
    class_weights=None,
    output_mode: str = "log_probs",
    compute_dtype=None,
):
    cdt = _resolve_dtype(compute_dtype)

    @jax.jit
    def eval_step(state, batch):
        params = state.params
        x = batch["image"]
        if cdt is not None:
            params = _cast_floats(params, cdt)
            x = x.astype(cdt)
        variables = {"params": params, "batch_stats": state.batch_stats}
        if output_mode == "tapnet":
            out = model.apply(variables, x[..., :3], x[..., 3:], train=False)
        else:
            out = model.apply(variables, x, train=False)
        out = out.astype(jnp.float32)
        if output_mode == "logits":
            out = jax.nn.log_softmax(out, axis=-1)
        _, parts = compute_losses(
            out, batch["mask"], loss_fns, loss_wts, num_classes, class_weights
        )
        parts.update(
            compute_metrics(out, batch["mask"], metric_fns, num_classes)
        )
        return out, parts

    return eval_step
