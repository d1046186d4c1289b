"""Train state and optimizer construction.

Replaces the reference's Adam param-group plumbing
(scripts/train_multiframe_detection.py:128-151): differential learning rates
for base vs fusion head become an ``optax.multi_transform`` partition over
the top-level parameter collections, and base-model freezing becomes
``optax.set_to_zero`` on the 'base' partition (the reference freezes with
requires_grad=False, :145-151).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    """Minimal mutable-through-replace train state with BN statistics.

    ``ema_params``/``ema_decay``: optional exponential moving average of
    the parameters, updated inside ``apply_gradients`` (no extra jit
    boundary). EMA weights typically evaluate better than the raw last
    iterate; they are checkpointed alongside params and can be served via
    ``cli.export_model --use_ema``. No reference analogue.
    """

    step: int
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    ema_params: object = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            # under optax.MultiSteps only every k-th micro-batch is a real
            # parameter update; blending on accumulation micro-steps would
            # silently compound the decay to d^k per update. MultiSteps
            # resets mini_step to 0 exactly when the inner update ran.
            mini = getattr(new_opt_state, "mini_step", None)
            is_update = True if mini is None else (mini == 0)
            new_ema = jax.tree.map(
                lambda e, p: jax.numpy.where(
                    is_update, e * d + p.astype(e.dtype) * (1.0 - d), e
                ),
                new_ema, new_params,
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                self.batch_stats if new_batch_stats is None else new_batch_stats
            ),
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    @classmethod
    def create(cls, apply_fn, params, tx, batch_stats=None,
               ema_decay: float = 0.0):
        return cls(
            step=0,
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
            # a true copy — identity-aliasing params here would hand the
            # donating train step the same buffer twice (Execute() error)
            ema_params=(
                jax.tree.map(lambda p: jax.numpy.array(p), params)
                if ema_decay > 0 else None
            ),
            ema_decay=float(ema_decay),
        )


def multiframe_optimizer(
    lr_schedule,
    num_frames: int,
    train_base_model: bool,
    base_pretrained_loaded: bool,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """Adam with the reference's differential-LR recipe.

    Head params train at lr; base params at lr/(100*num_frames) when a
    pretrained per-frame checkpoint was loaded, else lr/num_frames
    (scripts/train_multiframe_detection.py:128-143). When the base is frozen
    its updates are zeroed (:145-151 sets requires_grad=False).

    ``grad_accum`` > 1 wraps the whole transform in ``optax.MultiSteps``:
    gradients are averaged over N micro-batches before one Adam update —
    the inner schedules (and Adam moments) count REAL updates, so
    per-epoch LR decay stays correct when the caller divides
    steps_per_epoch by N.
    """
    base_scale = (
        1.0 / (100.0 * num_frames)
        if base_pretrained_loaded
        else 1.0 / num_frames
    )

    def label_fn(params):
        return {
            k: jax.tree.map(
                lambda _, lbl=("base" if k == "base" else "head"): lbl, v
            )
            for k, v in params.items()
        }

    base_tx = (
        optax.set_to_zero()
        if not train_base_model
        else optax.adam(lambda step: lr_schedule(step) * base_scale)
    )
    tx = optax.multi_transform(
        {"base": base_tx, "head": optax.adam(lr_schedule)},
        label_fn,
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def singleframe_optimizer(
    lr_schedule, grad_accum: int = 1
) -> optax.GradientTransformation:
    """Plain Adam (scripts/train_toolpose_segmentation.py:239)."""
    tx = optax.adam(lr_schedule)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx
