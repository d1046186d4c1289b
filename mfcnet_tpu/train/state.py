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
    """Minimal mutable-through-replace train state with BN statistics."""

    step: int
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                self.batch_stats if new_batch_stats is None else new_batch_stats
            ),
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, apply_fn, params, tx, batch_stats=None):
        return cls(
            step=0,
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def multiframe_optimizer(
    lr_schedule,
    num_frames: int,
    train_base_model: bool,
    base_pretrained_loaded: bool,
) -> optax.GradientTransformation:
    """Adam with the reference's differential-LR recipe.

    Head params train at lr; base params at lr/(100*num_frames) when a
    pretrained per-frame checkpoint was loaded, else lr/num_frames
    (scripts/train_multiframe_detection.py:128-143). When the base is frozen
    its updates are zeroed (:145-151 sets requires_grad=False).
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
    return optax.multi_transform(
        {"base": base_tx, "head": optax.adam(lr_schedule)},
        label_fn,
    )


def singleframe_optimizer(lr_schedule) -> optax.GradientTransformation:
    """Plain Adam (scripts/train_toolpose_segmentation.py:239)."""
    return optax.adam(lr_schedule)
