"""Learning-rate schedules.

Reference: StepLR(step_size=num_epochs//2, gamma=0.1)
(scripts/train_multiframe_detection.py:152-155,
scripts/train_toolpose_segmentation.py:241-245) or constant.
"""

from __future__ import annotations

import optax


def make_schedule(
    name: str, lr: float, num_epochs: int, steps_per_epoch: int
):
    """'StepDecay': x0.1 every num_epochs//2 epochs; 'Constant': flat."""
    if name == "Constant":
        return optax.constant_schedule(lr)
    if name == "StepDecay":
        half = max(1, num_epochs // 2) * max(1, steps_per_epoch)
        # torch StepLR multiplies by gamma at every step_size epochs,
        # compounding: lr * 0.1 ** (epoch // step_size).
        return optax.exponential_decay(
            init_value=lr,
            transition_steps=half,
            decay_rate=0.1,
            staircase=True,
        )
    raise ValueError(f"unknown scheduler: {name}")
