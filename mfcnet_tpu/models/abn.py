"""Activated Batch Normalization — the InPlace-ABN capability, TPU-native.

The reference vendors a C++/CUDA InPlace-ABN extension
(models/sync_bn/inplace_abn/: mean_var / forward / edz_eydz / backward
kernels plus a master-worker queue protocol for cross-GPU statistics,
functions.py:157-230). On TPU both halves of that machinery dissolve:

  * the in-place memory trick exists to avoid storing pre-activation
    buffers; XLA's fusion + rematerialization make that decision for the
    whole graph, so ABN is just BN + activation and lets the compiler fuse;
  * the synchronized statistics come for free: under ``jit`` with a
    batch sharded over the ``data`` mesh axis, the batch-stat reductions
    are global (XLA inserts the cross-chip collectives) — exactly what
    ``InPlaceABNSync`` implements by hand.

Matching details kept: eps 1e-5, momentum 0.1, leaky_relu slope 0.01
default (reference bn.py ABN defaults), and the activation menu
{leaky_relu, elu, none} (inplace_abn.cpp:66-75).
"""

from __future__ import annotations

from flax import linen as nn


class ABN(nn.Module):
    """BatchNorm + activation (reference: models/sync_bn/inplace_abn/bn.py
    ABN/InPlaceABN/InPlaceABNSync — all one module here; see module
    docstring for why the three variants collapse)."""

    activation: str = "leaky_relu"
    slope: float = 0.01
    momentum: float = 0.1  # torch convention; flax momentum = 1 - this
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
        )(x)
        if self.activation == "leaky_relu":
            return nn.leaky_relu(x, self.slope)
        if self.activation == "elu":
            return nn.elu(x)
        if self.activation == "none":
            return x
        raise ValueError(f"unknown activation {self.activation}")


# API-compatible aliases (the reference exposes three classes; on TPU they
# are the same computation — see module docstring).
InPlaceABN = ABN
InPlaceABNSync = ABN
