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
default (reference bn.py ABN defaults), the activation menu
{leaky_relu, elu, none} (inplace_abn.cpp:66-75), and the UNBIASED
running-variance update ``running_var += momentum * var * count/(count-1)``
(functions.py:98) — torch BN semantics that flax's nn.BatchNorm does not
implement (it stores the biased batch var). Normalization itself uses the
biased var in both frameworks; the correction only affects the running
stats used at eval, i.e. train-then-eval bit-parity with ABN-trained
checkpoints such as HRNet's hrnet_cs_8090_torch11.pth stem.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax
from flax import linen as nn


class ABN(nn.Module):
    """BatchNorm + activation (reference: models/sync_bn/inplace_abn/bn.py
    ABN/InPlaceABN/InPlaceABNSync — all one module here; see module
    docstring for why the three variants collapse).

    Param/stat names match the converter's ``_bn`` layout: params
    {scale, bias}, batch_stats {mean, var}.
    """

    activation: str = "leaky_relu"
    slope: float = 0.01
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    unbiased_running_var: bool = True  # functions.py:98 count/(count-1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (feat,)
        )
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axes)
            var = jnp.mean(jnp.square(x), axes) - jnp.square(mean)
            # x.shape is the GLOBAL logical shape under jit/GSPMD, so with a
            # data-sharded batch these are the synchronized (cross-chip)
            # statistics and count is the global sample count per channel.
            count = 1
            for a in axes:
                count *= x.shape[a]
            if not self.is_initializing():
                m = self.momentum
                corr = count / (count - 1) if (
                    self.unbiased_running_var and count > 1
                ) else 1.0
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * corr
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        if self.activation == "leaky_relu":
            return nn.leaky_relu(y, self.slope)
        if self.activation == "elu":
            return nn.elu(y)
        if self.activation == "none":
            return y
        raise ValueError(f"unknown activation {self.activation}")


# API-compatible aliases (the reference exposes three classes; on TPU they
# are the same computation — see module docstring).
InPlaceABN = ABN
InPlaceABNSync = ABN
