"""UnFlow (FlowNet-CSS) optical flow in Flax (reference:
models/unflow_model.py).

One ``Complex`` net (siamese conv encoder + the 441-channel correlation cost
volume) followed by two ``Simple`` refinement nets that consume
[first, second, flow, warp(second, flow), |first - warp|]. All quirks kept:
asymmetric ZeroPad2d paddings, LeakyReLU(0.1), border-padding backward warp
with align_corners=False, the x20 flow scaling, and the BGR + mean-subtract
input preprocessing.

The correlation uses :func:`mfcnet_tpu.ops.correlation.correlation_cost_volume`
— the Pallas/MXU replacement for the reference's CUDA kernels
(models/unflow_correlation.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mfcnet_tpu.models.common import TorchConvTranspose
from mfcnet_tpu.ops.correlation import correlation_cost_volume
from mfcnet_tpu.ops.warp import grid_sample_bilinear

_lrelu = lambda x: nn.leaky_relu(x, 0.1)  # noqa: E731

# UnFlow BGR channel means / 255 (reference: models/unflow_model.py:253-259)
# (numpy, not jnp: module-level jnp constants initialize the XLA backend
# at import, breaking jax.distributed.initialize on multi-host launches)
_MEANS_BGR = np.asarray(
    [104.920005, 110.175300, 114.785955], np.float32
) / 255.0


def _pad_conv(x, features, kernel, stride, pad_lrtb, name=None):
    """ZeroPad2d([l, r, t, b]) + Conv(kernel, stride, VALID)."""
    l, r, t, b = pad_lrtb
    x = jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))
    return nn.Conv(
        features, (kernel, kernel), (stride, stride), padding="VALID",
        name=name,
    )(x)


def backward_warp(img, flow):
    """Border-padded bilinear warp (reference: models/unflow_model.py:6-17;
    grid_sample default align_corners=False)."""
    B, H, W, _ = img.shape
    xs = jnp.linspace(-1.0, 1.0, W, dtype=jnp.float32)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)
    gx = xs[None, None, :] + flow[..., 0] / ((W - 1) / 2.0)
    gy = ys[None, :, None] + flow[..., 1] / ((H - 1) / 2.0)
    return grid_sample_bilinear(
        img, gx, gy, align_corners=False, padding_mode="border"
    )


class Upconv(nn.Module):
    """Flow-pyramid decoder (reference: models/unflow_model.py:25-88)."""

    @nn.compact
    def __call__(self, feats):
        def out_conv(x, name):
            return nn.Conv(2, (3, 3), padding="SAME", name=name)(x)

        def up_flow(f, name):
            return TorchConvTranspose(2, name=name)(f)

        def up_feat(x, features, name):
            return _lrelu(TorchConvTranspose(features, name=name)(x))

        x = feats["conv6"]
        flow6 = out_conv(x, "six_out")
        x = jnp.concatenate(
            [feats["conv5"], up_feat(x, 512, "fiv_next"),
             up_flow(flow6, "six_up")], axis=-1
        )
        flow5 = out_conv(x, "fiv_out")
        x = jnp.concatenate(
            [feats["conv4"], up_feat(x, 256, "fou_next"),
             up_flow(flow5, "fiv_up")], axis=-1
        )
        flow4 = out_conv(x, "fou_out")
        x = jnp.concatenate(
            [feats["conv3"], up_feat(x, 128, "thr_next"),
             up_flow(flow4, "fou_up")], axis=-1
        )
        flow3 = out_conv(x, "thr_out")
        x = jnp.concatenate(
            [feats["conv2"], up_feat(x, 64, "two_next"),
             up_flow(flow3, "thr_up")], axis=-1
        )
        flow2 = out_conv(x, "two_out")

        # moduleUpscale x2: ConvTranspose(k3 s2 p1, no bias) + replicate-pad
        # right/bottom (reference :67-70) — the SAME module is applied twice
        # (:87), so the deconv weights are shared.
        upscale_deconv = TorchConvTranspose(
            2, kernel_size=3, stride=2, padding=1, use_bias=False,
            name="upscale",
        )

        def upscale(f):
            y = upscale_deconv(f)
            return jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")

        return upscale(upscale(flow2)) * 20.0


class ComplexNet(nn.Module):
    """Correlation flow net (reference: models/unflow_model.py:91-171)."""

    corr_impl: str = "auto"

    @nn.compact
    def __call__(self, first, second):
        # siamese encoder: the reference reuses the same modules for both
        # images (models/unflow_model.py:157-162) — instantiate once, apply
        # twice to share parameters.
        conv_one = nn.Conv(64, (7, 7), (2, 2), padding="VALID", name="one")
        conv_two = nn.Conv(128, (5, 5), (2, 2), padding="VALID", name="two")
        conv_thr = nn.Conv(256, (5, 5), (2, 2), padding="VALID", name="thr")

        def pad(x, l, r, t, b):
            return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))

        def encoder3(x):
            c1 = _lrelu(conv_one(pad(x, 2, 4, 2, 4)))
            c2 = _lrelu(conv_two(pad(c1, 1, 3, 1, 3)))
            c3 = _lrelu(conv_thr(pad(c2, 1, 3, 1, 3)))
            return c1, c2, c3

        conv1, conv2, conv3_first = encoder3(first)
        _, _, conv3_second = encoder3(second)

        redir = _lrelu(nn.Conv(32, (1, 1), name="redir")(conv3_first))
        corr = correlation_cost_volume(
            conv3_first, conv3_second, impl=self.corr_impl
        )
        conv3 = _lrelu(
            nn.Conv(256, (3, 3), padding="SAME", name="combined")(
                jnp.concatenate([redir, corr], axis=-1)
            )
        )

        def down_pair(x, features, name):
            y = _lrelu(
                _pad_conv(x, features, 3, 2, (0, 2, 0, 2), name=f"{name}_a")
            )
            return _lrelu(
                nn.Conv(features, (3, 3), padding="SAME",
                        name=f"{name}_b")(y)
            )

        conv4 = down_pair(conv3, 512, "fou")
        conv5 = down_pair(conv4, 512, "fiv")
        conv6 = down_pair(conv5, 1024, "six")
        feats = {
            "conv2": conv2, "conv3": conv3, "conv4": conv4,
            "conv5": conv5, "conv6": conv6,
        }
        return Upconv(name="upconv")(feats)


class SimpleNet(nn.Module):
    """Refinement flow net (reference: models/unflow_model.py:174-238)."""

    @nn.compact
    def __call__(self, first, second, flow):
        warp = backward_warp(second, flow)
        x = jnp.concatenate(
            [first, second, flow, warp, jnp.abs(first - warp)], axis=-1
        )
        conv1 = _lrelu(_pad_conv(x, 64, 7, 2, (2, 4, 2, 4), name="one"))
        conv2 = _lrelu(_pad_conv(conv1, 128, 5, 2, (1, 3, 1, 3), name="two"))
        y = _lrelu(_pad_conv(conv2, 256, 5, 2, (1, 3, 1, 3), name="thr_a"))
        conv3 = _lrelu(
            nn.Conv(256, (3, 3), padding="SAME", name="thr_b")(y)
        )

        def down_pair(x, features, name):
            y = _lrelu(
                _pad_conv(x, features, 3, 2, (0, 2, 0, 2), name=f"{name}_a")
            )
            return _lrelu(
                nn.Conv(features, (3, 3), padding="SAME",
                        name=f"{name}_b")(y)
            )

        conv4 = down_pair(conv3, 512, "fou")
        conv5 = down_pair(conv4, 512, "fiv")
        conv6 = down_pair(conv5, 1024, "six")
        feats = {
            "conv2": conv2, "conv3": conv3, "conv4": conv4,
            "conv5": conv5, "conv6": conv6,
        }
        return Upconv(name="upconv")(feats)


class UnFlow(nn.Module):
    """CSS stack (reference: models/unflow_model.py:241-268). Input images
    are RGB in [0, 1]; preprocessing (BGR swap + mean subtract) is internal.
    """

    corr_impl: str = "auto"

    @nn.compact
    def __call__(self, first, second, train: bool = False):
        first = first[..., ::-1] - _MEANS_BGR
        second = second[..., ::-1] - _MEANS_BGR
        flow = ComplexNet(self.corr_impl, name="flownet0")(first, second)
        flow = SimpleNet(name="flownet1")(first, second, flow)
        flow = SimpleNet(name="flownet2")(first, second, flow)
        return flow


def make_unflow_flow_fn(basic: bool = True, variables=None, rng=None,
                        model=None):
    """Frozen UnFlow provider with the engine's frame-pair convention."""
    import numpy as np

    if model is None:
        model = UnFlow()
    if variables is None:
        import jax as _jax

        from mfcnet_tpu.utils.jitinit import jit_init

        rng = rng if rng is not None else _jax.random.PRNGKey(0)
        dummy = np.zeros((1, 64, 64, 3), np.float32)
        variables = jit_init(model, rng, dummy, dummy)

    def flow_fn(frames):
        """All T-1 pairs as ONE batched forward (every op is per-sample,
        so this equals the per-pair loop to float-reassociation level —
        pinned in tests/test_flow.py)."""
        from mfcnet_tpu.ops.pairs import repeat_for_pairs

        B, T, H, W, _ = frames.shape
        rest = frames[:, 1:].reshape((B * (T - 1), H, W, 3))
        f0 = repeat_for_pairs(frames[:, 0], T - 1)
        a, b = (rest, f0) if basic else (f0, rest)
        fl = model.apply(variables, a, b)
        return fl.reshape((B, T - 1, H, W, 2))

    return flow_fn
