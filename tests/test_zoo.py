"""Forward-shape/behavior tests for the remaining model zoo (tiny configs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfcnet_tpu.utils.jitinit import jit_init

H, W, C = 32, 32, 5


def _run(model, *args, train=False, **kwargs):
    variables = jit_init(model, jax.random.PRNGKey(0), *args, **kwargs)
    out = jax.jit(
        lambda v, *a: model.apply(v, *a, **kwargs)
    )(variables, *args)
    return out, variables


def test_unet():
    from mfcnet_tpu.models.unet import UNet

    model = UNet(output_channels=C, dims=(4, 8, 8, 8, 8, 8))
    y, _ = _run(model, jnp.zeros((2, H, W, 3)))
    assert y.shape == (2, H, W, C)


def test_resunet():
    from mfcnet_tpu.models.resunet import ResUNetVB

    model = ResUNetVB(out_channels=C, dim=8, dim_mults=(1, 2), groups=4)
    y, _ = _run(model, jnp.zeros((2, H, W, 3)))
    assert y.shape == (2, H, W, C)


def test_tapnet_generic():
    from mfcnet_tpu.models.tapnet import TAPNet

    model = TAPNet(num_classes=C)
    y, _ = _run(
        model, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 1))
    )
    assert y.shape == (1, H, W, C)


def test_tapnet16_logprobs():
    from mfcnet_tpu.models.tapnet import TAPNet16

    tiny = ((4,), (8,), (8, 8), (16, 16), (16, 16))
    model = TAPNet16(num_classes=C, stage_convs=tiny)
    y, _ = _run(
        model, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 1))
    )
    assert y.shape == (1, H, W, C)
    np.testing.assert_allclose(np.exp(np.asarray(y)).sum(-1), 1.0, atol=1e-4)


def test_hrnet():
    from mfcnet_tpu.models.hrnet import HRNetW48

    model = HRNetW48(
        num_classes=C,
        channels=(4, 8, 8, 8),
        stage_modules=(1, 1, 1),
        num_blocks=1,
        stage1_width=4,
    )
    y, _ = _run(model, jnp.zeros((1, H, W, 3)))
    assert y.shape == (1, H, W, C)


def test_deeplab():
    from mfcnet_tpu.models.deeplab import DeepLabV3ResNet101

    model = DeepLabV3ResNet101(num_classes=C, layers=(1, 1, 1, 1), width=4)
    y, _ = _run(model, jnp.zeros((1, H, W, 3)))
    assert y.shape == (1, H, W, C)


def test_fcn():
    from mfcnet_tpu.models.fcn import FCNResNet101

    model = FCNResNet101(num_classes=C, layers=(1, 1, 1, 1), width=4)
    y, _ = _run(model, jnp.zeros((1, H, W, 3)))
    assert y.shape == (1, H, W, C)


def test_segformer_logprobs():
    from mfcnet_tpu.models.segformer import SegFormerMiTB3

    model = SegFormerMiTB3(
        num_classes=C,
        decoder_dim=8,
        dims=(8, 8, 8, 8),
        depths=(1, 1, 1, 1),
        heads=(1, 1, 1, 1),
    )
    y, _ = _run(model, jnp.zeros((1, H, W, 3)))
    assert y.shape == (1, H, W, C)
    np.testing.assert_allclose(np.exp(np.asarray(y)).sum(-1), 1.0, atol=1e-4)


def test_registry_builds_all_multiframe_names():
    from mfcnet_tpu.models import get_multiframe_segmentation_model

    for fam in ("TernausNet", "DeepLab", "FCN", "SegFormer", "HRNet",
                "UNet", "ResUNet"):
        for var in ("Basic", "Large"):
            m = get_multiframe_segmentation_model(
                f"{fam}Multi-{var}", num_classes=5, num_input_frames=3
            )
            assert m is not None
    with pytest.raises(ValueError):
        get_multiframe_segmentation_model("Nope-Basic", 5, 3)
