"""Shape tests for legacy/inventoried models + ABN + v1 decode."""

import numpy as np
import jax
import jax.numpy as jnp

from mfcnet_tpu.utils.jitinit import jit_init


def test_paf_model():
    from mfcnet_tpu.models.legacy import PAFDetectionModel

    m = PAFDetectionModel(num_joints=5, num_joint_associations=4, width=8)
    x = jnp.zeros((1, 32, 32, 3))
    v = jit_init(m, jax.random.PRNGKey(0), x)
    joints, assoc = jax.jit(lambda v, x: m.apply(v, x))(v, x)
    assert joints.shape == (1, 32, 32, 5)
    assert assoc.shape == (1, 32, 32, 4)


def test_resnet50_csl():
    from mfcnet_tpu.models.legacy import ResNet50CSL

    m = ResNet50CSL(num_classes=5, num_joints=4, layers=(1, 1, 1, 1),
                    width=8)
    x = jnp.zeros((1, 64, 64, 3))
    v = jit_init(m, jax.random.PRNGKey(0), x)
    seg, loc = jax.jit(lambda v, x: m.apply(v, x))(v, x)
    assert seg.shape == (1, 64, 64, 5)
    assert loc.shape == (1, 64, 64, 4)
    np.testing.assert_allclose(np.asarray(seg).sum(-1), 1.0, atol=1e-4)


def test_kurmann_net():
    from mfcnet_tpu.models.legacy import KurmannEtAl2017Net

    m = KurmannEtAl2017Net(num_classes=3, num_joints=2,
                           dims=(4, 8, 8, 8, 8, 8))
    x = jnp.zeros((2, 32, 32, 3))
    v = jit_init(m, jax.random.PRNGKey(0), x)
    heat, pres = jax.jit(lambda v, x: m.apply(v, x))(v, x)
    assert heat.shape == (2, 32, 32, 6)
    assert pres.shape == (2, 3)


def test_abn():
    from mfcnet_tpu.models.abn import ABN, InPlaceABN, InPlaceABNSync

    assert InPlaceABN is ABN and InPlaceABNSync is ABN
    m = ABN()
    x = jnp.ones((2, 8, 8, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    y, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    assert "batch_stats" in mut


def test_v1_weighted_centroid_decode():
    from mfcnet_tpu.track.errors_v1 import centroid_error_v1

    H, W, C = 64, 64, 5
    probs = np.zeros((H, W, C), np.float32)
    probs[..., 0] = 0.9
    # right tip blob (class 2) and right base blob (class 1)
    probs[10:16, 10:16, 2] = 0.95
    probs[30:40, 10:20, 1] = 0.95
    gt = np.zeros((H, W), np.int64)
    gt[10:16, 10:16] = 2
    gt[30:40, 10:20] = 1
    err_rc, err_rb, err_lc, err_lb, p_gt, p = centroid_error_v1(probs, gt)
    assert err_rc < 2.0 and err_rb < 2.0
    assert np.isnan(err_lc) and np.isnan(err_lb)
    assert p_gt[0] and p[0] and not p_gt[2]


def test_abn_unbiased_running_var_matches_torch():
    """InPlaceABN updates running_var with the count/(count-1) correction
    (reference functions.py:98) — same as torch BatchNorm2d; flax
    nn.BatchNorm does not, hence ABN's own stats handling."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    from mfcnet_tpu.models.abn import ABN

    m = ABN(activation="none")
    x = np.random.default_rng(0).standard_normal((4, 8, 8, 3)).astype(
        np.float32
    )
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y, upd = m.apply(v, jnp.asarray(x), train=True,
                     mutable=["batch_stats"])
    t = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1).train()
    yt = t(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["var"]),
        t.running_var.detach().numpy(), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(y), np.moveaxis(yt.detach().numpy(), 1, -1), atol=1e-5
    )
    # biased variant reproduces flax semantics (flag off)
    mb = ABN(activation="none", unbiased_running_var=False)
    _, updb = mb.apply(v, jnp.asarray(x), train=True,
                       mutable=["batch_stats"])
    axes_var = np.var(x, axis=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(updb["batch_stats"]["var"]),
        0.9 * 1.0 + 0.1 * axes_var, rtol=1e-5,
    )
