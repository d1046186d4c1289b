"""Numerics tests pinning ops against torch / scipy references."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

from mfcnet_tpu.ops.resize import resize_bilinear, resize_nearest  # noqa: E402
from mfcnet_tpu.ops.warp import grid_sample_bilinear, flow_warp  # noqa: E402
from mfcnet_tpu.ops.color import (  # noqa: E402
    adjust_brightness,
    adjust_contrast,
    adjust_saturation,
)
from mfcnet_tpu.ops.correlation import (  # noqa: E402
    correlation_mxu,
    correlation_shifts,
)
from mfcnet_tpu.ops.peaks import gaussian_blur, local_maxima  # noqa: E402

RNG = np.random.default_rng(0)


def _nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def _to_nhwc(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw", [((480, 640), (240, 320)), ((17, 23), (31, 11)), ((30, 40), (480, 640))]
)
def test_resize_bilinear_matches_torch(align_corners, in_hw, out_hw):
    x = RNG.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw, align_corners))
    want = _to_nhwc(
        tF.interpolate(
            _nchw(x), size=out_hw, mode="bilinear", align_corners=align_corners
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw", [((480, 640), (240, 320)), ((17, 23), (31, 11)), ((10, 10), (480, 640))]
)
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = RNG.standard_normal((1, *in_hw, 2), dtype=np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), *out_hw))
    want = _to_nhwc(tF.interpolate(_nchw(x), size=out_hw, mode="nearest"))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(align_corners):
    B, H, W, C = 2, 12, 17, 4
    img = RNG.standard_normal((B, H, W, C), dtype=np.float32)
    # grid beyond [-1, 1] to exercise zeros padding
    gx = RNG.uniform(-1.3, 1.3, (B, 9, 11)).astype(np.float32)
    gy = RNG.uniform(-1.3, 1.3, (B, 9, 11)).astype(np.float32)
    got = np.asarray(
        grid_sample_bilinear(
            jnp.asarray(img), jnp.asarray(gx), jnp.asarray(gy), align_corners
        )
    )
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))
    want = _to_nhwc(
        tF.grid_sample(
            _nchw(img),
            grid,
            mode="bilinear",
            padding_mode="zeros",
            align_corners=align_corners,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_flow_warp_reference_grid_quirk():
    """flow_warp(grid_hw=(576,720)) must equal torch grid_sample with the
    reference's cropped mesh grid (models/multiframe_model.py:141-185)."""
    B, H, W = 1, 48, 64
    maps = RNG.standard_normal((B, H, W, 5), dtype=np.float32)
    flow = RNG.uniform(-3, 3, (B, H, W, 2)).astype(np.float32)

    got = np.asarray(
        flow_warp(jnp.asarray(maps), jnp.asarray(flow), grid_hw=(576, 720))
    )

    # torch reference reimplementation of _warp_single_map
    GH, GW = 576, 720
    y, x = np.meshgrid(np.arange(GH), np.arange(GW), indexing="ij")
    grid_y = 2.0 * y / (GH - 1) - 1.0
    grid_x = 2.0 * x / (GW - 1) - 1.0
    base = np.stack([grid_x, grid_y], axis=0)[None].astype(np.float32)
    base = base[:, :, :H, :W]
    fx = flow[..., 0] / ((W - 1) / 2.0)
    fy = flow[..., 1] / ((H - 1) / 2.0)
    new_grid = torch.from_numpy(
        base + np.stack([fx, fy], axis=1)
    ).permute(0, 2, 3, 1)
    want = _to_nhwc(
        tF.grid_sample(
            _nchw(maps),
            new_grid,
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_color_ops_match_torchvision_semantics():
    """Pin against hand-computed torchvision formulas on float tensors."""
    img = RNG.uniform(0, 1, (3, 8, 9, 3)).astype(np.float32)
    x = jnp.asarray(img)

    b = np.asarray(adjust_brightness(x, 1.04))
    np.testing.assert_allclose(b, np.clip(img * 1.04, 0, 1), atol=1e-6)

    gray = (
        0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]
    c = np.asarray(adjust_contrast(x, 0.97))
    want = np.clip(
        0.97 * img + 0.03 * gray.mean(axis=(1, 2), keepdims=True), 0, 1
    )
    np.testing.assert_allclose(c, want, atol=1e-5)

    s = np.asarray(adjust_saturation(x, 1.02))
    want = np.clip(1.02 * img - 0.02 * gray, 0, 1)
    np.testing.assert_allclose(s, want, atol=1e-5)


def test_correlation_impls_agree():
    B, H, W, C = 1, 10, 12, 8
    f1 = RNG.standard_normal((B, H, W, C), dtype=np.float32)
    f2 = RNG.standard_normal((B, H, W, C), dtype=np.float32)
    a = np.asarray(correlation_shifts(jnp.asarray(f1), jnp.asarray(f2), 4, 2))
    b = np.asarray(correlation_mxu(jnp.asarray(f1), jnp.asarray(f2), 4, 2))
    assert a.shape == (B, H, W, 25)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_correlation_matches_reference_semantics():
    """Direct NumPy transcription of the CUDA kernel indexing
    (models/unflow_correlation.py:71-101)."""
    B, H, W, C = 1, 7, 9, 4
    md, s = 4, 2
    D = 2 * (md // s) + 1
    f1 = RNG.standard_normal((B, H, W, C), dtype=np.float32)
    f2 = RNG.standard_normal((B, H, W, C), dtype=np.float32)
    f2p = np.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    want = np.zeros((B, H, W, D * D), dtype=np.float32)
    for tc in range(D * D):
        dx = (tc % D - D // 2) * s
        dy = (tc // D - D // 2) * s
        for yy in range(H):
            for xx in range(W):
                want[0, yy, xx, tc] = (
                    f1[0, yy, xx] * f2p[0, yy + md + dy, xx + md + dx]
                ).sum() / C
    got = np.asarray(correlation_shifts(jnp.asarray(f1), jnp.asarray(f2), md, s))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_gaussian_blur_matches_scipy():
    from scipy import ndimage

    x = RNG.standard_normal((30, 40)).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(x), sigma=4.0))
    want = ndimage.gaussian_filter(x.astype(np.float64), 4).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_local_maxima_matches_scipy():
    from scipy import ndimage

    def circular_mask(h, w):
        center = (w // 2, h // 2)
        radius = min(center[0], center[1], w - center[0], h - center[1])
        Y, X = np.ogrid[:h, :w]
        return np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2) <= radius

    x = RNG.standard_normal((25, 33)).astype(np.float32)
    sm = ndimage.gaussian_filter(x, 4)
    mask = circular_mask(10, 10)
    want = ndimage.maximum_filter(sm, footprint=mask) == sm
    got = np.asarray(local_maxima(jnp.asarray(sm), 10))
    np.testing.assert_array_equal(got, want)


def test_fast_conv_same_parity():
    """Space-to-depth packed conv == plain SAME conv for assorted shapes,
    kernels, and blocks (ops/fastconv.py)."""
    from jax import lax

    from mfcnet_tpu.ops.fastconv import fast_conv_same

    rng = np.random.default_rng(0)
    for (H, W, C, D, k, f) in [
        (64, 64, 3, 8, 3, 2), (37, 53, 7, 9, 5, 2),
        (33, 41, 15, 8, 11, 4), (8, 8, 3, 4, 3, 2), (5, 5, 2, 3, 11, 4),
    ]:
        x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32))
        kern = jnp.asarray(
            rng.standard_normal((k, k, C, D)).astype(np.float32) * 0.1
        )
        b = jnp.asarray(rng.standard_normal(D).astype(np.float32))
        want = lax.conv_general_dilated(
            x, kern, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        got = fast_conv_same(x, kern, b, block=f)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
        )


def test_s2d_helpers_roundtrip_and_indomain_conv():
    from jax import lax

    from mfcnet_tpu.ops.fastconv import (
        conv_s2d_indomain,
        from_s2d,
        mask_s2d_padding,
        s2d_via_conv,
        to_s2d,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 30, 42, 5)).astype(np.float32))
    # roundtrip + one-hot-conv equivalence
    xs = to_s2d(x, 4)
    np.testing.assert_array_equal(
        np.asarray(s2d_via_conv(x, 4)), np.asarray(xs)
    )
    np.testing.assert_allclose(
        np.asarray(from_s2d(xs, 4, 30, 42)), np.asarray(x)
    )
    # in-domain SAME conv == plain SAME conv (with padding mask for the
    # partial trailing blocks)
    kern = jnp.asarray(
        rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.1
    )
    want = lax.conv_general_dilated(
        x, kern, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = from_s2d(
        conv_s2d_indomain(mask_s2d_padding(xs, 4, 30, 42), kern, 4),
        4, 30, 42,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_vgg_stage1_pallas_parity():
    """Fused stage-1 Pallas kernel (interpret mode on CPU) == plain XLA
    convs, incl. the SAME-padding zero ring between the two convs and
    batch > 1 / odd widths / different tile sizes."""
    from mfcnet_tpu.experimental.stage1_pallas import (
        reference_stage1,
        vgg_stage1_pallas,
    )

    rng = np.random.default_rng(0)
    for (H, W, C1, R) in [(32, 48, 16, 8), (16, 24, 16, 4),
                          (64, 40, 8, 16)]:
        x = jnp.asarray(
            rng.standard_normal((2, H, W, 3)).astype(np.float32)
        )
        k1 = jnp.asarray(
            rng.standard_normal((3, 3, 3, C1)).astype(np.float32) * 0.2
        )
        b1 = jnp.asarray(
            rng.standard_normal(C1).astype(np.float32) * 0.1
        )
        k2 = jnp.asarray(
            rng.standard_normal((3, 3, C1, C1)).astype(np.float32) * 0.05
        )
        b2 = jnp.asarray(
            rng.standard_normal(C1).astype(np.float32) * 0.1
        )
        want = reference_stage1(x, k1, b1, k2, b2)
        for variant in ("patches", "taps"):
            got = vgg_stage1_pallas(
                x, k1, b1, k2, b2, tile_rows=R, variant=variant
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
            )


def test_conv3x3_pallas_direct_parity():
    """experimental/conv3x3_pallas (windowed-DMA direct conv, tap-pair
    lane packing — the VERDICT r2 item-9 experiment, kept with its
    documented negative result): bit-parity with lax.conv_general_dilated
    incl. fused bias+ReLU, odd widths, and multi-batch."""
    import jax
    import jax.numpy as jnp

    from mfcnet_tpu.experimental.conv3x3_pallas import conv3x3_pallas

    rng = np.random.default_rng(5)
    for B, H, W, cin, cout, relu in (
        (1, 24, 30, 64, 32, False),
        (2, 16, 17, 8, 8, True),
    ):
        x = jnp.asarray(rng.standard_normal((B, H, W, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.05
        )
        b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
        got = conv3x3_pallas(x, w, bias=b, relu=relu, interpret=True)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        if relu:
            want = jax.nn.relu(want)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )


def test_raft_update_pallas_parity():
    """Fused RAFT update kernel == models/raft.py::UpdateBlock (the
    relayout-bound 12x-per-frame hot loop it replaces), f32 compute, on
    an uneven token count (N % 8 != 0 exercises the pad path)."""
    import jax

    from mfcnet_tpu.models.raft import UpdateBlock
    from mfcnet_tpu.ops.raft_update_pallas import (
        fused_update_step,
        pack_update_weights,
    )

    B, H8, W8, L = 2, 9, 13, 4
    rng = np.random.default_rng(0)
    corr = jnp.asarray(
        rng.standard_normal((B, H8, W8, L * 81)).astype(np.float32)
    )
    inp = jax.nn.relu(jnp.asarray(
        rng.standard_normal((B, H8, W8, 128)).astype(np.float32)))
    net = jnp.tanh(jnp.asarray(
        rng.standard_normal((B, H8, W8, 128)).astype(np.float32)))
    flow = jnp.asarray(
        rng.standard_normal((B, H8, W8, 2)).astype(np.float32))

    ub = UpdateBlock()
    variables = ub.init(jax.random.PRNGKey(3), net, inp, corr, flow)
    want_net, want_delta, _mask = ub.apply(variables, net, inp, corr, flow)

    packed = pack_update_weights(
        variables["params"], compute_dtype=jnp.float32
    )
    got_net, got_delta = fused_update_step(
        variables["params"], packed, corr, inp, net, flow,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_net), np.asarray(want_net), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_delta), np.asarray(want_delta),
        atol=2e-5, rtol=1e-4,
    )


def test_raft_fused_flow_from_features_parity():
    """fused_flow_from_features == model.apply(method='flow_from_
    features') end to end (pyramid + 12 lookups + fused updates + mask
    head + convex upsample), f32 compute."""
    import jax

    from mfcnet_tpu.models.raft import RAFT
    from mfcnet_tpu.ops.raft_update_pallas import (
        fused_flow_from_features,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    model = RAFT(iters=4)
    d = np.zeros((1, 64, 64, 3), np.float32)
    variables = jit_init(model, jax.random.PRNGKey(7), d, d)

    rng = np.random.default_rng(5)
    img1 = jnp.asarray(rng.random((1, 64, 64, 3), np.float32)) * 2 - 1
    img2 = jnp.asarray(rng.random((1, 64, 64, 3), np.float32)) * 2 - 1
    f1 = model.apply(variables, img1, method="features")
    f2 = model.apply(variables, img2, method="features")
    net, inp = model.apply(variables, img1, method="context")

    want = model.apply(
        variables, f1, f2, net, inp, method="flow_from_features"
    )
    got = fused_flow_from_features(
        variables, f1, f2, net, inp, iters=4,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3
    )


def test_banded_warp_matches_gather_paths():
    """grid_sample_bilinear_banded == grid_sample_bilinear whenever the
    flow stays inside the band (identity grid AND the reference's
    cropped 576x720 quirk grid via flow_warp), and falls back EXACTLY
    when any sample leaves the slab."""
    import jax

    from mfcnet_tpu.ops.warp import (
        flow_warp,
        grid_sample_bilinear,
        grid_sample_bilinear_banded,
    )

    rng = np.random.default_rng(17)
    B, H, W, C = 2, 64, 48, 5
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    # bounded random grid around identity (|dy| < 6 px)
    base_x = (2.0 * jnp.arange(W) / (W - 1) - 1.0)[None, None, :]
    base_y = (2.0 * jnp.arange(H) / (H - 1) - 1.0)[None, :, None]
    dx = jnp.asarray(rng.uniform(-9, 9, (B, H, W)), jnp.float32)
    dy = jnp.asarray(rng.uniform(-5.5, 5.5, (B, H, W)), jnp.float32)
    gx = base_x + dx / ((W - 1) / 2.0)
    gy = base_y + dy / ((H - 1) / 2.0)

    want = np.asarray(grid_sample_bilinear(img, gx, gy))
    got = np.asarray(grid_sample_bilinear_banded(
        img, gx, gy, band=16, max_dy=8
    ))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)

    # out-of-image samples are zero through the banded path too
    gy_oob = gy + 3.0  # way below the image for most rows
    want2 = np.asarray(grid_sample_bilinear(img, gx, gy_oob))
    got2 = np.asarray(grid_sample_bilinear_banded(
        img, gx, gy_oob, band=16, max_dy=8
    ))
    np.testing.assert_allclose(got2, want2, atol=2e-6, rtol=1e-6)

    # fallback: one pixel's vertical displacement exceeds max_dy but is
    # inside the image -> the cond must route to the exact gather path
    dy_big = dy.at[0, 30, 20].set(20.0)
    gy_big = base_y + dy_big / ((H - 1) / 2.0)
    want3 = np.asarray(grid_sample_bilinear(img, gx, gy_big))
    got3 = np.asarray(grid_sample_bilinear_banded(
        img, gx, gy_big, band=16, max_dy=8
    ))
    np.testing.assert_allclose(got3, want3, atol=2e-6, rtol=1e-6)

    # flow_warp (reference 576x720 quirk grid): banded path is wired in
    # and matches the plain gather formulation
    flow = jnp.stack([dx, dy], axis=-1)
    want4 = np.asarray(grid_sample_bilinear(
        img,
        (2.0 * jnp.arange(W) / (720 - 1) - 1.0)[None, None, :]
        + flow[..., 0] / ((W - 1) / 2.0),
        (2.0 * jnp.arange(H) / (576 - 1) - 1.0)[None, :, None]
        + flow[..., 1] / ((H - 1) / 2.0),
    ))
    got4 = np.asarray(flow_warp(img, flow, grid_hw=(576, 720)))
    np.testing.assert_allclose(got4, want4, atol=2e-6, rtol=1e-6)


def test_banded_warp_gradients_match_gather():
    """Training differentiates the Basic head's warp: the banded-warp
    custom VJP must match the gather formulation's autodiff for all
    three inputs (maps, and the flow via fx/fy)."""
    import jax

    from mfcnet_tpu.ops.warp import flow_warp, grid_sample_bilinear

    rng = np.random.default_rng(31)
    B, H, W, C = 1, 32, 24, 3
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-4, 4, (B, H, W, 2)), jnp.float32)

    def loss_banded(m, f):
        return jnp.sum(flow_warp(m, f, grid_hw=(576, 720)) ** 2)

    def loss_gather(m, f):
        xs = (2.0 * jnp.arange(W) / (720 - 1) - 1.0)[None, None, :]
        ys = (2.0 * jnp.arange(H) / (576 - 1) - 1.0)[None, :, None]
        gx = xs + f[..., 0] / ((W - 1) / 2.0)
        gy = ys + f[..., 1] / ((H - 1) / 2.0)
        return jnp.sum(grid_sample_bilinear(m, gx, gy) ** 2)

    gm, gf = jax.grad(loss_banded, argnums=(0, 1))(img, flow)
    wm, wf = jax.grad(loss_gather, argnums=(0, 1))(img, flow)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(wm),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(wf),
                               atol=1e-3, rtol=1e-3)
