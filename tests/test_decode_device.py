"""On-device decode vs host OpenCV/scipy decode on well-separated blobs."""

import numpy as np
import jax.numpy as jnp

from mfcnet_tpu.track.decode import (
    calc_base_centroid,
    create_circular_mask,
    determine_local_maxima_and_estimate_centroids,
)
from mfcnet_tpu.track.decode_device import (
    decode_base_device,
    decode_tips_device,
)


def _gaussian_blob(H, W, cy, cx, sigma=3.0, amp=1.0):
    y, x = np.mgrid[:H, :W]
    return amp * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * sigma**2))


def test_device_tips_match_host_on_two_blobs():
    H, W = 64, 80
    heat = (
        _gaussian_blob(H, W, 20, 25, amp=1.0)
        + _gaussian_blob(H, W, 44, 60, amp=0.8)
    ).astype(np.float32)
    blob = heat > 0.3

    fmask = create_circular_mask(10, 10).astype(np.float64)
    hx, hy = determine_local_maxima_and_estimate_centroids(
        heat.copy(), blob, fmask
    )
    dev = np.asarray(decode_tips_device(jnp.asarray(heat), jnp.asarray(blob)))
    got = sorted(
        [(x, y) for x, y, v in dev if v > 0],
        key=lambda p: p[0],
    )
    want = sorted(zip(hx, hy), key=lambda p: p[0])
    assert len(got) == len(want) == 2
    for (gx, gy), (wx, wy) in zip(got, want):
        assert abs(gx - wx) <= 1.5 and abs(gy - wy) <= 1.5


def test_device_base_matches_host_single_blob():
    H, W = 48, 48
    mask = np.zeros((H, W), bool)
    mask[10:20, 14:30] = True  # one rectangle blob
    bx, by = calc_base_centroid(255 * mask.astype(np.uint8), 10.0)
    dev = np.asarray(decode_base_device(jnp.asarray(mask), 10.0))
    assert dev[2] == 1.0
    assert abs(dev[0] - bx[0]) <= 1.0 and abs(dev[1] - by[0]) <= 1.0


def test_device_base_gated_by_area():
    mask = np.zeros((32, 32), bool)
    mask[5, 5] = True  # 1 px < threshold
    dev = np.asarray(decode_base_device(jnp.asarray(mask), 10.0))
    assert dev[2] == 0.0


def test_device_tips_empty_blob_invalid():
    heat = np.zeros((32, 32), np.float32)
    blob = np.zeros((32, 32), bool)
    dev = np.asarray(decode_tips_device(jnp.asarray(heat), jnp.asarray(blob)))
    assert np.all(dev[:, 2] == 0.0)
