"""On-device heatmap smoothing and local-maxima detection.

Mirrors the host-side decode pipeline of the reference
(utils/localization_utils_v2.py:35-40): ``gaussian_filter(heatmap, 4)``
followed by ``maximum_filter(..., footprint=circular_mask(10,10)) == x``.
Numerics are pinned to scipy.ndimage in tests (reflect boundary handling,
even-footprint origin conventions).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage _gaussian_kernel1d: radius = int(truncate*sigma + 0.5)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    phi /= phi.sum()
    return phi.astype(np.float32)


def gaussian_blur(img, sigma: float = 4.0, truncate: float = 4.0):
    """Separable gaussian blur on the last two axes, scipy 'reflect' boundary.

    ``img``: (..., H, W) float array. scipy's 'reflect' mode equals numpy/jnp
    'symmetric' padding (edge sample included).
    """
    k = _gaussian_kernel1d(sigma, truncate)  # numpy — stays host-side
    r = (len(k) - 1) // 2
    H, W = img.shape[-2], img.shape[-1]

    # scipy correlate1d uses the kernel reversed relative to convolution, but
    # the gaussian is symmetric so it does not matter.
    def conv_last(x):
        xp = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 1) + [(r, r)],
            mode="symmetric",
        )
        # matmul formulation: build (W, W + 2r) band matrix once — exact and
        # MXU friendly for the 480x640 heatmaps this runs on.
        band = _band_matrix(x.shape[-1], k)
        return jnp.einsum("...j,wj->...w", xp, jnp.asarray(band), precision="highest")

    out = conv_last(img)  # blur W axis
    out = jnp.swapaxes(conv_last(jnp.swapaxes(out, -1, -2)), -1, -2)
    return out


@functools.lru_cache(maxsize=32)
def _band_matrix_cached(n: int, key: bytes, klen: int) -> np.ndarray:
    k = np.frombuffer(key, dtype=np.float32)
    r = (klen - 1) // 2
    m = np.zeros((n, n + 2 * r), dtype=np.float32)
    for i in range(n):
        m[i, i : i + klen] = k
    return m


def _band_matrix(n: int, k: np.ndarray) -> np.ndarray:
    return _band_matrix_cached(n, k.astype(np.float32).tobytes(), len(k))


@functools.lru_cache(maxsize=4)
def _circular_footprint_offsets(size: int = 10) -> tuple:
    """Offsets (dy, dx) where the reference's circular 10x10 footprint is True.

    create_circular_mask(10, 10) (utils/localization_utils_v2.py:5-13):
    center (5, 5), radius 5, mask = dist <= 5 on a size x size grid. scipy
    maximum_filter with an even-sized footprint spans offsets
    [-(size//2), size - size//2 - 1] in each axis.
    """
    c = size // 2
    offs = []
    for i in range(size):
        for j in range(size):
            if math.sqrt((j - c) ** 2 + (i - c) ** 2) <= c:
                offs.append((i - c, j - c))
    return tuple(offs)


def local_maxima(smoothed, footprint_size: int = 10):
    """``maximum_filter(x, footprint=circular(10,10)) == x`` on (..., H, W).

    Boundary handling matches scipy's default mode='reflect' (symmetric).
    """
    offs = _circular_footprint_offsets(footprint_size)
    r = footprint_size // 2
    pad = [(0, 0)] * (smoothed.ndim - 2) + [(r, r), (r, r)]
    xp = jnp.pad(smoothed, pad, mode="symmetric")
    H, W = smoothed.shape[-2], smoothed.shape[-1]
    mx = None
    for dy, dx in offs:
        win = xp[..., r + dy : r + dy + H, r + dx : r + dx + W]
        mx = win if mx is None else jnp.maximum(mx, win)
    return mx == smoothed
