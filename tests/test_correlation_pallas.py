"""Pallas correlation kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mfcnet_tpu.ops.correlation import correlation_shifts
from mfcnet_tpu.ops.correlation_pallas import correlation_pallas


def test_pallas_forward_matches_reference():
    rng = np.random.default_rng(0)
    B, H, W, C = 1, 6, 8, 16
    md, s = 4, 2
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    want = np.asarray(correlation_shifts(f1, f2, md, s))
    got = np.asarray(correlation_pallas(f1, f2, md, s))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pallas_gradients_match_reference():
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 5, 7, 8
    md, s = 2, 2
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))

    def loss_pallas(a, b):
        return jnp.sum(jnp.sin(correlation_pallas(a, b, md, s)))

    def loss_ref(a, b):
        return jnp.sum(jnp.sin(correlation_shifts(a, b, md, s)))

    g1p, g2p = jax.grad(loss_pallas, argnums=(0, 1))(f1, f2)
    g1r, g2r = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(g1p), np.asarray(g1r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2p), np.asarray(g2r), atol=1e-5)
