"""Microbench: full-res flow-warp gather variants (ops/warp.py:71).

The e2e flow profile shows ONE take_along_axis gather of
bf16[2, 481*641, 20] with 614400 indices costing 7.1 ms/frame — 86M
indices/s, far under both the HBM bandwidth and any plausible index-rate
ceiling. Hypothesis: the 20-channel (40 B) gather rows are far smaller
than a (·,128)-lane tile, putting XLA's gather lowering on a slow
per-element path. This probe measures the same gather with the table's
channel dim padded to tile-friendly widths, plus dtype variants.

Usage: python tools/warp_probe.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from mfcnet_tpu.utils.cachedir import machine_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_bench_cache")
)


def timeit(fn, *args, n=30, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    B, H, W, C4 = 2, 480, 640, 20
    Hp, Wp = H + 1, W + 1
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, Hp * Wp, (B, H * W, 1)), jnp.int32
    )

    for lanes in (20, 32, 64, 128):
        for dt in (jnp.bfloat16, jnp.float32):
            tbl = jnp.asarray(
                rng.standard_normal((B, Hp * Wp, lanes)), dt
            )

            @jax.jit
            def g(tbl, idx):
                return jnp.take_along_axis(
                    tbl, idx, axis=1
                )

            ms = timeit(g, tbl, idx)
            rate = B * H * W / (ms * 1e-3) / 1e6
            print(f"take_along lanes={lanes:4d} {jnp.dtype(dt).name:9s}"
                  f" {ms:7.3f} ms  ({rate:6.0f} M idx/s)")

    # variant: gather through one flat dim (indices pre-offset by batch)
    tbl = jnp.asarray(
        rng.standard_normal((B * Hp * Wp, 64)), jnp.bfloat16
    )
    flat_idx = jnp.asarray(
        rng.integers(0, B * Hp * Wp, (B * H * W,)), jnp.int32
    )

    @jax.jit
    def g2(tbl, fi):
        return jnp.take(tbl, fi, axis=0)

    ms = timeit(g2, tbl, flat_idx)
    print(f"flat take    lanes=  64 bfloat16  {ms:7.3f} ms  "
          f"({B * H * W / (ms * 1e-3) / 1e6:6.0f} M idx/s)")

    # variant: one-hot matmul over a row BAND (for reference: what a
    # bounded-flow band formulation would cost) — skipped; gather first.


if __name__ == "__main__" and "--banded" not in sys.argv:
    main()


def probe_banded():
    """Banded warp vs gather warp at full tracking scale."""
    from mfcnet_tpu.ops.warp import flow_warp

    B, H, W, C = 2, 480, 640, 5
    rng = np.random.default_rng(1)
    maps = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    flow = jnp.asarray(
        rng.uniform(-12, 12, (B, H, W, 2)), jnp.float32
    )

    @jax.jit
    def banded(m, f):
        return flow_warp(m, f, grid_hw=(576, 720))

    from mfcnet_tpu.ops import warp as W_

    @jax.jit
    def gather(m, f):
        import numpy as _np

        B_, H_, Wd, _ = m.shape
        gh, gw = 576, 720
        xs = 2.0 * jnp.arange(Wd, dtype=jnp.float32) / (gw - 1) - 1.0
        ys = 2.0 * jnp.arange(H_, dtype=jnp.float32) / (gh - 1) - 1.0
        gx = xs[None, None, :] + f[..., 0] / ((Wd - 1) / 2.0)
        gy = ys[None, :, None] + f[..., 1] / ((H_ - 1) / 2.0)
        return W_.grid_sample_bilinear(m, gx, gy)

    for name, fn in (("banded", banded), ("gather", gather)):
        ms = timeit(fn, maps, flow, n=30)
        print(f"flow_warp {name:8s} {ms:7.3f} ms")
    a = np.asarray(banded(maps, flow), np.float32)
    b = np.asarray(gather(maps, flow), np.float32)
    print("max |diff| vs gather:", np.abs(a - b).max())


if __name__ == "__main__" and "--banded" in sys.argv:
    probe_banded()
