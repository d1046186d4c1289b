"""One-command REAL-hardware validation of every Pallas TPU kernel.

The pytest suite runs on a virtual CPU mesh (tests/conftest.py forces
``JAX_PLATFORMS=cpu``), so the Pallas kernels are exercised there through
the interpreter only. This tool is the complement: run

    python tools/tpu_smoke.py

on a machine with a TPU attached and it validates the actual Mosaic
lowerings against the XLA formulations and host oracles:

  1. ``ops.cc_pallas.connected_components_pallas`` (4- and 8-conn) vs
     the XLA label-propagation (``track/decode_device.py``) — exact
     label equality on adversarial random masks;
  2. ``ops.cc_pallas.base_stats_pallas`` through
     ``decode_base_device(impl='pallas')`` vs ``impl='xla'`` — the full
     hole-fill + dense-id + MXU one-hot stats path, including the
     >K-components ``lax.cond`` fallback;
  3. ``ops.correlation_pallas.correlation_pallas`` fwd + custom VJP vs
     the XLA shifts formulation (``ops/correlation.py``, itself pinned
     against the reference CUDA indexing in tests/test_ops.py);
  4. ``decode_keypoints_device`` end to end on a synthetic toolpose
     probability map, device (pallas) vs forced-XLA decode.

Prints one PASS/FAIL line per check; exit code 0 iff all pass. Safe to
run on CPU too (the Pallas paths then run interpreted — still a valid
numerics check, just not a Mosaic one).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def _masks(rng, n, H=128, W=192, density=0.03, dilate=2):
    import cv2

    out = []
    for _ in range(n):
        m = rng.random((H, W)) < density
        m = cv2.dilate(
            m.astype(np.uint8), np.ones((3, 3), np.uint8),
            iterations=dilate,
        ).astype(bool)
        out.append(m)
    return np.stack(out)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from mfcnet_tpu.utils.watchdog import device_init_watchdog

    # unreachable-TPU-tunnel guard: fail loudly instead of hanging
    init_done = device_init_watchdog(lambda: print(
        "FAIL: device init timed out after 300s "
        "(TPU tunnel unreachable?)", flush=True,
    ))
    jax.devices()
    init_done()

    from mfcnet_tpu.ops.cc_pallas import connected_components_pallas
    from mfcnet_tpu.ops.correlation import correlation_shifts
    from mfcnet_tpu.ops.correlation_pallas import correlation_pallas
    from mfcnet_tpu.track.decode_device import (
        _connected_components_xla,
        decode_base_device,
        decode_keypoints_device,
    )

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    print(f"backend: {backend} ({jax.devices()[0].device_kind}); "
          f"pallas kernels run {'COMPILED (Mosaic)' if on_tpu else 'interpreted'}")
    rng = np.random.default_rng(0)
    failures = 0

    def check(name, ok, detail=""):
        nonlocal failures
        failures += int(not ok)
        print(f"  [{'PASS' if ok else 'FAIL'}] {name}"
              + (f" — {detail}" if detail else ""))

    # 1. connected components, exact label parity, 4- and 8-conn
    masks = _masks(rng, 6)
    for conn in (4, 8):
        got = np.asarray(
            connected_components_pallas(
                jnp.asarray(masks), connectivity=conn,
                interpret=not on_tpu,
            )
        )
        want = np.asarray(
            _connected_components_xla(jnp.asarray(masks), connectivity=conn)
        )
        check(
            f"connected_components_pallas {conn}-conn",
            np.array_equal(got, want),
            f"{int((got != want).sum())} differing pixels" if not
            np.array_equal(got, want) else f"{masks.shape[0]} masks exact",
        )

    # 2. full base-decode stats path, pallas vs xla (shared ranking tail)
    if on_tpu:
        masks2 = _masks(rng, 8, H=480, W=640)
        dp = np.asarray(
            decode_base_device(jnp.asarray(masks2), 10.0, impl="pallas")
        )
        dx = np.asarray(
            decode_base_device(jnp.asarray(masks2), 10.0, impl="xla")
        )
        check(
            "decode_base_device pallas vs xla (480x640)",
            np.allclose(dp, dx, atol=1e-3),
            f"max |diff| {np.max(np.abs(dp - dx)):.2e}",
        )
        # >K-components fallback: a dot grid with ~1200 components
        grid = np.zeros((480, 640), bool)
        grid[::12, ::16] = True
        df = np.asarray(decode_base_device(jnp.asarray(grid[None]), 0.0,
                                           impl="pallas"))
        dfx = np.asarray(decode_base_device(jnp.asarray(grid[None]), 0.0,
                                            impl="xla"))
        check(
            "decode_base_device >K-components cond fallback",
            np.allclose(df, dfx, atol=1e-3),
            f"max |diff| {np.max(np.abs(df - dfx)):.2e}",
        )
    else:
        print("  [skip] decode_base_device pallas path (needs TPU; the "
              "interpreter case is covered by pytest)")

    # 3. correlation kernel fwd + grad vs XLA shifts formulation
    B, H, W, C = 2, 48, 64, 32
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    md, s = 8, 2
    fwd_p = np.asarray(correlation_pallas(f1, f2, md, s))
    fwd_x = np.asarray(correlation_shifts(f1, f2, md, s))
    check(
        "correlation_pallas forward",
        np.allclose(fwd_p, fwd_x, atol=2e-5),
        f"max |diff| {np.max(np.abs(fwd_p - fwd_x)):.2e}",
    )
    cot = jnp.asarray(rng.standard_normal(fwd_x.shape), jnp.float32)
    loss_p = lambda a, b: jnp.vdot(correlation_pallas(a, b, md, s), cot)
    loss_x = lambda a, b: jnp.vdot(correlation_shifts(a, b, md, s), cot)
    gp = jax.grad(loss_p, argnums=(0, 1))(f1, f2)
    gx = jax.grad(loss_x, argnums=(0, 1))(f1, f2)
    gerr = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(gp, gx)
    )
    check("correlation_pallas custom VJP", gerr <= 2e-4,
          f"max grad |diff| {gerr:.2e}")

    # 4. end-to-end keypoint decode on a synthetic toolpose map
    Hf, Wf, Cc = 480, 640, 5
    probs = np.full((Hf, Wf, Cc), 0.01, np.float32)
    probs[..., 0] = 0.9
    # right base blob + two tip peaks; left side empty
    probs[100:150, 200:280, 1] = 0.95
    probs[110, 240, 2] = 0.99
    probs[130, 260, 2] = 0.98
    probs /= probs.sum(-1, keepdims=True)
    out = np.asarray(decode_keypoints_device(jnp.asarray(probs), 100))
    right = out[1]
    ok = (
        right[2, 2] >= 1.0  # base detected
        and abs(right[2, 0] - 239.5) < 3 and abs(right[2, 1] - 124.5) < 3
        and right[0, 2] == 1.0 and right[1, 2] == 1.0  # both tips
        and out[0, 2, 2] == 0.0  # left base absent
    )
    check("decode_keypoints_device e2e", ok,
          f"right rows {np.round(right, 1).tolist()}")

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
