"""Per-stage breakdown of one RAFT GRU iteration at tracker resolution.

The flow-conditioned e2e path is floored by 12 recurrent iterations at
30x40 (240x320 input / 8) measured at ~0.88 ms each (docs/PERFORMANCE.md)
— far above their FLOP time. This probe times each sub-stage of an
iteration in isolation (lax.scan inside ONE jit, minus a same-shape
elementwise control) to locate the overhead before attacking it with a
fused Pallas kernel.

Usage: python tools/raft_iter_probe.py [--b 2] [--height 240] [--width 320]
"""

import argparse
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


def timed_scan(fn, carry, iters, trials=5, inner=96):
    """Best time of `inner` scan steps of fn inside one jit (ms/step)."""

    @jax.jit
    def run(c):
        def body(c, _):
            return fn(c), None

        c, _ = jax.lax.scan(body, c, None, length=inner)
        return c

    out = run(carry)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0].astype(jnp.float32))
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        out = run(carry)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from mfcnet_tpu.models.raft import RAFT, build_corr_pyramid, lookup_corr
    from mfcnet_tpu.utils.jitinit import cast_floats, jit_init

    B, H, W = args.b, args.height, args.width
    H8, W8 = H // 8, W // 8
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    model = RAFT(iters=12)
    rng = jax.random.PRNGKey(0)
    img = np.zeros((B, H, W, 3), np.float32)
    variables = cast_floats(jit_init(model, rng, img, img), dt)

    k = jax.random.PRNGKey(1)
    f1 = jax.random.normal(k, (B, H8, W8, 256), dt)
    f2 = jax.random.normal(jax.random.fold_in(k, 1),
                           (B, H8, W8, 256), dt)
    net0 = jnp.tanh(jax.random.normal(
        jax.random.fold_in(k, 2), (B, H8, W8, 128), dt))
    inp = jax.nn.relu(jax.random.normal(
        jax.random.fold_in(k, 3), (B, H8, W8, 128), dt))
    pyramid = jax.jit(build_corr_pyramid)(f1, f2)
    pyramid = [p.astype(dt) for p in pyramid]
    jax.block_until_ready(pyramid)
    corr0 = jnp.zeros((B, H8, W8, sum(81 for _ in pyramid)), dt)
    flow0 = jnp.zeros((B, H8, W8, 2), dt)

    def apply(method, *a):
        return model.apply(variables, *a, method=method)

    rows = []

    # control: same-shape elementwise loop = harness/scan floor
    rows.append(("elementwise control (net*1.0001)", timed_scan(
        lambda c: c * 1.0001, net0, 12)))

    # lookup only: flow evolves by a tiny function of the lookup
    def look_step(c):
        flow = c
        corr = lookup_corr(pyramid, flow + 0.0, 4)
        return (flow + 1e-6 * corr[..., :2]).astype(dt)

    rows.append(("lookup_corr (4 levels, 9x9)", timed_scan(
        look_step, flow0, 12)))

    # submodule param subtrees (setup name 'update_block'; inner names
    # 'encoder'/'gru'/flow1..mask2 — models/raft.py:194-208)
    from mfcnet_tpu.models.raft import MotionEncoder, SepConvGRU

    ub = variables["params"]["update_block"]

    # motion encoder only
    enc_vars = {"params": ub["encoder"]}

    def enc_step(c):
        corr, flow = c
        m = MotionEncoder().apply(enc_vars, flow, corr)
        return ((corr + 1e-6 * m[..., :1]).astype(dt),
                (flow + 1e-6 * m[..., :2]).astype(dt))

    rows.append(("motion encoder (5 convs)", timed_scan(
        enc_step, (corr0, flow0), 12)))

    # GRU only
    gru_vars = {"params": ub["gru"]}
    x0 = jnp.concatenate([inp, jax.random.normal(
        jax.random.fold_in(k, 4), (B, H8, W8, 128), dt)], axis=-1)

    def gru_step(c):
        return SepConvGRU().apply(gru_vars, c, x0)

    rows.append(("SepConvGRU (6 sep convs)", timed_scan(
        gru_step, net0, 12)))

    # flow head only (flow1 3x3 128->256, flow2 3x3 256->2)
    from flax import linen as fnn

    class _FlowHead(fnn.Module):
        @fnn.compact
        def __call__(self, net):
            f = fnn.relu(fnn.Conv(256, (3, 3), padding="SAME",
                                  name="flow1")(net))
            return fnn.Conv(2, (3, 3), padding="SAME", name="flow2")(f)

    head_vars = {"params": {"flow1": ub["flow1"], "flow2": ub["flow2"]}}

    def head_step(c):
        d = _FlowHead().apply(head_vars, c)
        return (c + 1e-6 * jnp.pad(d, ((0, 0),) * 3 + ((0, 126),))).astype(dt)

    rows.append(("flow head (2 convs)", timed_scan(
        head_step, net0, 12)))

    # full iteration (reference semantics; mask head DCE'd as in the
    # model's unrolled loop)
    def full_step(c):
        net, flow = c
        corr = lookup_corr(pyramid, flow.astype(jnp.float32), 4)
        net, delta, _mask = model.apply(
            variables, net, inp, corr.astype(dt), flow,
            method=lambda s, *a: s.update_block(*a),
        )
        return net.astype(dt), (flow + delta).astype(dt)

    rows.append(("full iteration (lookup+update)", timed_scan(
        full_step, (net0, flow0), 12)))

    print(f"\nRAFT iteration breakdown  B={B} {H}x{W} (1/8: {H8}x{W8}) "
          f"{args.dtype}")
    for name, ms in rows:
        print(f"  {name:40s} {ms:8.3f} ms/iter")




def probe_fused(args=None):
    """Fused Pallas update: per-iteration time, f32 and bf16 compute."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--dtype", default="both",
                    choices=["both", "float32", "bfloat16"])
    a = ap.parse_args(args)

    from mfcnet_tpu.models.raft import RAFT, build_corr_pyramid, lookup_corr
    from mfcnet_tpu.ops.raft_update_pallas import (
        fused_update_step, pack_update_weights,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    B, H, W = a.b, a.height, a.width
    H8, W8 = H // 8, W // 8
    model = RAFT(iters=12)
    img = np.zeros((B, H, W, 3), np.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), img, img)

    k = jax.random.PRNGKey(1)
    f1 = jax.random.normal(k, (B, H8, W8, 256), jnp.float32)
    f2 = jax.random.normal(jax.random.fold_in(k, 1),
                           (B, H8, W8, 256), jnp.float32)
    net0 = jnp.tanh(jax.random.normal(
        jax.random.fold_in(k, 2), (B, H8, W8, 128), jnp.float32))
    inp = jax.nn.relu(jax.random.normal(
        jax.random.fold_in(k, 3), (B, H8, W8, 128), jnp.float32))
    pyramid = jax.jit(build_corr_pyramid)(f1, f2)
    jax.block_until_ready(pyramid)
    flow0 = jnp.zeros((B, H8, W8, 2), jnp.float32)

    print(f"\nfused Pallas update  B={B} {H}x{W} (1/8: {H8}x{W8})")
    modes = [("bfloat16", jnp.bfloat16), ("float32", jnp.float32)]
    modes = [m for m in modes if a.dtype in ("both", m[0])]
    for name, cdt in modes:
        packed = pack_update_weights(
            variables["params"]["update_block"], cdt
        )

        ub = variables["params"]["update_block"]

        def upd_step(c, packed=packed, cdt=cdt, ub=ub):
            net, flow = c
            net, delta = fused_update_step(
                ub, packed,
                jnp.zeros((B, H8, W8, 324), jnp.float32) + flow[..., :1],
                inp, net, flow, compute_dtype=cdt,
            )
            return net, flow + delta

        try:
            ms = timed_scan(upd_step, (net0, flow0), 12)
            print(f"  update only ({name})                    "
                  f"{ms:8.3f} ms/iter")
        except Exception as e:
            print(f"  update only ({name}) FAILED: {str(e)[:100]}")
            continue

        def full_step(c, packed=packed, cdt=cdt, ub=ub):
            net, flow = c
            corr = lookup_corr(pyramid, flow, 4)
            net, delta = fused_update_step(
                ub, packed, corr, inp, net, flow, compute_dtype=cdt,
            )
            return net, flow + delta

        try:
            ms = timed_scan(full_step, (net0, flow0), 12)
            print(f"  lookup + fused update ({name})          "
                  f"{ms:8.3f} ms/iter")
        except Exception as e:
            print(f"  lookup + fused update ({name}) FAILED: "
                  f"{str(e)[:100]}")


if __name__ == "__main__":
    import sys as _sys

    if "--fused" in _sys.argv:
        _sys.argv.remove("--fused")
        probe_fused(_sys.argv[1:])
    else:
        main()
