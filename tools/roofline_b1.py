"""Per-stage roofline rows for the b=1 full-semantics inference config.

VERDICT r4 item 5: the single-window reference-semantics configuration
(T base forwards per frame, batch 1) has missed the 60 fps gate twice;
this tool pins its floor with NUMBERS — per-stage device ms, GFLOP
(XLA's own cost analysis), and achieved TFLOP/s — merged into
BENCH_DETAIL.json as ``roofline_full_b1_*`` rows.

Method: each stage subset (VGG encoder; encoder+decoder = base model;
full step incl. fusion head + log-softmax) is jitted separately at the
b=1 full-mode shapes and timed with a deep in-jit ``lax.scan`` loop
(the established methodology — per-frame dispatch noise and the
tunnel's readback RTT are amortized by the scan length); stage cost =
difference where nested. FLOPs come from ``compiled.cost_analysis()``.

Run on the real chip:  python tools/roofline_b1.py [--frames 40]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40,
                    help="scan length per timed call")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--merge", action="store_true",
                    help="merge rows into BENCH_DETAIL.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mfcnet_tpu.utils.cachedir import machine_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_bench_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.utils.jitinit import cast_floats, jit_init

    T, C, H, W = 3, 5, 480, 640
    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", num_classes=C, num_input_frames=T
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, T, H, W, 3), np.float32)
    )
    cvars = cast_floats(variables, jnp.bfloat16)
    from mfcnet_tpu.utils.flatpack import pack_variables, unpack_variables

    packed, spec = pack_variables(cvars)
    jax.block_until_ready(packed)

    base = model.base  # the TernausNet16 module (shared params subtree)

    def stage_fns(cv):
        enc = base.stage_convs

        def encoder_only(x3):  # (T, H, W, 3) -> final stage feature
            from mfcnet_tpu.models.common import VGGFeatures

            feats = VGGFeatures(enc).apply(
                {"params": cv["params"]["base"]["encoder"]}, x3,
                # VGGFeatures is the encoder submodule itself
            )
            return feats[-1]

        def base_only(x3):  # full base model incl. decoder
            return model.apply(cv, x3, method="base_forward")

        def full_step(frames):  # reference semantics, one window
            logits = model.apply(cv, frames)
            return jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1
            )

        return encoder_only, base_only, full_step

    def timed(fn, x, n, trials):
        @jax.jit
        def loop(x0, *bufs):
            cv = unpack_variables(bufs, spec)
            fns = stage_fns(cv)
            f = {"enc": fns[0], "base": fns[1], "full": fns[2]}[fn._tag]

            def body(c, _):
                # chain the carry into the INPUT: a loop-invariant body
                # gets hoisted out of the scan entirely (measured: the
                # naive version read 543 "TFLOP/s")
                y = f(x0 + c.astype(x0.dtype))
                return jnp.sum(y[..., 0][:1, :1, :1].astype(
                    jnp.float32
                )) * 1e-12, None

            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=n
            )
            return c

        out = loop(x, *packed)
        float(out)
        # FLOPs of ONE iteration: compile the single-call fn
        @jax.jit
        def single(x0, *bufs):
            cv = unpack_variables(bufs, spec)
            fns = stage_fns(cv)
            f = {"enc": fns[0], "base": fns[1], "full": fns[2]}[fn._tag]
            return f(x0)

        try:
            ca = single.lower(x, *packed).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0) or 0.0)
        except Exception:
            flops = 0.0
        best = np.inf
        for _ in range(trials):
            t0 = time.perf_counter()
            out = loop(x, *packed)
            float(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best, flops

    x3 = jnp.zeros((T, H, W, 3), jnp.bfloat16)
    frames = jnp.zeros((1, T, H, W, 3), jnp.bfloat16)

    class Tag:
        def __init__(self, t):
            self._tag = t

    rows = []
    prev_ms = 0.0
    prev_gf = 0.0
    results = {}
    for tag, x, label in (
        ("enc", x3, "vgg16_encoder_x3"),
        ("base", x3, "base_model_x3"),
        ("full", frames, "full_window"),
    ):
        sec, flops = timed(Tag(tag), x, args.frames, args.trials)
        results[tag] = (sec, flops)
        ms = sec * 1e3
        gf = flops / 1e9
        rows.append({
            "metric": f"roofline_full_b1_{label}",
            "value": round(ms, 3),
            "unit": "ms/window (cumulative stage subset)",
            "vs_baseline": round(
                (flops / sec) / 394e12, 4
            ) if sec else 0.0,
            "gflop": round(gf, 1),
            "achieved_tflops": round(flops / sec / 1e12, 1) if sec
            else 0.0,
            "delta_ms": round(ms - prev_ms, 3),
            "delta_gflop": round(gf - prev_gf, 1),
            "delta_tflops": round(
                (flops - prev_gf * 1e9) / ((sec - prev_ms / 1e3) or 1)
                / 1e12, 1
            ),
            "note": "b=1 reference-semantics floor evidence (VERDICT r4 "
                    "item 5): stage device time via deep in-jit scan, "
                    "FLOPs from XLA cost analysis; vs_baseline = MFU "
                    "vs 394 TFLOP/s v5e peak; delta_* = this stage "
                    "minus the previous subset",
        })
        prev_ms, prev_gf = ms, gf
        print(json.dumps(rows[-1]))

    if args.merge:
        out_path = pathlib.Path(__file__).parent.parent / \
            "BENCH_DETAIL.json"
        try:
            old = {r["metric"]: r for r in json.loads(
                out_path.read_text()
            )}
        except Exception:
            old = {}
        stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        for r in rows:
            r["recorded"] = stamp
            old[r["metric"]] = r
        out_path.write_text(json.dumps(list(old.values()), indent=1))


if __name__ == "__main__":
    main()
