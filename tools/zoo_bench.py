"""Full-scale single-frame inference sweep over every backbone.

Measures forward + log-softmax at 480x640 bf16 batch 1 on the attached
chip, one scalar readback per frame (the axon tunnel needs it; see
NOTES_ROUND1.md). Source of the model-zoo table in docs/PERFORMANCE.md.

Usage: python tools/zoo_bench.py [model ...]
       python tools/zoo_bench.py --flow [RAFT UnFlow FlowFormerPlusPlus]

--flow sweeps the frozen optical-flow providers instead (one image-pair
forward, the unit the engine/tracker dispatches T-1 of per frame —
src/engine.py:39-53): RAFT and FlowFormer++ at 480x640 and at the video
tracker's half resolution 240x320 (test_..._on_videos_v3.py:264-271);
UnFlow at its reference working resolution 384x1280
(generate_opticalflow_unflow.py:27).
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

from mfcnet_tpu.cli.train_toolpose_segmentation import OUTPUT_MODES
from mfcnet_tpu.models import get_tooltip_segmentation_model
from mfcnet_tpu.utils.jitinit import jit_init

H, W, C = 480, 640, 5
MODELS = [
    "TernausNet11", "TernausNet16", "TAPNet11", "TAPNet16",
    "HRNet", "DeepLab_v3", "FCN", "SegFormer", "UNet", "ResUNet",
]


FLOW_MODELS = ["RAFT", "UnFlow", "FlowFormerPlusPlus"]
FLOW_SIZES = {
    "RAFT": [(480, 640), (240, 320)],
    "FlowFormerPlusPlus": [(480, 640), (240, 320)],
    "UnFlow": [(384, 1280)],
}


def _build_flow(name):
    if name == "RAFT":
        from mfcnet_tpu.models.raft import RAFT

        return RAFT(iters=12)
    if name == "UnFlow":
        from mfcnet_tpu.models.unflow import UnFlow

        return UnFlow()
    from mfcnet_tpu.models.flowformerpp import FlowFormerPP

    return FlowFormerPP(iters=12)


def main_flow(names):
    for name in names:
        for H, W in FLOW_SIZES[name]:
            try:
                model = _build_flow(name)
                a0 = np.zeros((1, H, W, 3), np.float32)
                variables = jit_init(
                    model, jax.random.PRNGKey(0), a0, a0
                )
                cvars = jax.tree.map(
                    lambda v: v.astype(jnp.bfloat16)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v,
                    variables,
                )
                x = jnp.zeros((1, H, W, 3), jnp.bfloat16)
                f = jax.jit(lambda a, b: model.apply(
                    cvars, a, b
                ).astype(jnp.float32).sum())
                float(f(x, x))  # compile
                n = 30
                t0 = time.perf_counter()
                for _ in range(n):
                    v = f(x, x)
                float(v)
                dt = (time.perf_counter() - t0) / n
                print(f"{name:20s} {H}x{W:5d} {1.0 / dt:7.1f} pairs/s  "
                      f"({dt * 1e3:.2f} ms/pair)")
            except Exception as e:
                print(f"{name:20s} {H}x{W:5d} FAILED: {str(e)[:160]}")


def main(names):
    for name in names:
        try:
            model = get_tooltip_segmentation_model(name, C)
            x0 = np.zeros((1, H, W, 3), np.float32)
            tapnet = name.startswith("TAPNet")
            if tapnet:
                a0 = np.zeros((1, H, W, 1), np.float32)
                variables = jit_init(model, jax.random.PRNGKey(0), x0, a0)
            else:
                variables = jit_init(model, jax.random.PRNGKey(0), x0)
            cvars = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16)
                if jnp.issubdtype(v.dtype, jnp.floating) else v,
                variables,
            )
            x = jnp.zeros((1, H, W, 3), jnp.bfloat16)
            # models with 'logits' output get the log_softmax the train
            # CLI applies, so every row measures forward + log-softmax
            logits_out = OUTPUT_MODES.get(name) == "logits"

            def post(y):
                y = y.astype(jnp.float32)
                if logits_out:
                    y = jax.nn.log_softmax(y, axis=-1)
                return y.sum()

            if tapnet:
                a = jnp.zeros((1, H, W, 1), jnp.bfloat16)
                f = jax.jit(lambda x, a: post(model.apply(cvars, x, a)))
                args = (x, a)
            else:
                f = jax.jit(lambda x: post(model.apply(cvars, x)))
                args = (x,)
            float(f(*args))  # compile
            n = 60
            t0 = time.perf_counter()
            for _ in range(n):
                v = f(*args)
            float(v)
            dt = (time.perf_counter() - t0) / n
            print(f"{name:14s} {1.0 / dt:7.1f} fps  "
                  f"({dt * 1e3:.2f} ms/frame)")
        except Exception as e:
            print(f"{name:14s} FAILED: {str(e)[:160]}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--flow":
        main_flow(argv[1:] or FLOW_MODELS)
    else:
        main(argv or MODELS)
