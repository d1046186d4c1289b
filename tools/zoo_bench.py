"""Full-scale single-frame inference sweep over every backbone.

Measures forward + log-softmax at 480x640 bf16 batch 1 on the attached
chip, one scalar readback per frame (the axon tunnel needs it; see
NOTES_ROUND1.md). Source of the model-zoo table in docs/PERFORMANCE.md.

Usage: python tools/zoo_bench.py [model ...]
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from mfcnet_tpu.cli.train_toolpose_segmentation import OUTPUT_MODES
from mfcnet_tpu.models import get_tooltip_segmentation_model
from mfcnet_tpu.utils.jitinit import jit_init

H, W, C = 480, 640, 5
MODELS = [
    "TernausNet11", "TernausNet16", "TAPNet11", "TAPNet16",
    "HRNet", "DeepLab_v3", "FCN", "SegFormer", "UNet", "ResUNet",
]


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
    main(sys.argv[1:] or MODELS)
