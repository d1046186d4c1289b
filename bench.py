"""Benchmark: 3-frame 480x640 MFCNet video inference, frames/sec/chip.

Measures the flagship video-tracking inference pipeline
(TernausNetMulti-Basic: TernausNet16 per-frame base + MFCNet fusion head) in
the incremental rolling-window mode a video tracker actually runs: each new
frame costs ONE base-model forward (prior frames' class maps come from the
ring buffer) plus one fusion-head forward — the TPU-first redesign of
scripts/test_multiframe_segmentation_on_videos_v3.py:251-281, which
recomputes all 3 base forwards per frame.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = fps / 60 (BASELINE.json north-star: >=60 fps/chip on v5e).
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--frames", type=int, default=200,
                    help="timed frames per trial")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--mode", default="incremental",
                    choices=["incremental", "full"],
                    help="incremental: 1 base fwd/frame (tracker mode); "
                         "full: T base fwds/frame (reference semantics)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.utils.jitinit import jit_init

    T, C, H, W = 3, 5, args.height, args.width
    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", num_classes=C, num_input_frames=T
    )
    frames0 = np.zeros((1, T, H, W, 3), np.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), frames0)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cvars = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        variables,
    )

    if args.mode == "incremental":
        # ring buffer of per-frame class maps; one base fwd per new frame
        @jax.jit
        def step(seg_buf, new_frame):
            seg_new = model.apply(
                cvars, new_frame, method="base_forward"
            )  # (1, H, W, C)
            seg_buf = jnp.concatenate(
                [seg_new[:, None], seg_buf[:, :-1]], axis=1
            )  # newest first
            logits = model.apply(
                cvars, seg_buf, method="fuse_precomputed"
            )
            out = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return seg_buf, out

        seg_buf = jnp.zeros((1, T, H, W, C), dtype)
        frame = jnp.zeros((1, H, W, 3), dtype)
        seg_buf, out = step(seg_buf, frame)  # compile
        out.block_until_ready()

        def run(n):
            nonlocal seg_buf
            t0 = time.perf_counter()
            for _ in range(n):
                seg_buf, out = step(seg_buf, frame)
            out.block_until_ready()
            return time.perf_counter() - t0
    else:
        @jax.jit
        def step(frames):
            logits = model.apply(cvars, frames)
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        frames = jnp.zeros((1, T, H, W, 3), dtype)
        out = step(frames)
        out.block_until_ready()

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = step(frames)
            out.block_until_ready()
            return time.perf_counter() - t0

    run(10)  # warmup
    best = min(run(args.frames) for _ in range(args.trials))
    fps = args.frames / best
    print(json.dumps({
        "metric": f"mfcnet_3frame_{H}x{W}_inference_{args.mode}_{args.dtype}",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
