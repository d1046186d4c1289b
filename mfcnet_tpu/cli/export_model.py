"""Export a trained model as a self-contained StableHLO serving artifact.

No reference analogue (the reference deploys by running the training repo's
Python scripts on a CUDA machine) — this is the TPU/XLA-native deployment
path: one ``jax.export`` artifact with weights baked in, loadable on any
machine/version in the StableHLO compatibility window via
``mfcnet_tpu.serve.load_exported`` without the model code or checkpoint.

Example:
    python -m mfcnet_tpu.cli.export_model \
        --model_type TernausNetMulti-Basic --num_input_frames 3 \
        --input_height 480 --input_width 640 \
        --load_wts_model expts/mfc/ckpts/model_020.msgpack \
        --output expts/mfc/serve/mfcnet.stablehlo --validate true
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        description="Export a serving artifact (jax.export StableHLO)"
    )
    p.add_argument("--task", type=str, default="multiframe",
                   choices=["multiframe", "singleframe"],
                   help="'singleframe': export a per-frame segmentation "
                        "model (e.g. TernausNet16, HRNet); TAPNet is not "
                        "exportable (host attmap pipeline)")
    p.add_argument("--model_type", type=str,
                   default="TernausNetMulti-Basic")
    p.add_argument("--num_classes", type=int, default=5)
    p.add_argument("--num_input_frames", type=int, default=3)
    p.add_argument("--input_height", type=int, default=480)
    p.add_argument("--input_width", type=int, default=640)
    p.add_argument("--model_scale", type=float, default=1.0)
    p.add_argument("--load_wts_model", type=str, required=True,
                   help="Trained checkpoint (msgpack) to export")
    p.add_argument("--use_ema",
                   type=lambda v: v.lower() in ("true", "1"), default=False,
                   help="export the checkpoint's EMA weights (training "
                        "with --ema_decay stores them as ema_params)")
    p.add_argument("--add_depth_inputs",
                   type=lambda v: v.lower() in ("true", "1"), default=False)
    p.add_argument("--add_optflow_inputs",
                   type=lambda v: v.lower() in ("true", "1"), default=False,
                   help="Bake the frozen RAFT flow provider into the "
                        "exported graph (reference v3:264-271 semantics)")
    p.add_argument("--load_wts_flow_model", type=str, default=None)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--serving_mode", type=str, default="full",
                   choices=["full", "incremental"],
                   help="'full': stateless window forward (T frames -> "
                        "probs). 'incremental': the product tracking "
                        "step — explicit ring-buffer state, ONE base "
                        "forward per frame (start streams from "
                        "serve.zero_state; incompatible with "
                        "--add_optflow_inputs)")
    p.add_argument("--batch", type=str, default="dynamic",
                   help="'dynamic' (symbolic batch dim — one artifact, any "
                        "batch size) or a fixed integer")
    p.add_argument("--platforms", type=str, default=None,
                   help="Comma list, e.g. 'tpu,cpu' (default: try both, "
                        "fall back to the current platform)")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--validate",
                   type=lambda v: v.lower() in ("true", "1"), default=True,
                   help="Reload the artifact and cross-check numerics "
                        "against the live model on random frames")
    return p


def main(argv=None):
    import jax

    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.serve import (
        export_incremental, export_serving, export_singleframe,
        load_exported, make_incremental_step, make_serving_fn,
        make_singleframe_serving_fn, save_exported, zero_state,
    )
    from mfcnet_tpu.utils.checkpoint import load_checkpoint, load_params
    from mfcnet_tpu.utils.jitinit import jit_init

    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    log = logging.getLogger("export_model")

    T, H, W = args.num_input_frames, args.input_height, args.input_width
    if args.task == "singleframe":
        if args.add_depth_inputs or args.add_optflow_inputs:
            raise SystemExit(
                "--task singleframe has no depth/flow inputs"
            )
        if args.serving_mode != "full":
            raise SystemExit(
                "--task singleframe is stateless (--serving_mode full)"
            )
        from mfcnet_tpu.cli.train_toolpose_segmentation import OUTPUT_MODES
        from mfcnet_tpu.models import get_tooltip_segmentation_model

        output_mode = OUTPUT_MODES[args.model_type]
        if output_mode == "tapnet":
            raise SystemExit(
                "TAPNet is not exportable: its motion-prior attention-map "
                "input comes from the host warp pipeline (data/attmap.py)"
            )
        model = get_tooltip_segmentation_model(
            args.model_type, args.num_classes, scale=args.model_scale
        )
        variables = jit_init(
            model, jax.random.PRNGKey(0),
            np.zeros((1, H, W, 3), np.float32),
        )
    else:
        output_mode = None
        model = get_multiframe_segmentation_model(
            args.model_type,
            num_classes=args.num_classes,
            num_input_frames=T,
            add_depth_inputs=args.add_depth_inputs,
            scale=args.model_scale,
        )
        init_kwargs = {}
        if args.add_depth_inputs:
            init_kwargs["depth"] = np.zeros((1, T, H, W, 1), np.float32)
        variables = jit_init(
            model, jax.random.PRNGKey(0),
            np.zeros((1, T, H, W, 3), np.float32), **init_kwargs,
        )
    payload, epoch = load_checkpoint(args.load_wts_model)
    from flax import serialization

    from mfcnet_tpu.utils.checkpoint import params_from_payload

    try:
        params_src = params_from_payload(payload, args.use_ema)
    except ValueError as e:
        raise SystemExit(f"{args.load_wts_model}: {e}")
    variables = {
        "params": serialization.from_state_dict(
            variables["params"], params_src
        ),
        "batch_stats": serialization.from_state_dict(
            variables.get("batch_stats", {}), payload["batch_stats"]
        ),
    }
    log.info(
        "Loaded %s (epoch %s%s)", args.load_wts_model, epoch,
        ", EMA weights" if args.use_ema else "",
    )

    flow_model = flow_variables = None
    if args.add_optflow_inputs:
        from mfcnet_tpu.models.raft import RAFT

        flow_model = RAFT(iters=12)
        flow_variables = jit_init(
            flow_model, jax.random.PRNGKey(1),
            np.zeros((1, H // 2, W // 2, 3), np.float32),
            np.zeros((1, H // 2, W // 2, 3), np.float32),
        )
        if args.load_wts_flow_model:
            flow_variables = {"params": load_params(
                args.load_wts_flow_model,
                template=flow_variables["params"],
            )}

    batch = None if args.batch == "dynamic" else int(args.batch)
    platforms = args.platforms.split(",") if args.platforms else None
    meta = {
        "task": args.task,
        "model_type": args.model_type,
        "num_classes": args.num_classes,
        "num_input_frames": 1 if args.task == "singleframe" else T,
        "input_height": H,
        "input_width": W,
        "compute_dtype": args.compute_dtype,
        "add_depth_inputs": args.add_depth_inputs,
        "add_optflow_inputs": args.add_optflow_inputs,
        "serving_mode": args.serving_mode,
        "checkpoint": str(args.load_wts_model),
        "epoch": int(epoch),
        "ema": bool(args.use_ema),
    }
    if args.task == "singleframe":
        exported = export_singleframe(
            model, variables, height=H, width=W,
            output_mode=output_mode, dtype=args.compute_dtype,
            batch=batch, platforms=platforms,
        )
        meta["output_mode"] = output_mode
    elif args.serving_mode == "incremental":
        if args.add_optflow_inputs:
            raise SystemExit(
                "--serving_mode incremental does not support in-graph "
                "flow (use --serving_mode full)"
            )
        exported, state_spec = export_incremental(
            model, variables,
            height=H, width=W, num_frames=T,
            num_classes=args.num_classes, dtype=args.compute_dtype,
            add_depth_inputs=args.add_depth_inputs,
            batch=batch, platforms=platforms,
        )
        meta["state"] = {
            k: [list(shape), dt] for k, (shape, dt) in state_spec.items()
        }
    else:
        exported = export_serving(
            model, variables,
            height=H, width=W, num_frames=T, dtype=args.compute_dtype,
            add_depth_inputs=args.add_depth_inputs,
            flow_model=flow_model, flow_variables=flow_variables,
            batch=batch, platforms=platforms,
        )
    header = save_exported(args.output, exported, meta=meta)
    size = Path(args.output).stat().st_size
    log.info(
        "Wrote %s (%.1f MB, platforms=%s, in=%s)",
        args.output, size / 1e6, header["platforms"], header["in_avals"],
    )

    if args.validate:
        loaded = load_exported(args.output)
        rng = np.random.default_rng(0)
        B = 1 if batch is None else batch  # fixed-batch artifacts only
        # accept inputs of exactly that batch size
        if args.task == "singleframe":
            frame = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
            live_fn = jax.jit(make_singleframe_serving_fn(
                model, variables, output_mode, dtype=args.compute_dtype,
            ))
            diff = float(np.max(np.abs(
                np.asarray(loaded(frame)) - np.asarray(live_fn(frame))
            )))
        elif args.serving_mode == "incremental":
            live_step, _ = make_incremental_step(
                model, variables, height=H, width=W, num_frames=T,
                num_classes=args.num_classes, dtype=args.compute_dtype,
                add_depth_inputs=args.add_depth_inputs,
            )
            live_step = jax.jit(live_step)
            state_a = zero_state(loaded.meta, batch=B)
            state_l = list(state_a)
            diff = 0.0
            for _ in range(T + 1):  # past warmup
                frame = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
                inp = [frame]
                if args.add_depth_inputs:
                    inp.append(
                        rng.integers(0, 256, (B, H, W), dtype=np.uint8)
                    )
                *state_a, got = loaded(*state_a, *inp)
                out = live_step(*state_l, *inp)
                state_l, want = list(out[:-1]), out[-1]
                diff = max(diff, float(np.max(np.abs(
                    np.asarray(got) - np.asarray(want)
                ))))
        else:
            frames = rng.integers(0, 256, (B, T, H, W, 3), dtype=np.uint8)
            inputs = [frames]
            if args.add_depth_inputs:
                inputs.append(
                    rng.integers(0, 256, (B, T, H, W), dtype=np.uint8)
                )
            live_fn = jax.jit(make_serving_fn(
                model, variables, dtype=args.compute_dtype,
                add_depth_inputs=args.add_depth_inputs,
                flow_model=flow_model, flow_variables=flow_variables,
            ))
            got = np.asarray(loaded(*inputs))
            want = np.asarray(live_fn(*inputs))
            diff = float(np.max(np.abs(got - want)))
        log.info("validate: max |artifact - live| = %.3e", diff)
        if diff > 1e-5:
            raise SystemExit(
                f"validation failed: artifact diverges from live model "
                f"by {diff:.3e}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
