"""Multi-frame test-set evaluation (reference:
scripts/infer_multiframe_endovis15.py — despite the name, the reference's
actual multi-frame infer entry; README's infer_multiframe_detection.py does
not exist). Computes IoU/Dice, per-keypoint centroid errors (NaN-filtered
mean ± std), presence precision/recall/accuracy, and overlay dumps.
"""

from __future__ import annotations

import json

import jax
import numpy as np

from mfcnet_tpu.configs.parsers import multiframe_test_parser
from mfcnet_tpu.data.loader import get_data_loader
from mfcnet_tpu.data.transforms import TransformConfig, preprocess_eval_batch
from mfcnet_tpu.models import get_multiframe_segmentation_model
from mfcnet_tpu.track.infer_eval import evaluate_testset
from mfcnet_tpu.train.schedule import make_schedule
from mfcnet_tpu.train.state import TrainState, multiframe_optimizer
from mfcnet_tpu.train.steps import make_multiframe_eval_step
from mfcnet_tpu.utils.checkpoint import load_checkpoint
from mfcnet_tpu.utils.jitinit import jit_init
from mfcnet_tpu.utils.logging import init_logging


def main(argv=None):
    args = multiframe_test_parser().parse_args(argv)
    writer, logger, expt_dir = init_logging(
        args.expt_savedir, args.expt_name
    )
    logger.info(f"args: {vars(args)}")
    np.random.seed(args.seed)

    _, test_loader = get_data_loader(
        args.dataset,
        args.data_dir,
        "testing",
        args.prediction_task,
        args.num_input_frames,
        1,
        num_workers=args.num_workers,
        add_depth_inputs=args.add_depth_inputs,
        packed_dir=getattr(args, "packed_dir", None),
    )

    model = get_multiframe_segmentation_model(
        args.model_type,
        num_classes=args.num_classes,
        num_input_frames=args.num_input_frames,
        add_optflow_inputs=args.add_optflow_inputs,
        add_depth_inputs=args.add_depth_inputs,
        parity_grid=args.parity_grid,
        scale=args.model_scale,
    )
    T, H, W = args.num_input_frames, args.input_height, args.input_width
    init_kwargs = {}
    if args.add_optflow_inputs:
        init_kwargs["optflow"] = np.zeros((1, T - 1, H, W, 2), np.float32)
    if args.add_depth_inputs:
        init_kwargs["depth"] = np.zeros((1, T, H, W, 1), np.float32)
    variables = jit_init(
        model, jax.random.PRNGKey(args.seed),
        np.zeros((1, T, H, W, 3), np.float32), **init_kwargs,
    )
    tx = multiframe_optimizer(
        make_schedule("Constant", 1e-4, 1, 1), T, False, False
    )
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
    )
    if args.load_wts_model:
        from mfcnet_tpu.utils.checkpoint import params_from_payload

        payload, _ = load_checkpoint(args.load_wts_model, state)
        try:
            params_src = params_from_payload(
                payload, getattr(args, "use_ema", False)
            )
        except ValueError as e:
            raise SystemExit(f"{args.load_wts_model}: {e}")
        state = state.replace(
            params=params_src,
            batch_stats=payload["batch_stats"],
        )
        logger.info(
            f"Loaded model weights from {args.load_wts_model}"
            + (" (EMA)" if getattr(args, "use_ema", False) else "")
        )

    flow_fn = None
    if args.add_optflow_inputs:
        from mfcnet_tpu.cli.train_multiframe_detection import build_flow_fn

        flow_fn = build_flow_fn(
            args.optflow_model, args.model_type,
            (args.input_height, args.input_width),
            weights_path=getattr(args, "load_wts_flow_model", None),
        )

    eval_step = make_multiframe_eval_step(
        model, ["nll"], [1.0], args.metric_fns, args.num_classes,
        flow_fn=flow_fn,
    )
    tcfg = TransformConfig(
        out_height=H, out_width=W, prediction_task=args.prediction_task
    )
    results = evaluate_testset(
        test_loader,
        state,
        eval_step,
        lambda b: preprocess_eval_batch(b, tcfg),
        args.num_classes,
        logger,
        out_dir=expt_dir / "outputs",
        save_output_freq=args.save_output_freq,
    )
    (expt_dir / "outputs" / "results.json").write_text(
        json.dumps(results, indent=2)
    )
    writer.close()
    return results


if __name__ == "__main__":
    main()
