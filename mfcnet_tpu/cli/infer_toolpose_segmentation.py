"""Single-frame test-set evaluation (reference:
scripts/infer_toolpose_segmentation.py): IoU/Dice + centroid errors +
detection-presence stats + overlay PNGs. Also serves the endovis15
single-frame variant (reference: scripts/infer_endovis15_segmentation.py)
via ``--prediction_task endovis15_segmentation --num_classes 11``.
"""

from __future__ import annotations

import json

import jax
import numpy as np

from mfcnet_tpu.configs.parsers import toolposeseg_test_parser
from mfcnet_tpu.data.dataset import SingleFrameDataset
from mfcnet_tpu.data.files import get_dataset_filenames
from mfcnet_tpu.data.loader import DataLoader
from mfcnet_tpu.data.transforms import TransformConfig
from mfcnet_tpu.models import get_tooltip_segmentation_model
from mfcnet_tpu.cli.train_toolpose_segmentation import (
    OUTPUT_MODES,
    _sf_batch_adapter,
)
from mfcnet_tpu.track.infer_eval import evaluate_testset
from mfcnet_tpu.train.schedule import make_schedule
from mfcnet_tpu.train.state import TrainState, singleframe_optimizer
from mfcnet_tpu.train.steps import make_singleframe_eval_step
from mfcnet_tpu.utils.checkpoint import load_checkpoint
from mfcnet_tpu.utils.jitinit import jit_init
from mfcnet_tpu.utils.logging import init_logging


def main(argv=None):
    args = toolposeseg_test_parser().parse_args(argv)
    writer, logger, expt_dir = init_logging(
        args.expt_savedir, args.expt_name
    )
    logger.info(f"args: {vars(args)}")
    np.random.seed(args.seed)

    test_files, _ = get_dataset_filenames(
        args.dataset, args.data_dir, "testing"
    )
    output_mode = OUTPUT_MODES[args.model_type]
    test_ds = SingleFrameDataset(
        test_files, args.prediction_task,
        with_attmap=(output_mode == "tapnet"),
        frames_per_video=args.num_frames_per_video,
    )
    test_loader = DataLoader(test_ds, 1, num_workers=args.num_workers)

    model = get_tooltip_segmentation_model(
        args.model_type, args.num_classes, scale=args.model_scale
    )
    H, W = args.input_height, args.input_width
    if output_mode == "tapnet":
        variables = jit_init(
            model, jax.random.PRNGKey(args.seed),
            np.zeros((1, H, W, 3), np.float32),
            np.zeros((1, H, W, 1), np.float32),
        )
    else:
        variables = jit_init(
            model, jax.random.PRNGKey(args.seed),
            np.zeros((1, H, W, 3), np.float32),
        )
    tx = singleframe_optimizer(make_schedule("Constant", 1e-4, 1, 1))
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

    eval_step = make_singleframe_eval_step(
        model, ["nll"], [1.0], args.metric_fns, args.num_classes,
        output_mode=output_mode,
    )
    tcfg = TransformConfig(
        out_height=H, out_width=W, prediction_task=args.prediction_task
    )
    results = evaluate_testset(
        test_loader,
        state,
        eval_step,
        lambda b: _sf_batch_adapter(b, tcfg, False),
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
