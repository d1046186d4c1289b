"""Train single-frame (SFC) segmentation models (reference:
scripts/train_toolpose_segmentation.py).

Per-model-type output adapters match the reference (:160-170): TernausNet /
SegFormer emit log-probs directly; HRNet / DeepLab / FCN / UNet / ResUNet
get a log_softmax; TAPNet consumes (image, attention-map) pairs. The TAPNet
attention-map regeneration after each epoch (:261-263) is supported via
``save_attention_maps``.
"""

from __future__ import annotations

import cv2
import jax
import numpy as np

from mfcnet_tpu.configs.parsers import toolposeseg_train_parser
from mfcnet_tpu.data.dataset import SingleFrameDataset
from mfcnet_tpu.data.files import get_dataset_filenames
from mfcnet_tpu.data.loader import DataLoader
from mfcnet_tpu.data.transforms import (
    TransformConfig,
    augment_train_batch,
    preprocess_eval_batch,
)
from mfcnet_tpu.models import get_tooltip_segmentation_model
from mfcnet_tpu.train.engine import train_one_epoch, validate
from mfcnet_tpu.train.schedule import make_schedule
from mfcnet_tpu.train.state import TrainState, singleframe_optimizer
from mfcnet_tpu.train.steps import (
    make_singleframe_eval_step,
    make_singleframe_train_step,
)
from mfcnet_tpu.utils.checkpoint import (
    make_checkpointer,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    save_params,
)
from mfcnet_tpu.utils.jitinit import jit_init
from mfcnet_tpu.utils.logging import init_logging

OUTPUT_MODES = {
    "TernausNet11": "log_probs",
    "TernausNet16": "log_probs",
    "SegFormer": "log_probs",
    "HRNet": "logits",
    "DeepLab_v3": "logits",
    "FCN": "logits",
    "UNet": "logits",
    "ResUNet": "logits",
    "TAPNet11": "tapnet",
    "TAPNet16": "tapnet",
}


def _sf_batch_adapter(batch, tcfg, train, key=None):
    """Single-frame batches reuse the multi-frame transform pipeline with
    T=1 ('frames' (B,1,H,W,3)); output 'image' (B,H,W,3[+1 attmap])."""
    mf = {"frames": batch["image"][:, None], "mask": batch["mask"]}
    if train:
        out = augment_train_batch(mf, key, tcfg)
    else:
        out = preprocess_eval_batch(mf, tcfg)
    img = out["frames"][:, 0]
    if "attmap" in batch:
        import jax.numpy as jnp

        att = batch["attmap"].astype(np.float32)
        att = jnp.asarray(att)[..., None]
        from mfcnet_tpu.ops.resize import resize_bilinear

        att = resize_bilinear(att, img.shape[-3], img.shape[-2])
        img = jnp.concatenate([img, att], axis=-1)
    return {"image": img, "mask": out["mask"]}


def main(argv=None):
    args = toolposeseg_train_parser().parse_args(argv)
    writer, logger, expt_dir = init_logging(
        args.expt_savedir, args.expt_name, args.debug
    )
    logger.info(f"args: {vars(args)}")
    np.random.seed(args.seed)
    key = jax.random.PRNGKey(args.seed)

    train_files, val_files = get_dataset_filenames(
        args.dataset, args.data_dir, args.mode, args.fold_index
    )
    output_mode = OUTPUT_MODES[args.model_type]
    with_attmap = output_mode == "tapnet"
    train_ds = SingleFrameDataset(
        train_files, args.prediction_task, with_attmap,
        args.num_frames_per_video,
    )
    val_ds = SingleFrameDataset(
        val_files, args.prediction_task, with_attmap,
        args.num_frames_per_video,
    )
    train_loader = DataLoader(
        train_ds, args.batch_size, shuffle=True,
        num_workers=args.num_workers, seed=args.seed,
    )
    val_loader = DataLoader(val_ds, 1, num_workers=args.num_workers)

    model = get_tooltip_segmentation_model(
        args.model_type, args.num_classes, args.pretrained,
        scale=args.model_scale, remat=getattr(args, "remat", False),
    )
    H, W = args.input_height, args.input_width
    key, ik = jax.random.split(key)
    if output_mode == "tapnet":
        variables = jit_init(
            model, ik, np.zeros((1, H, W, 3), np.float32),
            np.zeros((1, H, W, 1), np.float32),
        )
    else:
        variables = jit_init(model, ik, np.zeros((1, H, W, 3), np.float32))

    accum = max(1, getattr(args, "grad_accum", 1))
    # LR schedule counts real optimizer updates, not micro-batches
    steps_per_epoch = max(1, len(train_loader) // accum)
    sched = make_schedule(
        args.scheduler, args.lr, args.num_epochs, steps_per_epoch
    )
    tx = singleframe_optimizer(sched, grad_accum=accum)
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
        ema_decay=getattr(args, "ema_decay", 0.0),
    )

    start_epoch = args.starting_epoch
    if args.resume:
        ck = args.load_wts_model or latest_checkpoint(expt_dir / "ckpts")
        if ck:
            payload, epoch = load_checkpoint(ck, state)
            state = state.replace(
                params=payload["params"],
                batch_stats=payload["batch_stats"],
                opt_state=payload["opt_state"],
                step=payload["step"],
            )
            start_epoch = max(start_epoch, epoch)
            logger.info(f"Resumed from {ck} at epoch {epoch}")

    train_step = make_singleframe_train_step(
        model, args.loss_fns, args.loss_wts, args.num_classes,
        class_weights=args.class_weights, output_mode=output_mode,
        compute_dtype=args.compute_dtype,
    )
    eval_step = make_singleframe_eval_step(
        model, args.loss_fns, args.loss_wts, args.metric_fns,
        args.num_classes, class_weights=args.class_weights,
        output_mode=output_mode, compute_dtype=args.compute_dtype,
    )

    tcfg = TransformConfig(
        out_height=H, out_width=W, prediction_task=args.prediction_task
    )

    ckpt_writer = make_checkpointer(
        getattr(args, "ckpt_backend", "msgpack")
    )
    try:
        for epoch in range(start_epoch, args.num_epochs + 1):
            key, ek = jax.random.split(key)
            state, _ = train_one_epoch(
                train_loader, epoch, state, train_step,
                lambda b, k: _sf_batch_adapter(b, tcfg, True, k),
                ek, logger, writer, args.print_freq, args.loss_fns,
            )
            validate(
                val_loader, state, eval_step,
                lambda b: _sf_batch_adapter(b, tcfg, False),
                logger, writer, epoch, args.print_freq,
                args.loss_fns, args.metric_fns, args.num_classes,
            )
            if output_mode == "tapnet":
                save_attention_maps(
                    train_ds, model, state, tcfg, logger
                )
            if epoch % args.save_freq == 0 or epoch == args.num_epochs:
                p = ckpt_writer.save(expt_dir / "ckpts", epoch, state)
                # also export params-only for --load_wts_base_model reuse
                save_params(
                    expt_dir / "ckpts" / f"params_{epoch:03d}.msgpack",
                    state.params,
                )
                logger.info(f"Saved checkpoint {p}")
    except KeyboardInterrupt:
        p = save_checkpoint(expt_dir / "ckpts", 999, state)
        logger.info(f"Interrupted; snapshot saved to {p}")
        raise
    ckpt_writer.wait()
    getattr(ckpt_writer, "close", lambda: None)()
    writer.close()
    return state


def save_attention_maps(dataset, model, state, tcfg, logger):
    """Write predicted foreground-probability maps back into the dataset's
    attmaps/ dirs (reference: scripts/train_toolpose_segmentation.py:47-77 —
    the train loop mutates the dataset on disk each epoch)."""
    import jax.numpy as jnp

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fg_prob(img, att):
        out = model.apply(variables, img, att)
        probs = jnp.exp(out)
        return 1.0 - probs[..., 0]

    for idx in range(len(dataset)):
        sample = dataset[idx]
        batch = _sf_batch_adapter(
            {k: v[None] for k, v in sample.items()}, tcfg, train=False
        )
        img = batch["image"]
        fg = np.asarray(fg_prob(img[..., :3], img[..., 3:]))[0]
        path = str(dataset.file_names[idx]).replace(
            "images", "attmaps"
        ).replace("jpg", "png")
        import os
        from pathlib import Path

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(path, (fg * 255).astype(np.uint8))
    logger.info(f"Re-wrote {len(dataset)} attention maps")


if __name__ == "__main__":
    main()
