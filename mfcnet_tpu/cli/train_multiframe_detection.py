"""Train MFCNet multi-frame models (reference:
scripts/train_multiframe_detection.py).

Same flag surface; TPU-native internals: one jitted train step (model +
loss + Adam + optional frozen flow model), GSPMD data-parallel sharding over
all visible chips, device-side augmentation, msgpack checkpoints with the
reference's ``ckpts/model_{epoch:03d}`` naming, KeyboardInterrupt snapshot
(reference :179-183).

Usage: python -m mfcnet_tpu.cli.train_multiframe_detection --dataset JIGSAWS ...
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from mfcnet_tpu.configs.parsers import multiframe_train_parser
from mfcnet_tpu.data.loader import get_data_loader
from mfcnet_tpu.data.transforms import (
    TransformConfig,
    augment_train_batch,
    preprocess_eval_batch,
)
from mfcnet_tpu.models import get_multiframe_segmentation_model
from mfcnet_tpu.train.engine import train_one_epoch, validate
from mfcnet_tpu.train.schedule import make_schedule
from mfcnet_tpu.train.state import TrainState, multiframe_optimizer
from mfcnet_tpu.train.steps import (
    make_multiframe_eval_step,
    make_multiframe_train_step,
)
from mfcnet_tpu.utils.checkpoint import (
    make_checkpointer,
    latest_checkpoint,
    load_checkpoint,
    load_params,
    save_checkpoint,
)
from mfcnet_tpu.utils.jitinit import jit_init
from mfcnet_tpu.utils.logging import init_logging


def build_flow_fn(optflow_model: str, model_type: str, input_hw=(480, 640),
                  weights_path=None, fused_update: bool = False):
    """Frozen flow provider running inside the jitted step
    (reference: src/engine.py:39-53 — flow between each frame i and frame 0;
    'Basic' model types get flow(frame_i -> frame_0)).

    ``weights_path``: converted flow-model weights (msgpack, e.g. from
    ``tools/parity_check.py --save``). The reference loads pretrained
    flow weights implicitly (torchvision ``raft_large(pretrained=True)``,
    ``ffpp_things.pth`` — train_multiframe_detection.py:77-93); without
    them the frozen provider is random-init and the fusion head would
    train against noise flow.

    ``fused_update`` (RAFT only): run the provider's recurrent
    iterations through the fused Pallas update kernel — the XLA conv
    lowering is relayout-bound at 1/8-scale (ops/raft_update_pallas.py).
    bf16 envelope; enable for bf16 train steps. Safe inside the grad'd
    loss: the provider is frozen and its inputs are data, so no VJP of
    the kernel is ever required (pinned in tests/test_train_extras.py).
    """

    def _load(model, *dummies):
        if weights_path is None:
            return None
        import jax
        import numpy as np
        from flax import serialization

        from mfcnet_tpu.utils.jitinit import jit_init

        tpl = jit_init(
            model, jax.random.PRNGKey(0),
            *(np.zeros(d, np.float32) for d in dummies),
        )
        raw = serialization.msgpack_restore(
            Path(weights_path).read_bytes()
        )
        # Accept BOTH weight file shapes: a checkpoint-style payload
        # ({'params', 'batch_stats', ...} — what tools/parity_check.py
        # --save writes) and a bare params tree (save_params output).
        ckpt_style = isinstance(raw, dict) and "params" in raw
        raw_params = raw["params"] if ckpt_style else raw
        out = {"params": serialization.from_state_dict(
            tpl["params"], raw_params
        )}
        # RAFT's context encoder reads the batch_stats collection
        # (use_running_average=True); dropping it makes the first flow
        # forward raise ScopeCollectionNotFound. Restore it whenever the
        # model has one; fall back to init stats (mean 0 / var 1) only
        # for bare-params files that cannot carry it.
        if "batch_stats" in tpl:
            raw_bs = raw.get("batch_stats") if ckpt_style else None
            out["batch_stats"] = (
                serialization.from_state_dict(tpl["batch_stats"], raw_bs)
                if raw_bs else tpl["batch_stats"]
            )
        return out

    basic = "Basic" in model_type
    if optflow_model == "RAFT":
        from mfcnet_tpu.models.raft import RAFT, make_raft_flow_fn

        # template init at the working resolution, matching the
        # factory's own init (RAFT params are size-dependent below
        # 64x64 at 1/8 scale)
        pair = (1, *input_hw, 3)
        return make_raft_flow_fn(
            basic=basic, input_hw=input_hw,
            variables=_load(RAFT(iters=12), pair, pair),
            fused_update=fused_update,
        )
    # UnFlow/FFPP params are size-independent; init at the factories'
    # own 64x64 dummy size
    pair = (1, 64, 64, 3)
    if optflow_model == "UnFlow":
        from mfcnet_tpu.models.unflow import UnFlow, make_unflow_flow_fn

        return make_unflow_flow_fn(
            basic=basic, variables=_load(UnFlow(), pair, pair)
        )
    if optflow_model == "FlowFormerPlusPlus":
        from mfcnet_tpu.models.flowformerpp import (
            FlowFormerPP,
            make_ffpp_flow_fn,
        )

        return make_ffpp_flow_fn(
            basic=basic,
            variables=_load(FlowFormerPP(iters=12), pair, pair),
        )
    raise NotImplementedError(f"optflow model {optflow_model}")


def main(argv=None):
    args = multiframe_train_parser().parse_args(argv)

    # multi-host bootstrap FIRST (no-op single-process): it must run
    # before any other jax API so jax.devices() spans the whole pod,
    # and before init_logging so each rank gets its own log files in
    # the shared experiment dir
    from mfcnet_tpu.parallel import (
        init_distributed,
        make_mesh,
        shard_batch,
        shard_host_local_batch,
        shard_multiframe_batch,
    )

    proc_idx, proc_count = init_distributed(
        auto=getattr(args, "multihost", False)
    )
    writer, logger, expt_dir = init_logging(
        args.expt_savedir, args.expt_name, args.debug,
        rank=proc_idx if proc_count > 1 else None,
    )
    logger.info(f"args: {vars(args)}")
    np.random.seed(args.seed)

    if proc_count > 1:
        logger.info(f"distributed: process {proc_idx}/{proc_count}")
    key = jax.random.PRNGKey(args.seed)

    n_dev = len(jax.devices())
    spatial = getattr(args, "spatial_shards", 1)
    if proc_count > 1:
        # multi-host: --batch_size is PER PROCESS; the global batch must
        # divide the global device count and the mesh must span ALL
        # devices (a truncated mesh would exclude other hosts' chips)
        if spatial > 1:
            raise SystemExit(
                "--spatial_shards > 1 with --multihost is not supported: "
                "per-host batch assembly shards axis 0 only"
            )
        global_batch = args.batch_size * proc_count
        if global_batch % n_dev != 0:
            raise SystemExit(
                f"global batch {global_batch} (= {args.batch_size} x "
                f"{proc_count} processes) must divide {n_dev} devices"
            )
        mesh = make_mesh(n_dev)
        logger.info(
            f"data-parallel over {n_dev} devices on {proc_count} hosts "
            f"(global batch {global_batch})"
        )
    elif spatial > 1:
        # data x spatial mesh: batch over 'data', image height over
        # 'spatial' (GSPMD splits every conv and inserts ICI halo
        # exchanges; numerically transparent — tests/test_parallel.py)
        if n_dev % spatial != 0:
            raise SystemExit(
                f"--spatial_shards {spatial} must divide the device "
                f"count {n_dev}"
            )
        data_dev = n_dev // spatial
        while data_dev > 1 and args.batch_size % data_dev != 0:
            data_dev -= 1
        mesh = make_mesh(
            data_dev * spatial, ("data", "spatial"),
            shape=(data_dev, spatial),
        )
        logger.info(
            f"data x spatial parallel over {data_dev} x {spatial} devices"
        )
    else:
        # shard over the largest device count that divides the batch
        while n_dev > 1 and args.batch_size % n_dev != 0:
            n_dev -= 1
        mesh = make_mesh(n_dev) if n_dev > 1 else None
        if mesh is not None:
            logger.info(f"data-parallel over {n_dev} devices")

    train_loader, val_loader = get_data_loader(
        args.dataset,
        args.data_dir,
        args.mode,
        args.prediction_task,
        args.num_input_frames,
        args.batch_size,
        num_workers=args.num_workers,
        fold_index=args.fold_index,
        add_depth_inputs=args.add_depth_inputs,
        seed=args.seed,
        # multi-host: disjoint per-process training shards (identical
        # global shuffle on every host, strided slice per rank)
        shard=(proc_idx, proc_count) if proc_count > 1 else None,
        packed_dir=getattr(args, "packed_dir", None),
    )
    if mesh is not None:
        # fixed batch shapes so axis-0 sharding always divides
        train_loader.drop_last = True

    model = get_multiframe_segmentation_model(
        args.model_type,
        num_classes=args.num_classes,
        num_input_frames=args.num_input_frames,
        pretrained=args.pretrained,
        add_optflow_inputs=args.add_optflow_inputs,
        add_depth_inputs=args.add_depth_inputs,
        parity_grid=args.parity_grid,
        scale=args.model_scale,
        remat=getattr(args, "remat", False),
    )

    T, H, W = args.num_input_frames, args.input_height, args.input_width
    key, init_key = jax.random.split(key)
    init_kwargs = {}
    if args.add_optflow_inputs:
        init_kwargs["optflow"] = np.zeros((1, T - 1, H, W, 2), np.float32)
    if args.add_depth_inputs:
        init_kwargs["depth"] = np.zeros((1, T, H, W, 1), np.float32)
    variables = jit_init(
        model, init_key, np.zeros((1, T, H, W, 3), np.float32), **init_kwargs
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # base weights from a pretrained single-frame model
    # (reference :115-118)
    base_loaded = False
    if args.load_wts_base_model:
        params = dict(params)
        params["base"] = load_params(
            args.load_wts_base_model, template=params["base"]
        )
        base_loaded = True
        logger.info(f"Loaded base weights from {args.load_wts_base_model}")

    accum = max(1, getattr(args, "grad_accum", 1))
    # the schedule (and Adam moments) inside MultiSteps advance once per
    # REAL update, so per-epoch decay boundaries count updates not
    # micro-batches
    steps_per_epoch = max(1, len(train_loader) // accum)
    sched = make_schedule(
        args.scheduler, args.lr, args.num_epochs, steps_per_epoch
    )
    tx = multiframe_optimizer(
        sched,
        args.num_input_frames,
        train_base_model=args.train_base_model,
        base_pretrained_loaded=base_loaded,
        grad_accum=accum,
    )
    state = TrainState.create(
        model.apply, params, tx, batch_stats,
        ema_decay=getattr(args, "ema_decay", 0.0),
    )
    if accum > 1:
        logger.info(
            f"gradient accumulation: {accum} micro-batches per update "
            f"(effective batch {args.batch_size * accum})"
        )

    start_epoch = args.starting_epoch
    resume_skip_batches = 0
    if args.resume:
        ck = (
            args.load_wts_model
            or latest_checkpoint(expt_dir / "ckpts")
        )
        if ck:
            payload, epoch = load_checkpoint(ck, state)
            # mid-epoch interrupt snapshot: fast-forward the first epoch
            # to the interruption point (exact resume — the loader's
            # (seed, epoch)-keyed shuffle and fold_in batch keys replay
            # the interrupted run)
            import json as _json

            # "mid-epoch" is signalled by the KEY being present, not by
            # its value: a snapshot taken before the first batch of
            # epoch e completes writes batches_done=0 and must re-enter
            # epoch e (truthiness would skip the whole untrained epoch —
            # latest_checkpoint._position uses the same presence rule)
            mid_epoch = False
            meta_path = Path(str(ck)).with_suffix(".json")
            if meta_path.exists():
                meta = _json.loads(meta_path.read_text())
                mid_epoch = "batches_done" in meta
                resume_skip_batches = int(meta.get("batches_done", 0))
            state = state.replace(
                params=payload["params"],
                batch_stats=payload["batch_stats"],
                opt_state=payload["opt_state"],
                step=payload["step"],
            )
            if state.ema_params is not None:
                if "ema_params" in payload:
                    state = state.replace(ema_params=payload["ema_params"])
                else:
                    # checkpoint predates EMA: seed from the RESTORED
                    # params, not the pre-restore init the state was
                    # created with
                    state = state.replace(ema_params=jax.tree.map(
                        lambda p: jax.numpy.array(p), state.params
                    ))
            # a complete-epoch checkpoint resumes AFTER its epoch; only
            # a mid-epoch snapshot (batches_done in the sidecar)
            # re-enters its epoch with a batch fast-forward. (The
            # reference restarts AT the saved epoch — but it never
            # restores optimizer state, so its "resume" is a manual
            # re-run: utils/model_utils.py:14-39. Re-training a completed
            # epoch on top of a state that already contains it would
            # double-train it and shift every schedule boundary.)
            start_epoch = max(
                start_epoch,
                epoch if mid_epoch else epoch + 1,
            )
            logger.info(
                f"Resumed from {ck} at epoch {epoch}"
                + (
                    f" (mid-epoch: skipping {resume_skip_batches} batches)"
                    if mid_epoch else ""
                )
            )
    elif args.load_wts_model:
        payload, _ = load_checkpoint(args.load_wts_model, state)
        state = state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"]
        )
        logger.info(f"Loaded model weights from {args.load_wts_model}")

    flow_fn = (
        build_flow_fn(
            args.optflow_model, args.model_type, (H, W),
            weights_path=getattr(args, "load_wts_flow_model", None),
            # fused_update stays OFF for training: measured NEGATIVE at
            # full-res train token counts (r5: 0.928 vs 0.977 steps/s —
            # the Pallas kernel's 5.5x win is specific to the tracker's
            # relayout-bound 30x40 scale, and 8x4800 tokens need VMEM
            # batch chunking). Opt in via build_flow_fn if a config's
            # scale warrants it.
            fused_update=False,
        )
        if args.add_optflow_inputs
        else None
    )
    if args.add_optflow_inputs and not getattr(
        args, "load_wts_flow_model", None
    ):
        logger.warning(
            "--add_optflow_inputs without --load_wts_flow_model: the "
            "frozen flow provider is RANDOM-INIT (the reference trains "
            "against pretrained flow); pass converted weights for a "
            "real run."
        )

    train_step = make_multiframe_train_step(
        model,
        args.loss_fns,
        args.loss_wts,
        args.num_classes,
        class_weights=args.class_weights,
        train_base_model=args.train_base_model,
        flow_fn=flow_fn,
        compute_dtype=args.compute_dtype,
    )
    eval_step = make_multiframe_eval_step(
        model,
        args.loss_fns,
        args.loss_wts,
        args.metric_fns,
        args.num_classes,
        class_weights=args.class_weights,
        flow_fn=flow_fn,
        compute_dtype=args.compute_dtype,
    )

    tcfg = TransformConfig(
        out_height=H, out_width=W, prediction_task=args.prediction_task
    )
    def aug(batch, k):
        if mesh is not None and jax.process_count() > 1:
            # multi-host: assemble the global batch from the per-process
            # host (numpy) shards FIRST, then augment the sharded global
            # array under the mesh — no host round trip of device data.
            # The key is one GLOBAL value (identical on every process —
            # augmentation is a single SPMD program; per-sample
            # randomness comes from the per-element key split inside
            # augment_train_batch).
            batch = shard_host_local_batch(mesh, batch)
            return augment_train_batch(batch, k, tcfg)
        if mesh is not None:
            # single host with a mesh: shard the raw uint8 batch over the
            # data axis BEFORE augmenting (like the multi-host branch), so
            # the per-sample transform work spreads across the mesh and
            # only 1/N of the f32 result transfers per device — instead of
            # augmenting the whole batch on one device and resharding the
            # result. Raw (pre-resize) frame heights need not divide the
            # spatial axis, so the height split is applied after:
            # shard_multiframe_batch == shard_batch on a 1-D data mesh; on
            # a data x spatial mesh it additionally splits the height axis
            batch = shard_batch(mesh, batch)
            out = augment_train_batch(batch, k, tcfg)
            return shard_multiframe_batch(mesh, out)
        return augment_train_batch(batch, k, tcfg)

    import contextlib

    mesh_ctx = (
        jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    )
    ckpt_writer = make_checkpointer(
        getattr(args, "ckpt_backend", "msgpack")
    )
    epoch = start_epoch - 1  # interrupts before the loop: nothing trained
    # last epoch whose training FINISHED (state is complete through it).
    # The loop variable alone overstates progress when an interrupt
    # lands between the loop head and train_one_epoch's batch loop
    # (set_epoch / prefetcher construction): `epoch` is already the new
    # in-progress epoch there, but the state has not trained it.
    completed_epoch = start_epoch - 1
    try:
        with mesh_ctx:
            for epoch in range(start_epoch, args.num_epochs + 1):
                # per-epoch key + shuffle are pure functions of
                # (seed, epoch): a resumed process replays the identical
                # permutation and augmentation stream (preemption-safe)
                ek = jax.random.fold_in(key, epoch)
                skip = resume_skip_batches if epoch == start_epoch else 0
                train_loader.set_epoch(epoch, skip_batches=skip)
                state, train_loss = train_one_epoch(
                    train_loader,
                    epoch,
                    state,
                    train_step,
                    aug,
                    ek,
                    logger,
                    writer,
                    args.print_freq,
                    args.loss_fns,
                    skip_batches=skip,
                )
                completed_epoch = epoch
                validate(
                    val_loader,
                    state,
                    eval_step,
                    lambda b: preprocess_eval_batch(b, tcfg),
                    logger,
                    writer,
                    epoch,
                    args.print_freq,
                    args.loss_fns,
                    args.metric_fns,
                    args.num_classes,
                )
                if (epoch % args.save_freq == 0
                        or epoch == args.num_epochs):
                    # multi-host: a collective backend (orbax) uses global
                    # process barriers, so EVERY process must enter save()
                    # (orbax writes from the primary host internally);
                    # the process-local msgpack backend is gated on
                    # process 0 since params are replicated.
                    if ckpt_writer.collective or jax.process_index() == 0:
                        p = ckpt_writer.save(
                            expt_dir / "ckpts", epoch, state
                        )
                        if jax.process_index() == 0:
                            logger.info(f"Saved checkpoint {p} (async)")
    except KeyboardInterrupt as e:
        # snapshot on interrupt (reference :179-183). TrainInterrupted
        # carries the MID-EPOCH state + completed-batch count; the
        # sidecar records the REAL epoch (not 999) and batches_done, so
        # `--resume` continues exactly where the run was preempted.
        from mfcnet_tpu.train.engine import TrainInterrupted

        if isinstance(e, TrainInterrupted):
            state = e.state
            extra = {"epoch": epoch, "batches_done": e.batches_done}
        else:
            # interrupt OUTSIDE train_one_epoch's batch loop (validate /
            # checkpoint save / loop head / before the loop): the state
            # is epoch-complete through `completed_epoch` — NOT the loop
            # variable, which already names the next in-progress epoch
            # when the interrupt lands in set_epoch or prefetcher
            # construction, and would make --resume skip that epoch
            extra = {"epoch": completed_epoch}
        if jax.process_index() == 0:
            try:
                p = save_checkpoint(expt_dir / "ckpts", 999, state,
                                    extra=extra)
                logger.info(
                    f"Interrupted; snapshot saved to {p}"
                    + (
                        f" (epoch {extra['epoch']}, "
                        f"{extra['batches_done']} batches)"
                        if "batches_done" in extra
                        else f" (epoch {extra['epoch']})"
                    )
                )
            except Exception as snap_err:
                # the interrupt can land inside a train step whose
                # donated input buffers are already invalidated — the
                # state handed to us is then unreadable. Losing the
                # snapshot is the pre-existing behavior; crashing inside
                # the interrupt handler loses the clean shutdown too.
                logger.error(
                    f"Interrupt snapshot failed ({snap_err!r}); resume "
                    "from the last periodic checkpoint instead."
                )
        raise
    ckpt_writer.wait()
    getattr(ckpt_writer, "close", lambda: None)()
    writer.close()
    return state


if __name__ == "__main__":
    main()
