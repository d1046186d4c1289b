"""Gradient accumulation (optax.MultiSteps) + EMA params.

No reference analogue (the reference trains plain Adam at the literal
batch size); these are the production-training extras: N micro-batches
per optimizer update, and an exponential moving average of the params
carried in the TrainState, checkpointed, and servable via
``cli.export_model --use_ema``.
"""

import numpy as np
import pytest


def _toy_params():
    return {
        "base": {"w": np.zeros((3,), np.float32)},
        "head": {"w": np.zeros((3,), np.float32)},
    }


def test_grad_accum_equals_mean_gradient_update():
    """k micro-steps with MultiSteps == one step on the averaged gradient:
    params frozen until the k-th micro-batch, then identical to the
    unaccumulated optimizer fed mean(g_i)."""
    import jax

    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, multiframe_optimizer

    sched = make_schedule("Constant", 1e-2, 1, 1)
    g1 = {
        "base": {"w": np.array([1.0, 0.0, 2.0], np.float32)},
        "head": {"w": np.array([0.5, -1.0, 0.0], np.float32)},
    }
    g2 = jax.tree.map(lambda g: g * 3.0, g1)

    tx_acc = multiframe_optimizer(sched, 3, True, False, grad_accum=2)
    s = TrainState.create(lambda *a: None, _toy_params(), tx_acc)
    s = s.apply_gradients(g1)
    # first micro-step: NO param change yet
    for k in ("base", "head"):
        np.testing.assert_array_equal(np.asarray(s.params[k]["w"]), 0.0)
    s = s.apply_gradients(g2)

    tx_ref = multiframe_optimizer(sched, 3, True, False)
    r = TrainState.create(lambda *a: None, _toy_params(), tx_ref)
    r = r.apply_gradients(jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2))

    for k in ("base", "head"):
        np.testing.assert_allclose(
            np.asarray(s.params[k]["w"]), np.asarray(r.params[k]["w"]),
            atol=1e-7,
        )


def test_ema_recurrence():
    import optax

    from mfcnet_tpu.train.state import TrainState

    tx = optax.sgd(0.1)
    params = {"head": {"w": np.ones((2,), np.float32)}}
    s = TrainState.create(lambda *a: None, params, tx, ema_decay=0.9)
    # ema starts equal to params
    np.testing.assert_array_equal(np.asarray(s.ema_params["head"]["w"]), 1.0)
    ema = p = np.ones(2, np.float32)
    for i in range(3):
        g = {"head": {"w": np.full((2,), float(i + 1), np.float32)}}
        s = s.apply_gradients(g)
        p = p - 0.1 * (i + 1)
        ema = ema * 0.9 + p * 0.1
    np.testing.assert_allclose(
        np.asarray(s.ema_params["head"]["w"]), ema, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(s.params["head"]["w"]), p,
                               atol=1e-6)


def test_ema_skips_accumulation_micro_steps():
    """With grad_accum=k the EMA must blend once per REAL update, not per
    micro-batch — otherwise the effective decay silently becomes d^k."""
    import jax

    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, multiframe_optimizer

    sched = make_schedule("Constant", 1e-2, 1, 1)
    tx = multiframe_optimizer(sched, 3, True, False, grad_accum=2)
    s = TrainState.create(lambda *a: None, _toy_params(), tx, ema_decay=0.5)
    g = {
        "base": {"w": np.array([1.0, 1.0, 1.0], np.float32)},
        "head": {"w": np.array([1.0, 1.0, 1.0], np.float32)},
    }
    s = s.apply_gradients(g)
    # accumulation micro-step: params frozen AND ema untouched
    np.testing.assert_array_equal(
        np.asarray(s.ema_params["head"]["w"]), 0.0
    )
    s = s.apply_gradients(g)
    # real update: exactly ONE blend of the new params
    p1 = np.asarray(s.params["head"]["w"])
    np.testing.assert_allclose(
        np.asarray(s.ema_params["head"]["w"]), 0.5 * p1, atol=1e-7
    )


def test_resume_seeds_ema_from_restored_params(dataset, tmp_path):
    """Resuming a pre-EMA checkpoint with --ema_decay must seed the EMA
    from the RESTORED weights, not the fresh random init."""
    from mfcnet_tpu.cli.train_multiframe_detection import main

    common = [
        "--data_dir", str(dataset),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path),
        "--expt_name", "rs",
        "--model_type", "TernausNetMulti-Basic",
        "--model_scale", "0.1",
        "--input_height", "32",
        "--input_width", "32",
        "--batch_size", "2",
        "--num_workers", "1",
        "--save_freq", "1",
        "--lr", "1e-6",  # params barely move: ema ~ params if seeded right
    ]
    main(common + ["--num_epochs", "1"])  # epoch-1 ckpt, NO ema_params
    state = main(common + [
        "--num_epochs", "2", "--resume", "true", "--ema_decay", "0.9",
    ])
    import jax

    diffs = jax.tree.map(
        lambda e, p: float(np.max(np.abs(
            np.asarray(e, np.float32) - np.asarray(p, np.float32)
        ))),
        state.ema_params, state.params,
    )
    worst = max(jax.tree.leaves(diffs))
    # buggy seeding leaves ~0.9^n of a random init in the EMA (diff on the
    # order of the weight scale, ~1e-1); correct seeding tracks params
    assert worst < 1e-3, f"EMA far from params after resume: {worst}"


def test_snapshot_roundtrips_ema(tmp_path):
    import optax

    from mfcnet_tpu.train.state import TrainState
    from mfcnet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    params = {"head": {"w": np.ones((2,), np.float32)}}
    s = TrainState.create(lambda *a: None, params, optax.sgd(0.1), {},
                          ema_decay=0.5)
    s = s.apply_gradients({"head": {"w": np.ones((2,), np.float32)}})
    ck = save_checkpoint(tmp_path, 1, s)
    payload, epoch = load_checkpoint(ck, s)
    assert epoch == 1
    np.testing.assert_allclose(
        np.asarray(payload["ema_params"]["head"]["w"]),
        np.asarray(s.ema_params["head"]["w"]),
    )
    # ema-less state: no ema in snapshot
    s2 = TrainState.create(lambda *a: None, params, optax.sgd(0.1))
    ck2 = save_checkpoint(tmp_path / "n", 1, s2)
    payload2, _ = load_checkpoint(ck2)
    assert "ema_params" not in payload2


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset

    root = tmp_path_factory.mktemp("ds_extras")
    return make_jigsaws_like_dataset(
        root, num_videos=1, frames_per_video=6, height=64, width=64
    )


def test_singleframe_cli_grad_accum_ema(dataset, tmp_path):
    from mfcnet_tpu.cli.train_toolpose_segmentation import main

    state = main([
        "--data_dir", str(dataset),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path),
        "--expt_name", "sfa",
        "--batch_size", "2",
        "--num_workers", "1",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--input_height", "32",
        "--input_width", "32",
        "--model_type", "TernausNet16",
        "--model_scale", "0.1",
        "--class_weights", "1", "1", "1", "1", "1",
        "--grad_accum", "2",
        "--ema_decay", "0.9",
    ])
    assert int(state.step) > 0
    assert state.ema_params is not None


def test_video_cli_use_ema(tmp_path):
    """--use_ema on the video CLI serves the checkpoint's EMA weights and
    fails loudly when the checkpoint has none."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, multiframe_optimizer
    from mfcnet_tpu.utils.checkpoint import save_checkpoint
    from mfcnet_tpu.utils.jitinit import jit_init

    make_synthetic_video(tmp_path / "vids" / "a.mp4", num_frames=5,
                         height=64, width=64)
    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", 5, 3, scale=0.1
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0),
        np.zeros((1, 3, 32, 32, 3), np.float32),
    )
    tx = multiframe_optimizer(make_schedule("Constant", 1e-4, 1, 1), 3,
                              False, False)
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}), ema_decay=0.9,
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)
    no_ema = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
    )
    ck_plain = save_checkpoint(tmp_path / "ckp", 1, no_ema)

    from mfcnet_tpu.cli.test_multiframe_segmentation_on_videos import main

    common = [
        "--videos_dir", str(tmp_path / "vids"),
        "--expt_savedir", str(tmp_path),
        "--model_type", "TernausNetMulti-Basic",
        "--model_scale", "0.1",
        "--input_height", "32",
        "--input_width", "32",
        "--compute_dtype", "float32",
        "--use_ema", "true",
    ]
    fps = main(common + ["--expt_name", "e", "--load_wts_model", str(ck)])
    assert len(fps) == 1
    with pytest.raises(SystemExit, match="ema_params"):
        main(common + [
            "--expt_name", "p", "--load_wts_model", str(ck_plain),
        ])


def test_train_cli_grad_accum_ema_and_ema_export(dataset, tmp_path):
    from mfcnet_tpu.cli.train_multiframe_detection import main
    from mfcnet_tpu.utils.checkpoint import load_checkpoint

    state = main([
        "--data_dir", str(dataset),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path),
        "--expt_name", "ge",
        "--model_type", "TernausNetMulti-Basic",
        "--model_scale", "0.1",
        "--input_height", "32",
        "--input_width", "32",
        "--batch_size", "2",
        "--grad_accum", "2",
        "--ema_decay", "0.9",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--num_workers", "1",
    ])
    assert state.ema_params is not None
    ck = tmp_path / "ge" / "ckpts" / "model_001.msgpack"
    payload, _ = load_checkpoint(ck)
    assert "ema_params" in payload

    from mfcnet_tpu.cli.export_model import main as export_main
    from mfcnet_tpu.serve import load_exported

    out = tmp_path / "ema.stablehlo"
    rc = export_main([
        "--model_type", "TernausNetMulti-Basic",
        "--num_input_frames", "3",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
        "--load_wts_model", str(ck),
        "--use_ema", "true",
        "--output", str(out),
        "--validate", "true",
    ])
    assert rc == 0
    assert load_exported(out).meta["ema"] is True


def test_loss_arity_mismatch_raises():
    """--loss_fns longer than --loss_wts used to be silently truncated
    by zip (a requested loss term simply not trained on); the reference
    asserts the arity at startup (train_multiframe_detection.py:47-49)
    and so do we."""
    import jax.numpy as jnp
    import pytest

    from mfcnet_tpu.train.loss import compute_losses

    lp = jnp.zeros((1, 4, 4, 5))
    tg = jnp.zeros((1, 4, 4), jnp.int32)
    with pytest.raises(ValueError, match="loss_wts"):
        compute_losses(lp, tg, ["nll", "soft_jaccard"], [1.0], 5)
    total, parts = compute_losses(
        lp, tg, ["nll", "soft_jaccard"], [0.7, 0.3], 5
    )
    assert {"loss_nll", "loss_soft_jaccard"} <= set(parts)
