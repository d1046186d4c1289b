"""End-to-end CLI smoke test: synthetic JIGSAWS dataset -> 1-epoch train run
through the real entry point (loaders + augmentation + jitted step +
checkpointing)."""

import json
from pathlib import Path

import numpy as np
import pytest


def test_train_mfc_cli_end_to_end(tmp_path):
    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset
    from mfcnet_tpu.cli.train_multiframe_detection import main

    data_root = make_jigsaws_like_dataset(
        tmp_path / "data", num_videos=2, frames_per_video=5,
        height=64, width=64,
    )
    state = main([
        "--data_dir", str(data_root),
        "--dataset", "JIGSAWS",
        "--prediction_task", "toolpose_segmentation",
        "--num_input_frames", "3",
        "--expt_savedir", str(tmp_path / "runs"),
        "--expt_name", "smoke",
        "--batch_size", "2",
        "--num_workers", "2",
        "--num_classes", "5",
        "--loss_fns", "nll", "soft_jaccard",
        "--loss_wts", "0.7", "0.3",
        "--class_weights", "1", "1000", "1000", "1000", "1000",
        "--lr", "1e-3",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--print_freq", "5",
        "--input_height", "32",
        "--input_width", "32",
        "--model_type", "TernausNetMulti-Basic",
        "--model_scale", "0.1",
        "--train_base_model", "true",
    ])
    assert int(state.step) > 0
    expt = tmp_path / "runs" / "smoke"
    assert (expt / "ckpts" / "model_001.msgpack").exists()
    scalars = (expt / "logs" / "scalars.jsonl").read_text().splitlines()
    tags = {json.loads(line)["tag"] for line in scalars}
    assert "Training/Loss" in tags and "Validation/Loss" in tags
    vals = [json.loads(line)["value"] for line in scalars]
    assert all(np.isfinite(v) for v in vals)


def test_resume_from_checkpoint(tmp_path):
    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset
    from mfcnet_tpu.cli.train_multiframe_detection import main

    data_root = make_jigsaws_like_dataset(
        tmp_path / "data", num_videos=1, frames_per_video=4,
        height=64, width=64,
    )
    common = [
        "--data_dir", str(data_root),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path / "runs"),
        "--expt_name", "resume",
        "--batch_size", "2",
        "--num_workers", "1",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--class_weights", "1", "1", "1", "1", "1",
    ]
    s1 = main(common)
    s2 = main(common + ["--resume", "true", "--starting_epoch", "1"])
    # resumed run continues from the saved optimizer step
    assert int(s2.step) >= int(s1.step)


def test_resume_through_orbax_backend(tmp_path):
    """--ckpt_backend orbax: async Orbax dirs written, resume restores
    params + optimizer state from them (load_checkpoint dispatches on the
    .orbax suffix)."""
    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset
    from mfcnet_tpu.cli.train_multiframe_detection import main

    data_root = make_jigsaws_like_dataset(
        tmp_path / "data", num_videos=1, frames_per_video=4,
        height=64, width=64,
    )
    common = [
        "--data_dir", str(data_root),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path / "runs"),
        "--expt_name", "resume_orbax",
        "--batch_size", "2",
        "--num_workers", "1",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--class_weights", "1", "1", "1", "1", "1",
        "--ckpt_backend", "orbax",
    ]
    s1 = main(common)
    ck = tmp_path / "runs" / "resume_orbax" / "ckpts" / "model_001.orbax"
    assert ck.is_dir()

    # the restored payload round-trips exactly
    from mfcnet_tpu.utils.checkpoint import load_checkpoint
    import jax

    payload, epoch = load_checkpoint(ck, s1)
    assert epoch == 1
    a = jax.tree.leaves(payload["params"])
    b = jax.tree.leaves(jax.device_get(s1.params))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    s2 = main(common + ["--resume", "true", "--starting_epoch", "1"])
    assert int(s2.step) >= int(s1.step)


def test_train_cli_multidevice_sharded(tmp_path):
    """The CLI shards batches over all 8 virtual CPU devices (GSPMD DP)."""
    import jax

    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset
    from mfcnet_tpu.cli.train_multiframe_detection import main

    assert len(jax.devices()) == 8
    data_root = make_jigsaws_like_dataset(
        tmp_path / "data", num_videos=2, frames_per_video=8,
        height=64, width=64,
    )
    state = main([
        "--data_dir", str(data_root),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path / "runs"),
        "--expt_name", "dp8",
        "--batch_size", "8",
        "--num_workers", "2",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--print_freq", "5",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--class_weights", "1", "1", "1", "1", "1",
    ])
    assert int(state.step) >= 2  # 16 train samples / batch 8


def test_train_cli_spatial_sharded(tmp_path):
    """--spatial_shards 4: the CLI trains on a (2, 4) data x spatial mesh —
    image height split over 'spatial', batch over 'data'."""
    import jax

    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset
    from mfcnet_tpu.cli.train_multiframe_detection import main

    assert len(jax.devices()) == 8
    data_root = make_jigsaws_like_dataset(
        tmp_path / "data", num_videos=2, frames_per_video=5,
        height=64, width=64,
    )
    state = main([
        "--data_dir", str(data_root),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path / "runs"),
        "--expt_name", "sp4",
        "--batch_size", "2",
        "--num_workers", "2",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--print_freq", "5",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--class_weights", "1", "1", "1", "1", "1",
        "--spatial_shards", "4",
    ])
    assert int(state.step) >= 1
