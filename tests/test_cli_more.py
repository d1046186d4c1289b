"""Smoke tests for the remaining CLI surface (tiny models, synthetic data)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset

    root = tmp_path_factory.mktemp("ds")
    return make_jigsaws_like_dataset(
        root, num_videos=1, frames_per_video=4, height=64, width=64
    )


def test_train_toolpose_cli(dataset, tmp_path):
    from mfcnet_tpu.cli.train_toolpose_segmentation import main

    state = main([
        "--data_dir", str(dataset),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path),
        "--expt_name", "sf",
        "--batch_size", "2",
        "--num_workers", "1",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--input_height", "32",
        "--input_width", "32",
        "--model_type", "TernausNet16",
        "--model_scale", "0.1",
        "--class_weights", "1", "1", "1", "1", "1",
    ])
    assert int(state.step) > 0
    assert (tmp_path / "sf" / "ckpts" / "params_001.msgpack").exists()


def test_infer_toolpose_cli(dataset, tmp_path):
    from mfcnet_tpu.cli.infer_toolpose_segmentation import main

    results = main([
        "--data_dir", str(dataset),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path),
        "--expt_name", "inf",
        "--num_workers", "1",
        "--input_height", "32",
        "--input_width", "32",
        "--model_type", "TernausNet16",
        "--model_scale", "0.1",
        "--save_output_freq", "2",
    ])
    assert results["num_samples"] == 4
    assert (tmp_path / "inf" / "outputs" / "results.json").exists()
    assert len(results["presence_precision"]) == 4


def test_infer_multiframe_cli(dataset, tmp_path):
    from mfcnet_tpu.cli.infer_multiframe_endovis15 import main

    results = main([
        "--data_dir", str(dataset),
        "--dataset", "JIGSAWS",
        "--prediction_task", "toolpose_segmentation",
        "--expt_savedir", str(tmp_path),
        "--expt_name", "infmf",
        "--num_workers", "1",
        "--num_input_frames", "3",
        "--input_height", "32",
        "--input_width", "32",
        "--model_type", "TernausNetMulti-Basic",
        "--model_scale", "0.1",
        "--save_output_freq", "0",
    ])
    assert results["num_samples"] == 4


def test_video_cli_and_flowgen(dataset, tmp_path):
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.utils.checkpoint import save_checkpoint
    from mfcnet_tpu.utils.jitinit import jit_init
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, multiframe_optimizer

    make_synthetic_video(tmp_path / "vids" / "a.mp4", num_frames=6,
                         height=64, width=64)

    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", 5, 3, scale=0.1
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, 3, 32, 32, 3), np.float32)
    )
    tx = multiframe_optimizer(make_schedule("Constant", 1e-4, 1, 1), 3,
                              False, False)
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)

    from mfcnet_tpu.cli.test_multiframe_segmentation_on_videos import main

    fps = main([
        "--videos_dir", str(tmp_path / "vids"),
        "--expt_savedir", str(tmp_path),
        "--expt_name", "vt",
        "--model_type", "TernausNetMulti-Basic",
        "--load_wts_model", str(ck),
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
    ])
    assert len(fps) == 1
    out = tmp_path / "vt" / "video_tracking_results"
    assert (out / "a_tracked.csv").exists()

    # flow generation over the synthetic dataset (RAFT tiny iters)
    from mfcnet_tpu.cli.generate_opticalflow import main as flow_main

    n = flow_main([
        "--data_dir", str(dataset),
        "--dataset", "JIGSAWS",
        "--mode", "testing",
        "--optflow_model", "RAFT",
        "--input_height", "32",
        "--input_width", "32",
        "--raft_iters", "1",
        "--save_viz", "false",
    ])
    assert n == 4
    from mfcnet_tpu.data.masks import read_flo

    flo = read_flo(
        str(dataset / "annotations_val" / "video_1" / "optflow_raft"
            / "frame_0001.flo")
    )
    assert flo.shape == (32, 32, 2)

    # batched precompute (--batch 3, incl. a padded partial final chunk):
    # same flow values as per-pair
    n2 = flow_main([
        "--data_dir", str(dataset),
        "--dataset", "JIGSAWS",
        "--mode", "testing",
        "--optflow_model", "RAFT",
        "--optflow_dir", "optflow_b3",
        "--input_height", "32",
        "--input_width", "32",
        "--raft_iters", "1",
        "--save_viz", "false",
        "--batch", "3",
    ])
    assert n2 == n
    for vid, frame in (("video_1", "frame_0001"),):
        a = read_flo(
            str(dataset / "annotations_val" / vid / "optflow_raft"
                / f"{frame}.flo")
        )
        b = read_flo(
            str(dataset / "annotations_val" / vid / "optflow_b3"
                / f"{frame}.flo")
        )
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_singleframe_video_cli(tmp_path):
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import get_tooltip_segmentation_model
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, singleframe_optimizer
    from mfcnet_tpu.utils.checkpoint import save_checkpoint
    from mfcnet_tpu.utils.jitinit import jit_init

    make_synthetic_video(tmp_path / "vids" / "b.mp4", num_frames=5,
                         height=64, width=64)
    model = get_tooltip_segmentation_model("TernausNet16", 5, scale=0.1)
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
    )
    tx = singleframe_optimizer(make_schedule("Constant", 1e-4, 1, 1))
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)

    from mfcnet_tpu.cli.test_toolpose_segmentation_on_videos import main

    fps = main([
        "--videos_dir", str(tmp_path / "vids"),
        "--expt_savedir", str(tmp_path),
        "--expt_name", "sfvt",
        "--model_type", "TernausNet16",
        "--load_wts_model", str(ck),
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
    ])
    assert len(fps) == 1
    out = tmp_path / "sfvt" / "video_tracking_results"
    rows = np.loadtxt(out / "b_tracked.csv", delimiter=",")
    assert rows.shape == (5, 12)

    # on-device decode path produces a CSV of the same shape
    fps = main([
        "--videos_dir", str(tmp_path / "vids"),
        "--expt_savedir", str(tmp_path),
        "--expt_name", "sfvt_dev",
        "--model_type", "TernausNet16",
        "--load_wts_model", str(ck),
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
        "--decode", "device",
    ])
    assert len(fps) == 1
    rows_dev = np.loadtxt(
        tmp_path / "sfvt_dev" / "video_tracking_results" / "b_tracked.csv",
        delimiter=",",
    )
    assert rows_dev.shape == (5, 12)


def test_video_cli_parallel_videos(tmp_path):
    """--parallel_videos 2: two same-length videos tracked concurrently by
    one batched engine produce byte-identical CSVs to the sequential
    run."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.utils.checkpoint import save_checkpoint
    from mfcnet_tpu.utils.jitinit import jit_init
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, multiframe_optimizer

    for i, seed in enumerate((3, 4)):
        make_synthetic_video(
            tmp_path / "vids" / f"v{i}.mp4", num_frames=6,
            height=64, width=64, seed=seed,
        )

    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", 5, 3, scale=0.1
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, 3, 32, 32, 3), np.float32)
    )
    tx = multiframe_optimizer(make_schedule("Constant", 1e-4, 1, 1), 3,
                              False, False)
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)

    from mfcnet_tpu.cli.test_multiframe_segmentation_on_videos import main

    common = [
        "--videos_dir", str(tmp_path / "vids"),
        "--expt_savedir", str(tmp_path),
        "--model_type", "TernausNetMulti-Basic",
        "--load_wts_model", str(ck),
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
    ]
    fps_seq = main(common + ["--expt_name", "seq"])
    assert len(fps_seq) == 2
    fps_par = main(common + ["--expt_name", "par", "--parallel_videos", "2"])
    assert len(fps_par) == 1  # one group of 2

    for name in ("v0", "v1"):
        a = np.loadtxt(
            tmp_path / "seq" / "video_tracking_results"
            / f"{name}_tracked.csv", delimiter=",",
        )
        b = np.loadtxt(
            tmp_path / "par" / "video_tracking_results"
            / f"{name}_tracked.csv", delimiter=",",
        )
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_singleframe_video_cli_spatial(tmp_path):
    """--spatial_shards 4 on the single-frame video CLI: identical CSV to
    the unsharded run (height-sharded input, GSPMD-split convs, gather
    before decode)."""
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_video
    from mfcnet_tpu.models import get_tooltip_segmentation_model
    from mfcnet_tpu.train.schedule import make_schedule
    from mfcnet_tpu.train.state import TrainState, singleframe_optimizer
    from mfcnet_tpu.utils.checkpoint import save_checkpoint
    from mfcnet_tpu.utils.jitinit import jit_init

    make_synthetic_video(tmp_path / "vids" / "c.mp4", num_frames=5,
                         height=64, width=64, seed=8)
    model = get_tooltip_segmentation_model("TernausNet16", 5, scale=0.1)
    variables = jit_init(
        model, jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
    )
    tx = singleframe_optimizer(make_schedule("Constant", 1e-4, 1, 1))
    state = TrainState.create(
        model.apply, variables["params"], tx,
        variables.get("batch_stats", {}),
    )
    ck = save_checkpoint(tmp_path / "ck", 1, state)

    from mfcnet_tpu.cli.test_toolpose_segmentation_on_videos import main

    common = [
        "--videos_dir", str(tmp_path / "vids"),
        "--expt_savedir", str(tmp_path),
        "--model_type", "TernausNet16",
        "--load_wts_model", str(ck),
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--compute_dtype", "float32",
    ]
    main(common + ["--expt_name", "sf_ref"])
    main(common + ["--expt_name", "sf_sp", "--spatial_shards", "4"])
    a = np.loadtxt(
        tmp_path / "sf_ref" / "video_tracking_results" / "c_tracked.csv",
        delimiter=",",
    )
    b = np.loadtxt(
        tmp_path / "sf_sp" / "video_tracking_results" / "c_tracked.csv",
        delimiter=",",
    )
    np.testing.assert_array_equal(a, b)
