"""Packed zero-decode dataset parity (mfcnet_tpu/data/packed.py).

The pack must be a pure representation change: every sample (frames
window incl. the video-boundary clamp, mask, depth) identical to the
live PNG/JPEG-decoding MultiFrameDataset over the same files.
"""

import json
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset

    root = tmp_path_factory.mktemp("packed_ds")
    make_jigsaws_like_dataset(
        root, num_videos=2, frames_per_video=5, height=64, width=64
    )
    # depth maps for the +depth pack (load_depthmap reads
    # depth_maps_depthanythingv2/<name>.png as grayscale)
    rng = np.random.default_rng(7)
    for img in root.rglob("images/*.jpg"):
        ddir = img.parent.parent / "depth_maps_depthanythingv2"
        ddir.mkdir(exist_ok=True)
        d = rng.integers(0, 256, (64, 64), dtype=np.uint8)
        cv2.imwrite(str(ddir / (img.stem + ".png")), d)
    return root


def _files(tree, mode="training"):
    from mfcnet_tpu.data.files import get_dataset_filenames

    return get_dataset_filenames("JIGSAWS", tree, mode, -1)


def test_packed_equals_live(tree, tmp_path):
    from mfcnet_tpu.data.dataset import MultiFrameDataset
    from mfcnet_tpu.data.packed import PackedMultiFrameDataset, pack_files

    train_files, _ = _files(tree)
    live = MultiFrameDataset(
        train_files, "toolpose_segmentation", 3, add_depth_inputs=True
    )
    index = pack_files(
        train_files, "toolpose_segmentation", tmp_path / "pack",
        add_depth_inputs=True,
    )
    packed = PackedMultiFrameDataset(
        tmp_path / "pack", 3, add_depth_inputs=True
    )
    assert len(packed) == len(live) == index["n"]
    # two videos in the file list -> the windows at the video boundary
    # exercise the clamp; every sample must match bit-for-bit
    for i in range(len(live)):
        assert packed.window_indices(i) == live.window_indices(i)
        a, b = packed[i], live[i]
        np.testing.assert_array_equal(a["frames"], b["frames"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
        np.testing.assert_array_equal(a["depth"], b["depth"])


def test_packed_rejects_bad_inputs(tree, tmp_path):
    from mfcnet_tpu.data.packed import PackedMultiFrameDataset, pack_files

    train_files, _ = _files(tree)
    pack_files(train_files, "toolpose_segmentation", tmp_path / "nd")
    # depth requested but packed without it
    with pytest.raises(ValueError, match="depth"):
        PackedMultiFrameDataset(tmp_path / "nd", 3, add_depth_inputs=True)
    # not a pack dir
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "index.json").write_text(json.dumps({"format": "nope"}))
    with pytest.raises(ValueError, match="packed"):
        PackedMultiFrameDataset(bad, 3)
    # task mismatch must fail loudly, not train on wrong labels
    with pytest.raises(ValueError, match="prediction_task"):
        PackedMultiFrameDataset(
            tmp_path / "nd", 3,
            expect={"prediction_task": "tooltip_segmentation"},
        )


def test_loader_rejects_mismatched_pack(tree, tmp_path):
    from mfcnet_tpu.data.loader import get_data_loader
    from mfcnet_tpu.data.packed import pack_dataset_splits

    pack_dataset_splits(
        "JIGSAWS", tree, "training", "toolpose_segmentation",
        tmp_path / "packs",
    )
    with pytest.raises(ValueError, match="prediction_task"):
        get_data_loader(
            "JIGSAWS", tree, "training", "tooltip_segmentation", 3, 2,
            packed_dir=tmp_path / "packs",
        )
    with pytest.raises(ValueError, match="fold_index"):
        get_data_loader(
            "JIGSAWS", tree, "training", "toolpose_segmentation", 3, 2,
            fold_index=2, packed_dir=tmp_path / "packs",
        )


def test_pack_tool_and_loader_parity(tree, tmp_path):
    """tools/pack_dataset.py CLI + get_data_loader(packed_dir=...) yield
    the same batches as the live loader (same seed => same shuffle)."""
    from pack_dataset import main as pack_main

    from mfcnet_tpu.data.loader import get_data_loader

    rc = pack_main([
        "--data_dir", str(tree),
        "--dataset", "JIGSAWS",
        "--mode", "training",
        "--prediction_task", "toolpose_segmentation",
        "--out", str(tmp_path / "packs"),
    ])
    assert rc == 0
    common = dict(
        dataset_name="JIGSAWS", data_dir=tree, mode="training",
        prediction_task="toolpose_segmentation", num_input_frames=3,
        batch_size=2, num_workers=2, seed=3,
    )
    tr_live, va_live = get_data_loader(**common)
    tr_pack, va_pack = get_data_loader(
        **common, packed_dir=tmp_path / "packs"
    )
    for (a, b) in zip(tr_live, tr_pack):
        np.testing.assert_array_equal(a["frames"], b["frames"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
    for (a, b) in zip(va_live, va_pack):
        np.testing.assert_array_equal(a["frames"], b["frames"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_testing_mode_pack_and_loader(tree, tmp_path):
    from mfcnet_tpu.data.loader import get_data_loader
    from mfcnet_tpu.data.packed import pack_dataset_splits

    out = pack_dataset_splits(
        "JIGSAWS", tree, "testing", "toolpose_segmentation",
        tmp_path / "packs",
    )
    assert list(out) == ["test"]
    common = dict(
        dataset_name="JIGSAWS", data_dir=tree, mode="testing",
        prediction_task="toolpose_segmentation", num_input_frames=3,
        batch_size=1, num_workers=1,
    )
    _, live = get_data_loader(**common)
    _, packed = get_data_loader(**common, packed_dir=tmp_path / "packs")
    n = 0
    for a, b in zip(live, packed):
        np.testing.assert_array_equal(a["frames"], b["frames"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
        n += 1
    assert n == out["test"]["n"]


def test_train_cli_packed(tree, tmp_path):
    """One training epoch straight off the pack (--packed_dir)."""
    from pack_dataset import main as pack_main

    from mfcnet_tpu.cli.train_multiframe_detection import main

    pack_main([
        "--data_dir", str(tree),
        "--dataset", "JIGSAWS",
        "--mode", "training",
        "--prediction_task", "toolpose_segmentation",
        "--out", str(tmp_path / "packs"),
    ])
    main([
        "--dataset", "JIGSAWS",
        "--data_dir", str(tree),
        "--packed_dir", str(tmp_path / "packs"),
        "--expt_savedir", str(tmp_path),
        "--expt_name", "pk",
        "--model_type", "TernausNetMulti-Basic",
        "--model_scale", "0.1",
        "--input_height", "32",
        "--input_width", "32",
        "--batch_size", "2",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--num_workers", "1",
    ])
    assert (tmp_path / "pk" / "ckpts" / "model_001.msgpack").exists()
