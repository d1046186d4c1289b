"""Flagship end-to-end system test: train MFCNet on synthetic data through
the real CLI, then track a synthetic video — the model must actually learn
(loss halves, foreground dice rises) and the tracker must detect the drawn
instruments."""

import json

import numpy as np


def test_train_then_track_detects_instruments(tmp_path):
    from mfcnet_tpu.cli.train_multiframe_detection import main
    from mfcnet_tpu.data.synthetic import (
        make_jigsaws_like_dataset,
        make_synthetic_video,
    )
    from mfcnet_tpu.models import get_multiframe_segmentation_model
    from mfcnet_tpu.track.tracker import TrackerConfig, track_on_video

    root = make_jigsaws_like_dataset(
        tmp_path / "data", num_videos=2, frames_per_video=12,
        height=64, width=64, seed=3,
    )
    state = main([
        "--data_dir", str(root), "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path / "runs"), "--expt_name", "learn",
        "--batch_size", "4", "--num_workers", "2",
        "--num_epochs", "8", "--save_freq", "8", "--print_freq", "10",
        "--lr", "3e-3", "--scheduler", "Constant",
        "--loss_fns", "nll", "soft_jaccard", "--loss_wts", "0.7", "0.3",
        "--class_weights", "1", "50", "50", "50", "50",
        "--input_height", "64", "--input_width", "64",
        "--model_type", "TernausNetMulti-Basic", "--model_scale", "0.25",
        "--train_base_model", "true", "--seed", "0",
    ])

    scalars = [
        json.loads(line)
        for line in (tmp_path / "runs" / "learn" / "logs" /
                     "scalars.jsonl").read_text().splitlines()
    ]
    train_losses = [s["value"] for s in scalars
                    if s["tag"] == "Training/Loss"]
    assert train_losses[-1] < 0.6 * train_losses[0], train_losses

    model = get_multiframe_segmentation_model(
        "TernausNetMulti-Basic", 5, 3, scale=0.25
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    video, gt = make_synthetic_video(
        tmp_path / "v" / "demo.mp4", num_frames=12, height=64, width=64,
        seed=3, return_keypoints=True,
    )
    cfg = TrackerConfig(
        num_input_frames=3, num_classes=5, input_height=64, input_width=64,
        dtype="float32", overlay=False,
    )
    rows, _ = track_on_video(video, model, variables, cfg, tmp_path / "out")
    base_detections = (
        np.isfinite(rows[:, 8]).sum() + np.isfinite(rows[:, 10]).sum()
    )
    tip_detections = (
        np.isfinite(rows[:, 0]).sum() + np.isfinite(rows[:, 4]).sum()
    )
    # 12 frames, 2 instruments; warmup skips the first 2 frames
    assert base_detections >= 8, rows
    assert tip_detections >= 5, rows

    # quantitative accuracy vs the synthetic ground truth (the BASELINE
    # tip-RMSE metric end to end): measured ~3-4px tips / ~1.4px bases
    # after 8 epochs at 64x64; bounds pinned with margin
    def tip_errors(tcol):
        errs = []
        for f in range(rows.shape[0]):
            pred, g = rows[f, tcol:tcol + 4], gt[f, tcol:tcol + 4]
            if not np.isfinite(pred).all():
                continue
            p1, p2, g1, g2 = pred[:2], pred[2:], g[:2], g[2:]
            a = np.hypot(*(p1 - g1)) + np.hypot(*(p2 - g2))
            b = np.hypot(*(p1 - g2)) + np.hypot(*(p2 - g1))
            errs.append(min(a, b) / 2)
        return np.asarray(errs)

    for tcol in (0, 4):
        errs = tip_errors(tcol)
        assert len(errs) >= 4 and errs.mean() <= 6.5, (tcol, errs)
    for bcol in (8, 10):
        d = rows[:, bcol:bcol + 2] - gt[:, bcol:bcol + 2]
        d = np.linalg.norm(d[np.isfinite(d).all(axis=1)], axis=1)
        assert len(d) >= 8 and d.mean() <= 4.0, (bcol, d)
