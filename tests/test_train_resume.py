"""Preemption-safe mid-epoch resume.

The interrupt snapshot carries the MID-EPOCH state + completed-batch
count (engine.TrainInterrupted), the loader replays a (seed, epoch)-keyed
permutation with a batch fast-forward (DataLoader.set_epoch), and
per-batch augmentation keys are a pure function of the batch's position
(fold_in) — so interrupt + resume reproduces the uninterrupted run
EXACTLY. The reference only snapshots whole epochs and restarts the
interrupted one (train_multiframe_detection.py:161-183).
"""

import json
import logging

import numpy as np
import pytest


class _ArrayDataset:
    def __init__(self, frames, masks):
        self.frames, self.masks = frames, masks

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i):
        return {"frames": self.frames[i], "mask": self.masks[i]}


class _InterruptAfter:
    """Loader proxy that raises KeyboardInterrupt after k batches — a
    deterministic stand-in for Ctrl-C / preemption."""

    def __init__(self, loader, k):
        self.loader, self.k = loader, k

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, *a, **kw):
        return self.loader.set_epoch(*a, **kw)

    def __iter__(self):
        for i, b in enumerate(self.loader):
            if i == self.k:
                raise KeyboardInterrupt
            yield b


def _setup(seed=0):
    import jax
    import optax

    from mfcnet_tpu.data.loader import DataLoader
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.train.state import TrainState
    from mfcnet_tpu.train.steps import make_multiframe_train_step
    from mfcnet_tpu.utils.jitinit import jit_init

    h, w, c, t = 32, 32, 5, 3
    rng = np.random.default_rng(seed)
    n = 8
    ds = _ArrayDataset(
        rng.standard_normal((n, t, h, w, 3)).astype(np.float32),
        rng.integers(0, c, (n, h, w)).astype(np.int32),
    )
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=1,
                        seed=7)
    base = TernausNet16(
        num_classes=c, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=c, num_frames=t, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(1), np.zeros((1, t, h, w, 3), np.float32)
    )
    step = make_multiframe_train_step(
        model, ["nll"], [1.0], c, class_weights=[1.0] * c,
        train_base_model=True, donate=False,
    )

    def fresh():
        return TrainState.create(
            model.apply, variables["params"], optax.sgd(1e-2),
            variables.get("batch_stats", {}),
        )

    def aug(batch, k):
        noise = jax.random.normal(k, batch["frames"].shape) * 0.01
        return {"frames": batch["frames"] + noise, "mask": batch["mask"]}

    return loader, fresh, step, aug


def test_mid_epoch_interrupt_and_resume_exact():
    import jax

    from mfcnet_tpu.train.engine import TrainInterrupted, train_one_epoch

    loader, fresh, step, aug = _setup()
    log = logging.getLogger("resume_test")
    ek = jax.random.PRNGKey(42)

    # A: the uninterrupted epoch
    loader.set_epoch(0)
    s_full, _ = train_one_epoch(
        loader, 0, fresh(), step, aug, ek, log
    )

    # B: interrupt after 2 of 4 batches, then resume with skip
    loader.set_epoch(0)
    with pytest.raises(TrainInterrupted) as exc:
        train_one_epoch(
            _InterruptAfter(loader, 2), 0, fresh(), step, aug, ek, log
        )
    s_mid, done = exc.value.state, exc.value.batches_done
    assert done == 2

    loader.set_epoch(0, skip_batches=done)
    s_res, _ = train_one_epoch(
        loader, 0, s_mid, step, aug, ek, log, skip_batches=done
    )

    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_full.params)),
        jax.tree.leaves(jax.device_get(s_res.params)),
    ):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_full.batch_stats)),
        jax.tree.leaves(jax.device_get(s_res.batch_stats)),
    ):
        np.testing.assert_array_equal(a, b)
    assert int(s_res.step) == int(s_full.step)


def test_set_epoch_makes_shuffle_restart_invariant():
    """Two freshly constructed loaders (as after a process restart) give
    the same epoch-k permutation with set_epoch, regardless of how many
    epochs either has iterated before."""
    from mfcnet_tpu.data.loader import DataLoader

    rng = np.random.default_rng(0)
    ds = _ArrayDataset(
        rng.standard_normal((10, 1)).astype(np.float32),
        rng.integers(0, 2, (10, 1)).astype(np.int32),
    )

    def batches(loader):
        return [b["frames"][:, 0].tolist() for b in loader]

    l1 = DataLoader(ds, 2, shuffle=True, num_workers=1, seed=3)
    for e in range(3):  # iterate epochs 0..2
        l1.set_epoch(e)
        out1 = batches(l1)
    l2 = DataLoader(ds, 2, shuffle=True, num_workers=1, seed=3)
    l2.set_epoch(2)  # fresh process, straight to epoch 2
    assert batches(l2) == out1
    # skip fast-forward drops exactly the first k batches
    l2.set_epoch(2, skip_batches=2)
    assert batches(l2) == out1[2:]


def test_cli_resume_continues_after_complete_epoch(tmp_path):
    """Resuming from a complete-epoch checkpoint continues at the NEXT
    epoch instead of re-training the saved one (the reference restarts
    AT the saved epoch, but it never restores optimizer state —
    utils/model_utils.py:14-39 — so re-training there is a fresh run,
    while here it would double-train the epoch). Also covers the
    validate-interrupt snapshot path, whose sidecar records the real
    completed epoch with no batches_done."""
    from mfcnet_tpu.cli.train_multiframe_detection import main
    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset
    from mfcnet_tpu.utils.checkpoint import latest_checkpoint

    data_root = make_jigsaws_like_dataset(
        tmp_path / "data", num_videos=1, frames_per_video=4,
        height=64, width=64,
    )
    common = [
        "--data_dir", str(data_root),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path / "runs"),
        "--expt_name", "complete_resume",
        "--batch_size", "2",
        "--num_workers", "1",
        "--save_freq", "10",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--class_weights", "1", "1", "1", "1", "1",
    ]
    # epochs 0..1, 2 batches each -> step 4; final checkpoint epoch 1
    s1 = main(common + ["--num_epochs", "1"])
    assert int(s1.step) == 4
    ck = latest_checkpoint(tmp_path / "runs" / "complete_resume" / "ckpts")
    assert json.loads(ck.with_suffix(".json").read_text()) == {"epoch": 1}
    # extend to num_epochs=2: exactly epoch 2 trains (2 more steps);
    # the old max(start, epoch) would re-train epoch 1 too (4 steps)
    s2 = main(common + ["--num_epochs", "2", "--resume", "true"])
    assert int(s2.step) == int(s1.step) + 2


def test_cli_resumes_mid_epoch_from_snapshot(tmp_path):
    """The train CLI reads batches_done from the snapshot sidecar and
    runs exactly the remaining batches of the interrupted epoch."""
    from mfcnet_tpu.cli.train_multiframe_detection import main
    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset
    from mfcnet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    data_root = make_jigsaws_like_dataset(
        tmp_path / "data", num_videos=1, frames_per_video=4,
        height=64, width=64,
    )
    common = [
        "--data_dir", str(data_root),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path / "runs"),
        "--expt_name", "midresume",
        "--batch_size", "2",
        "--num_workers", "1",
        "--save_freq", "10",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--class_weights", "1", "1", "1", "1", "1",
    ]
    s1 = main(common + ["--num_epochs", "1"])
    # epochs 0..1, 4 train samples / batch 2 = 2 batches per epoch
    assert int(s1.step) == 4
    # forge the preemption snapshot: epoch 1 interrupted after 1 batch
    ckdir = tmp_path / "runs" / "midresume" / "ckpts"
    save_checkpoint(ckdir, 999, s1,
                    extra={"epoch": 1, "batches_done": 1})
    meta = json.loads((ckdir / "model_999.json").read_text())
    assert meta == {"epoch": 1, "batches_done": 1}

    s2 = main(common + [
        "--num_epochs", "2", "--resume", "true",
        "--load_wts_model", str(ckdir / "model_999.msgpack"),
    ])
    # resumes at epoch 1 skipping 1 batch (1 step) + full epoch 2
    # (2 steps) on top of the snapshot's 4
    assert int(s2.step) == int(s1.step) + 1 + 2

def test_cli_resume_batches_done_zero_reenters_epoch(tmp_path):
    """A preemption snapshot taken BEFORE the first batch of an epoch
    completes (batches_done=0 — a long window that includes first-step
    compilation) must resume INSIDE that epoch, not skip it. The
    mid-epoch signal is the sidecar KEY's presence; the old truthiness
    check treated bd=0 like a complete-epoch checkpoint and silently
    skipped the entire untrained epoch."""
    from mfcnet_tpu.cli.train_multiframe_detection import main
    from mfcnet_tpu.data.synthetic import make_jigsaws_like_dataset
    from mfcnet_tpu.utils.checkpoint import save_checkpoint

    data_root = make_jigsaws_like_dataset(
        tmp_path / "data", num_videos=1, frames_per_video=4,
        height=64, width=64,
    )
    common = [
        "--data_dir", str(data_root),
        "--dataset", "JIGSAWS",
        "--expt_savedir", str(tmp_path / "runs"),
        "--expt_name", "bd0resume",
        "--batch_size", "2",
        "--num_workers", "1",
        "--save_freq", "10",
        "--input_height", "32",
        "--input_width", "32",
        "--model_scale", "0.1",
        "--class_weights", "1", "1", "1", "1", "1",
    ]
    s1 = main(common + ["--num_epochs", "1"])
    assert int(s1.step) == 4  # epochs 0..1, 2 batches each
    # forge: epoch 2 interrupted before its first batch finished
    ckdir = tmp_path / "runs" / "bd0resume" / "ckpts"
    save_checkpoint(ckdir, 999, s1,
                    extra={"epoch": 2, "batches_done": 0})

    s2 = main(common + [
        "--num_epochs", "2", "--resume", "true",
        "--load_wts_model", str(ckdir / "model_999.msgpack"),
    ])
    # epoch 2 trains in full (2 steps); the truthiness bug would start
    # at epoch 3 > num_epochs and train nothing
    assert int(s2.step) == int(s1.step) + 2
