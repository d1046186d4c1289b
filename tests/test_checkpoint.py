"""Checkpointer durability invariants.

The epoch ``.json`` sidecar is the completeness marker for a checkpoint
(reference analogue: utils/model_utils.py writes torch.save atomically in
one file; with async backends we need an explicit marker). Pinned here:
the Orbax backend writes the sidecar at commit time (post-finalization
callback) — not lazily at the next wait()/save() — and
``latest_checkpoint`` never returns an entry whose sidecar is missing,
so a crash mid-write can never corrupt resume's start epoch.
"""

import json
import time
from types import SimpleNamespace

import numpy as np
import pytest

from mfcnet_tpu.utils.checkpoint import (
    AsyncCheckpointer,
    OrbaxCheckpointer,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def _tiny_state(step=3):
    return SimpleNamespace(
        params={"w": np.arange(4, dtype=np.float32)},
        batch_stats={},
        opt_state={"m": np.zeros(4, dtype=np.float32)},
        step=np.asarray(step),
    )


def test_latest_checkpoint_skips_sidecarless(tmp_path):
    state = _tiny_state()
    save_checkpoint(tmp_path, 1, state)
    # simulate an interrupted async write: data present, no sidecar
    (tmp_path / "model_002.msgpack").write_bytes(
        (tmp_path / "model_001.msgpack").read_bytes()
    )
    assert latest_checkpoint(tmp_path).stem == "model_001"
    # an empty dir of partials -> None
    (tmp_path / "model_001.json").unlink()
    (tmp_path / "model_001.msgpack").unlink()
    (tmp_path / "model_002.msgpack").unlink()
    assert latest_checkpoint(tmp_path) is None


def test_latest_checkpoint_orders_by_training_position(tmp_path):
    """The interrupt snapshot's fixed model_999 name must not shadow
    later real checkpoints: ordering is by the sidecar's training
    position (complete epoch e = (e+1, 0); mid-epoch = (e, batches)),
    not by filename stem."""
    state = _tiny_state()
    # mid-epoch interrupt snapshot at epoch 3
    save_checkpoint(tmp_path, 999, state,
                    extra={"epoch": 3, "batches_done": 5})
    # the run was resumed and completed through epoch 10
    save_checkpoint(tmp_path, 10, state)
    assert latest_checkpoint(tmp_path).stem == "model_010"
    # a mid-epoch snapshot INSIDE epoch 11 beats complete-epoch-10
    (tmp_path / "model_999.json").write_text(
        json.dumps({"epoch": 11, "batches_done": 2})
    )
    assert latest_checkpoint(tmp_path).stem == "model_999"
    # complete epoch 11 beats the mid-epoch-11 snapshot
    save_checkpoint(tmp_path, 11, state)
    assert latest_checkpoint(tmp_path).stem == "model_011"
    # numeric epochs beyond 999 don't fall to stem ordering
    save_checkpoint(tmp_path, 1000, state)
    assert latest_checkpoint(tmp_path).stem == "model_1000"


def test_orbax_sidecar_written_at_commit(tmp_path):
    """The sidecar must appear WITHOUT any wait()/subsequent save() call —
    the post-finalization callback writes it when the async commit
    finishes, so a crash right after commit leaves a loadable
    (sidecar-bearing) checkpoint."""
    ckptr = OrbaxCheckpointer()
    try:
        ckptr.save(tmp_path, 5, _tiny_state(step=7))
        sidecar = tmp_path / "model_005.json"
        deadline = time.time() + 60
        while not sidecar.exists() and time.time() < deadline:
            time.sleep(0.05)
        assert sidecar.exists(), "sidecar not written by commit callback"
        assert json.loads(sidecar.read_text())["epoch"] == 5
        payload, epoch = load_checkpoint(tmp_path / "model_005.orbax")
        assert epoch == 5 and payload["step"] == 7
        np.testing.assert_array_equal(
            payload["params"]["w"], np.arange(4, dtype=np.float32)
        )
    finally:
        ckptr.close()


def test_load_weights_only_payload_keeps_live_opt_state(tmp_path):
    """Interchange checkpoints (tools/parity_check.py --save) carry only
    params (+batch_stats); restoring them against a TrainState must keep
    the live optimizer state/batch_stats instead of failing
    from_state_dict against an empty dict (reference strict=False
    analogue, utils/model_utils.py:26-36)."""
    from flax import serialization

    path = tmp_path / "converted.msgpack"
    path.write_bytes(serialization.msgpack_serialize({
        "params": {"w": np.full(4, 2.0, np.float32)},
        "batch_stats": {}, "opt_state": {}, "step": 0,
    }))
    (tmp_path / "converted.json").write_text(json.dumps({"epoch": 9}))

    state = _tiny_state(step=3)
    payload, epoch = load_checkpoint(path, state)
    assert epoch == 9
    np.testing.assert_array_equal(
        payload["params"]["w"], np.full(4, 2.0, np.float32)
    )
    # live structures preserved where the payload is empty
    np.testing.assert_array_equal(
        payload["opt_state"]["m"], state.opt_state["m"]
    )
    assert payload["batch_stats"] == {}


def test_collective_flags():
    """Multi-host save gating contract (cli/train_multiframe_detection):
    Orbax saves are global collectives (every process must call save);
    msgpack saves are process-local (process 0 only)."""
    assert OrbaxCheckpointer.collective is True
    assert AsyncCheckpointer.collective is False
