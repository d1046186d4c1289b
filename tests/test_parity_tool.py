"""Self-test for tools/parity_check.py (VERDICT r2 item 4): the harness
that discharges the BASELINE accuracy gate the day real checkpoints are
available must itself be proven on an oracle-generated ``.pth``.

Saves a reference-format checkpoint blob ({model, optimizer, epoch} with
DataParallel 'module.' prefixes, utils/model_utils.py:6-12) from the
full-width reference-naming oracle, then runs the tool end to end:
auto-detect -> convert -> dual forward -> heatmap diff + tip decode
comparison -> gates."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent


def test_parity_check_tool_multiframe_roundtrip(tmp_path):
    from tests.torch_ref import TernausNetMultiBasicTorch

    torch.manual_seed(41)
    m = TernausNetMultiBasicTorch(5, 3).eval()
    # reference blob format incl. DataParallel prefixes
    sd = {f"module.{k}": v for k, v in m.state_dict().items()}
    ckpt = tmp_path / "model_003.pth"
    torch.save({"model": sd, "optimizer": {}, "epoch": 3}, ckpt)

    out = tmp_path / "report.json"
    saved = tmp_path / "converted.msgpack"
    artifact = tmp_path / "m.stablehlo"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "parity_check.py"),
         str(ckpt), "--height", "64", "--width", "64",
         "--max_frames", "4", "--json", str(out), "--save", str(saved),
         "--export_artifact", str(artifact)],
        capture_output=True, text=True, timeout=560,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads(out.read_text())
    assert rep["arch"] == "TernausNetMulti-Basic"
    assert rep["classes"] == 5 and rep["num_frames_window"] == 3
    assert rep["epoch"] == 3
    assert rep["max_abs_diff"] <= 1e-3
    assert rep["identical_detection_pattern"] is True
    assert rep["tip_rmse_px"] <= 0.5
    assert rep["within_gates"] is True

    # --save wrote a CLI-loadable flax msgpack checkpoint + epoch sidecar
    from mfcnet_tpu.utils.checkpoint import load_checkpoint

    payload, epoch = load_checkpoint(saved)
    assert epoch == 3
    assert "base" in payload["params"]
    assert "multiframe_net" in payload["params"]
    assert "batch_stats" in payload

    # --export_artifact: reference .pth -> deployable artifact in one
    # command; loads without model code and yields valid probabilities
    from mfcnet_tpu.serve import load_exported

    loaded = load_exported(artifact)
    assert loaded.meta["model_type"] == "TernausNetMulti-Basic"
    assert loaded.meta["epoch"] == 3
    assert loaded.meta["serving_mode"] == "full"
    frames = np.zeros((1, 3, 64, 64, 3), np.uint8)
    probs = np.asarray(loaded(frames))
    assert probs.shape == (1, 64, 64, 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=2e-2)  # bf16
