"""Golden product-output artifact: the N x 12 tracking CSV.

Byte-compares the CSV produced by the full tracking pipeline (seeded
synthetic frames -> seeded-init model -> inference -> keypoint decode ->
tracker -> ``np.savetxt``) against committed golden files, for both
decode paths and both engine modes. Property tests can't catch silent
drift in the decode/tracker chain (union decode, tie fallback, track
assignment all churned in round 3); a byte-exact pin can. Output
contract: reference test_multiframe_segmentation_on_videos_v3.py:313-315
(N rows x 12 keypoint columns, NaN = missing).

Regenerate after an INTENDED output change:
    REGEN_GOLDEN=1 python -m pytest tests/test_golden_csv.py -q
then review the diff and commit.
"""

import os
from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"
N_FRAMES, H, W, T, C = 8, 64, 32, 3, 5


def _track(tmp_path, mode, decode):
    import jax

    from mfcnet_tpu.data.synthetic import make_synthetic_frames
    from mfcnet_tpu.models import MultiFrameSegmenter, TernausNet16
    from mfcnet_tpu.track.tracker import (
        TrackerConfig,
        track_on_frames,
    )
    from mfcnet_tpu.utils.jitinit import jit_init

    base = TernausNet16(
        num_classes=C, num_filters=4,
        stage_convs=((4,), (8,), (8, 8), (16, 16), (16, 16)),
    )
    model = MultiFrameSegmenter(
        base=base, num_classes=C, num_frames=T, variant="basic",
        base_output="exp",
    )
    variables = jit_init(
        model, jax.random.PRNGKey(42),
        np.zeros((1, T, H, W, 3), np.float32),
    )
    frames = make_synthetic_frames(
        num_frames=N_FRAMES, height=H, width=W, seed=13
    )
    cfg = TrackerConfig(
        num_input_frames=T, num_classes=C, input_height=H,
        input_width=W, dtype="float32", mode=mode, decode=decode,
    )
    out = tmp_path / f"{mode}_{decode}"
    track_on_frames(frames, model, variables, cfg, out, name="golden")
    return out / "golden_tracked.csv"


@pytest.mark.parametrize("mode,decode", [
    ("incremental", "host"),
    ("incremental", "device"),
    ("full", "host"),
    ("full", "device"),
])
def test_tracking_csv_matches_golden(tmp_path, mode, decode):
    got_path = _track(tmp_path, mode, decode)
    got = got_path.read_bytes()
    golden_path = GOLDEN_DIR / f"tracked_{mode}_{decode}.csv"

    if os.environ.get("REGEN_GOLDEN"):
        GOLDEN_DIR.mkdir(exist_ok=True)
        golden_path.write_bytes(got)
        rows = np.loadtxt(got_path, delimiter=",").reshape(-1, 12)
        # a golden file of pure NaN pins nothing — fail loudly at
        # regeneration time rather than committing a vacuous artifact
        assert np.isfinite(rows[T - 1:]).sum() >= 4, (
            "regenerated golden has (almost) no detections"
        )
        pytest.skip(f"regenerated {golden_path}")

    assert golden_path.exists(), (
        f"missing golden file {golden_path}; generate with "
        "REGEN_GOLDEN=1 python -m pytest tests/test_golden_csv.py"
    )
    want = golden_path.read_bytes()
    if got != want:
        a = np.loadtxt(got_path, delimiter=",").reshape(-1, 12)
        b = np.loadtxt(golden_path, delimiter=",").reshape(-1, 12)
        diff = np.nanmax(np.abs(np.nan_to_num(a) - np.nan_to_num(b)))
        raise AssertionError(
            f"tracking CSV drifted from golden ({mode}/{decode}): "
            f"max |delta| = {diff}; if the change is INTENDED, "
            "regenerate with REGEN_GOLDEN=1 and commit the diff"
        )
