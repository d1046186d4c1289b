"""Native C++ mask composition vs NumPy reference cascade."""

import numpy as np
import pytest

from mfcnet_tpu.data import masks as M

def _ensure_native() -> bool:
    """Build the extension on demand so a fresh checkout still runs
    these tests (one ~10 s g++ compile, then cached in native/)."""
    if M.native_available():
        return True
    import subprocess
    import sys
    from pathlib import Path

    native_dir = Path(M.__file__).resolve().parents[2] / "native"
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=native_dir, capture_output=True, timeout=600, check=True,
        )
    except Exception:
        return False
    return M.reload_native()


pytestmark = pytest.mark.skipif(
    not _ensure_native(), reason="native extension not built (no g++?)"
)

RNG = np.random.default_rng(0)


def _random_posemap(h, w, p_zero=0.0):
    if RNG.random() < p_zero:
        return np.zeros((h, w, 3), np.uint8)
    pm = np.zeros((h, w, 3), np.uint8)
    # sparse blobs with the channel values the tables care about
    for _ in range(6):
        y, x = RNG.integers(0, h - 4), RNG.integers(0, w - 4)
        ch = RNG.integers(0, 3)
        val = RNG.choice([63, 127, 200, 255])
        pm[y : y + 4, x : x + 4, ch] = val
    return pm


@pytest.mark.parametrize(
    "task",
    ["tooltip_segmentation", "toolpose_segmentation",
     "endovis15_segmentation"],
)
def test_native_matches_numpy(task):
    for trial in range(20):
        h, w = 37, 53
        maskl = _random_posemap(h, w, p_zero=0.2)
        maskr = _random_posemap(h, w, p_zero=0.2)
        a = M.compose_mask(maskl, maskr, task, use_native=True)
        b = M.compose_mask(maskl, maskr, task, use_native=False)
        np.testing.assert_array_equal(a, b, err_msg=f"{task} trial {trial}")


def test_window_gather():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(M.__file__).resolve().parents[2] / "native"))
    import mfcnet_native

    frames = [np.full((4, 5, 3), i, np.uint8) for i in range(3)]
    out = mfcnet_native.window_gather_u8(
        [np.ascontiguousarray(f) for f in frames], 3, 4 * 5 * 3
    )
    arr = np.frombuffer(out, np.uint8).reshape(3, 4, 5, 3)
    for i in range(3):
        np.testing.assert_array_equal(arr[i], frames[i])
