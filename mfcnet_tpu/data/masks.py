"""Image/mask/depth/flow file IO (reference: utils/dataloader_utils.py:8-85).

The mask composition (left/right pose-map PNG color channels -> class IDs)
reproduces the reference tables exactly:
  tooltip:  L tips (B or R channel > 0) -> 255, R tips -> 127; /127 -> {0,1,2}
  toolpose: L: B/R>0 -> 255, G>0 -> 191; R: B/R>0 -> 127, G>0 -> 63;
            /63 -> {0,1,2,3,4}
  endovis15: 5 joints x L/R via channel thresholds at 25-unit steps;
            /25 -> {0..10}
  binary:   binary_masks PNG / 255 -> {0,1}
"""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np

# Optional C++ fast path (native/mfcnet_native.cpp); falls back to NumPy.
_NATIVE = None
try:
    sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "native"))
    import mfcnet_native as _NATIVE  # type: ignore
except Exception:  # pragma: no cover - environment without the build
    _NATIVE = None
finally:
    sys.path.pop(0)


def native_available() -> bool:
    return _NATIVE is not None


def reload_native() -> bool:
    """Retry importing the C++ extension (e.g. after building it)."""
    global _NATIVE
    if _NATIVE is not None:
        return True
    import importlib

    importlib.invalidate_caches()
    sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "native"))
    try:
        import mfcnet_native

        _NATIVE = mfcnet_native
    except Exception:
        return False
    finally:
        sys.path.pop(0)
    return True


def load_image(path) -> np.ndarray:
    """BGR file -> RGB uint8 (reference: utils/dataloader_utils.py:24-28)."""
    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def load_depthmap(path, depth_dir: str = "depth_maps_depthanythingv2"):
    """DepthAnything-v2 PNG -> grayscale uint8
    (reference: utils/dataloader_utils.py:30-34)."""
    p = str(path).replace("images", depth_dir).replace("jpg", "png")
    dmap = cv2.imread(p)
    if dmap is None:
        raise FileNotFoundError(p)
    return cv2.cvtColor(dmap, cv2.COLOR_BGR2GRAY)


def load_optflow_map(path, optflow_dir: str, shape=(480, 640)):
    """Raw .flo floats -> (H, W, 2)
    (reference: utils/dataloader_utils.py:8-13 — skips the 2-float header
    and reshapes to a fixed 480x640)."""
    p = str(path).replace("images", optflow_dir).replace("jpg", "flo")
    flo = np.fromfile(p, dtype=np.float32)
    return flo[2:].reshape((*shape, 2))


def read_flo(path) -> np.ndarray:
    """Standard Middlebury .flo reader (magic + W,H header)."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or abs(magic[0] - 202021.25) > 1e-3:
            raise ValueError(f"bad .flo magic in {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path, flow: np.ndarray):
    """Write Middlebury .flo ([80,73,69,72] magic + W,H header; reference:
    scripts/generate_opticalflow_unflow.py:114-115)."""
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([80, 73, 69, 72], np.uint8).tofile(f)
        np.array([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def _read_pose_maps(path: str, folder: str):
    pl = str(path).replace("images", folder).replace("frame", "framel")
    pr = str(path).replace("images", folder).replace("frame", "framer")
    pl = pl.replace("jpg", "png")
    pr = pr.replace("jpg", "png")
    maskl = cv2.imread(pl)
    maskr = cv2.imread(pr)
    if maskl is None or maskr is None:
        raise FileNotFoundError(f"{pl} / {pr}")
    return maskl, maskr


def compose_mask(maskl: np.ndarray, maskr: np.ndarray,
                 prediction_task: str, use_native: bool = True) -> np.ndarray:
    """Pose-map pair (BGR uint8) -> class-ID mask. Uses the C++ single-pass
    kernel when built (native/mfcnet_native.cpp), else the NumPy cascade."""
    h, w = maskl.shape[:2]
    if use_native and _NATIVE is not None:
        fn = {
            "tooltip_segmentation": _NATIVE.compose_mask_tooltip,
            "toolpose_segmentation": _NATIVE.compose_mask_toolpose,
            "endovis15_segmentation": _NATIVE.compose_mask_endovis15,
        }.get(prediction_task)
        if fn is not None:
            out = fn(
                np.ascontiguousarray(maskl), np.ascontiguousarray(maskr),
                h, w,
            )
            return np.frombuffer(out, np.uint8).reshape(h, w).copy()
    return _compose_mask_numpy(maskl, maskr, prediction_task)


def _compose_mask_numpy(maskl, maskr, prediction_task: str) -> np.ndarray:
    if prediction_task == "tooltip_segmentation":
        mask = np.zeros(maskl.shape[:2], np.float64)
        if maskl.max():
            mask[maskl[:, :, 0] > 0] = 255
            mask[maskl[:, :, 2] > 0] = 255
        if maskr.max():
            mask[maskr[:, :, 0] > 0] = 127
            mask[maskr[:, :, 2] > 0] = 127
        return (mask / 127).astype(np.uint8)
    if prediction_task == "endovis15_segmentation":
        mask = np.zeros(maskl.shape[:2], np.float64)
        if maskl.max():
            mask[maskl[:, :, 0] > 0] = 250
            mask[maskl[:, :, 2] > 0] = 225
            mask[maskl[:, :, 1] == 255] = 200
            mask[maskl[:, :, 1] == 127] = 175
            mask[maskl[:, :, 1] == 63] = 150
        if maskr.max():
            mask[maskr[:, :, 0] > 0] = 125
            mask[maskr[:, :, 2] > 0] = 100
            mask[maskr[:, :, 1] == 255] = 75
            mask[maskr[:, :, 1] == 127] = 50
            mask[maskr[:, :, 1] == 63] = 25
        return (mask / 25).astype(np.uint8)
    if prediction_task == "toolpose_segmentation":
        mask = np.zeros(maskl.shape[:2], np.float64)
        if maskl.max():
            mask[maskl[:, :, 0] > 0] = 255
            mask[maskl[:, :, 2] > 0] = 255
            mask[maskl[:, :, 1] > 0] = 191
        if maskr.max():
            mask[maskr[:, :, 0] > 0] = 127
            mask[maskr[:, :, 2] > 0] = 127
            mask[maskr[:, :, 1] > 0] = 63
        return (mask / 63).astype(np.uint8)
    raise ValueError(f"Unknown prediction task: {prediction_task}")


def load_mask(path, prediction_task: str) -> np.ndarray:
    """Compose the class-ID mask from the on-disk pose maps (reference:
    utils/dataloader_utils.py:36-85).

    Note ``frame``->``framel``/``framer`` replacement applies to the whole
    path string, as in the reference.
    """
    if prediction_task == "binary":
        p = str(path).replace("images", "binary_masks").replace("jpg", "png")
        mask = cv2.imread(p, 0)
        if mask is None:
            raise FileNotFoundError(p)
        return (mask / 255).astype(np.uint8)
    folder = (
        "pose_maps_endovis"
        if prediction_task == "endovis15_segmentation"
        else "pose_maps"
    )
    maskl, maskr = _read_pose_maps(path, folder)
    return compose_mask(maskl, maskr, prediction_task)


def load_attmap(file_name_list, idx: int, frames_per_video: int,
                shape=(480, 640)):
    """TAPNet attention-map loader (reference: utils/dataloader_utils.py:15-22):
    zeros at each video's first frame, else the previous frame's attmap PNG."""
    if idx % frames_per_video == 0:
        return np.zeros(shape, np.float32)
    path = file_name_list[idx - 1]
    p = str(path).replace("images", "attmaps").replace("jpg", "png")
    att = cv2.imread(p, 0)
    if att is None:
        raise FileNotFoundError(p)
    return att.astype(np.float32) / 255.0
