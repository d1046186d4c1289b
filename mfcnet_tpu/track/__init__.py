"""Keypoint decoding and video tracking."""

from mfcnet_tpu.track.tracker import (
    InferenceEngine,
    KeypointTracker,
    TrackerConfig,
    track_on_frame_streams,
    track_on_frames,
    track_on_video,
)

__all__ = [
    "InferenceEngine",
    "KeypointTracker",
    "TrackerConfig",
    "track_on_frame_streams",
    "track_on_frames",
    "track_on_video",
]
