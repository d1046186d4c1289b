"""Keypoint decoding and video tracking."""
