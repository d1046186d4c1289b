"""ArtifactEngine — drive the video tracker from a frozen serving artifact.

``InferenceEngine``-compatible (reset/step_async/step), but the model is
the exported StableHLO artifact: no Flax model code, no checkpoint — the
deployment configuration. Works with both artifact kinds
(``--serving_mode incremental`` ring-buffer step, or the stateless
``full`` window forward) and reproduces the live engine's outputs
bit-for-bit for the host-decode path (pinned in tests/test_export.py).

Both keypoint-decode paths work: host (OpenCV exact-parity mode) and the
on-device decode (``cfg.decode='device'`` — the decode kernels are
generic framework ops, independent of model code/checkpoints, so the
deployment configuration keeps the 18-floats-per-frame transfer
discipline of the live engine). Single-stream by default;
``num_streams=B`` tracks B videos in lockstep through the one artifact
(symbolic batch dimension).
"""

from __future__ import annotations

import numpy as np

from mfcnet_tpu.serve.export import LoadedServing, load_exported, zero_state


class ArtifactEngine:
    def __init__(self, artifact, cfg, num_streams: int = 1):
        """``artifact``: path or ``LoadedServing``. ``cfg``: TrackerConfig;
        shapes must match the artifact header. Both ``cfg.decode`` modes
        are supported (aux outputs are heatmaps for 'host', decoded
        keypoint rows for 'device' — same contract as the live engine).

        ``num_streams``: track B videos in lockstep through the ONE
        artifact (its batch dimension is symbolic) — ``step_async`` then
        takes (B, H, W, 3) stacks and returns batched outputs, matching
        the live batched engine's contract (works with
        ``track_on_frame_streams``)."""
        import jax
        import jax.numpy as jnp

        loaded = (
            artifact if isinstance(artifact, LoadedServing)
            else load_exported(artifact)
        )
        meta = loaded.meta
        for key, want in (
            ("input_height", cfg.input_height),
            ("input_width", cfg.input_width),
            ("num_input_frames", cfg.num_input_frames),
            ("num_classes", cfg.num_classes),
            ("add_depth_inputs", cfg.add_depth_inputs),
            ("add_optflow_inputs", cfg.add_optflow_inputs),
        ):
            if key in meta and meta[key] != want:
                raise ValueError(
                    f"artifact {key}={meta[key]} != config {want}"
                )
        if meta.get("add_optflow_inputs") and (
            meta.get("serving_mode", "full") != "full"
        ):
            # a 'full' artifact computes flow in-graph from its own frame
            # window, so it tracks fine; there is no incremental+flow
            # artifact kind
            raise ValueError(
                "flow-in-graph artifacts are 'full'-forward only"
            )
        self.cfg = cfg
        self._loaded = loaded
        self._mode = meta.get("serving_mode", "full")
        self._jnp = jnp
        self.num_streams = max(1, int(num_streams))

        from mfcnet_tpu.track.outputs import outputs_from_probs

        @jax.jit
        def post(probs):
            # the ONE definition of probs -> (mask, aux), shared with
            # InferenceEngine._outputs so artifact and live serving
            # cannot drift (their row parity is test-pinned)
            return outputs_from_probs(probs, cfg)

        self._post = post
        self.reset()

    def reset(self):
        """Fresh stream(s): zero ring buffers / clear the frame window."""
        self._state = (
            zero_state(self._loaded.meta, batch=self.num_streams)
            if self._mode == "incremental" else None
        )
        self._count = 0
        self._frame_q = []
        self._depth_q = []

    def _batched(self, frame_u8, depth_u8):
        """Normalize inputs to (B, H, W[, 3]); remember if B=1 squeezed.

        Device-resident frames pass through without a host round trip:
        np.ndim reads the rank without copying and jnp.asarray is a no-op
        on a jax.Array (same discipline as InferenceEngine._put — the
        bench's --source device path depends on it)."""
        jnp = self._jnp
        squeeze = np.ndim(frame_u8) == 3
        frame = jnp.asarray(frame_u8)
        if squeeze:
            frame = frame[None]
        if not self.cfg.add_depth_inputs:
            return frame, None, squeeze
        if depth_u8 is None:
            depth = jnp.zeros(frame.shape[:3], jnp.uint8)
        else:
            depth = jnp.asarray(depth_u8)
            if squeeze:
                depth = depth[None]
        return frame, depth, squeeze

    def step_async(self, frame_u8, depth_u8=None):
        """(H, W, 3) uint8 frame in — or a (B, H, W, 3) lockstep stack
        for ``num_streams=B``; (mask, heats) device handles out (None
        during the T-1 frame warmup, like the live engine). B=1 outputs
        are squeezed, batched engines return (B, ...), matching the live
        engine's contract."""
        T = self.cfg.num_input_frames
        frame, depth, squeeze = self._batched(frame_u8, depth_u8)
        if self._mode == "incremental":
            inputs = [frame]
            if self.cfg.add_depth_inputs:
                inputs.append(depth)
            *self._state, probs = self._loaded(*self._state, *inputs)
            self._count += 1
            if self._count < T:
                return None
            return self._post(probs[0] if squeeze else probs)
        # full artifact: host-side rolling window, newest first
        # (reference :251-259)
        self._frame_q.append(frame)
        self._depth_q.append(depth)
        if len(self._frame_q) > T:
            self._frame_q.pop(0)
            self._depth_q.pop(0)
        if len(self._frame_q) < T:
            return None
        stack = self._jnp.stack(self._frame_q[::-1], axis=1)
        inputs = [stack]
        if self.cfg.add_depth_inputs:
            inputs.append(self._jnp.stack(self._depth_q[::-1], axis=1))
        probs = self._loaded(*inputs)
        return self._post(probs[0] if squeeze else probs)

    def step(self, frame_u8, depth_u8=None):
        out = self.step_async(frame_u8, depth_u8)
        if out is None:
            return None
        return tuple(np.asarray(v) for v in out)
