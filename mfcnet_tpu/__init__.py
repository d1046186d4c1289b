"""mfcnet_tpu — TPU-native surgical tool-tip / keypoint tracking framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of
``shadowfax11/mfcnet-tracker`` (Ghanekar et al., IEEE ISBI 2025): per-frame
semantic-segmentation backbones, the MFCNet multi-frame temporal-fusion head
(with optional monocular-depth and optical-flow input channels and
flow-warped alignment), optical-flow providers, device-side preprocessing,
jitted/sharded train + eval loops, and on-device keypoint decoding.

Design notes (TPU-first, not a port):
  * NHWC image layout everywhere (XLA/TPU native); the torch reference is NCHW.
  * Frames are a single ``(B, T, H, W, C)`` array; the per-frame backbone runs
    one batched forward over ``B*T`` instead of a Python loop over frames
    (reference: models/multiframe_model.py:224-237 loops per frame).
  * All hot paths live under ``jax.jit``; data parallelism is expressed with
    ``jax.sharding.Mesh`` + NamedSharding, with gradient/batch-stat psum over
    the ``data`` mesh axis (reference used single-process nn.DataParallel).
  * The UnFlow correlation cost volume (reference:
    models/unflow_correlation.py) is provided as a Pallas TPU kernel with a
    custom VJP, plus an XLA reference implementation.
"""

__version__ = "0.1.0"
