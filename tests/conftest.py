"""Test config: run on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes; pytest imports conftest first.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The environment's axon TPU plugin force-appends itself to jax_platforms;
# override after import so tests always run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

from mfcnet_tpu.utils.cachedir import machine_cache_dir  # noqa: E402

# Machine-keyed: a cache written by a different machine's XLA:CPU AOT
# compile can SIGILL this one (see utils/cachedir.py).
jax.config.update(
    "jax_compilation_cache_dir", machine_cache_dir("/tmp/jax_test_cache")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.4)
