"""Machine-keyed compilation-cache dirs (utils/cachedir.py)."""

import re

from mfcnet_tpu.utils.cachedir import machine_cache_dir


def test_machine_cache_dir_stable_and_keyed():
    a = machine_cache_dir("/tmp/jax_test_cache")
    b = machine_cache_dir("/tmp/jax_test_cache")
    assert a == b, "fingerprint must be deterministic within one machine"
    assert a.startswith("/tmp/jax_test_cache-")
    assert re.fullmatch(r"[0-9a-f]{12}", a.rsplit("-", 1)[1])
    # different base -> different dir, same fingerprint suffix
    c = machine_cache_dir("/tmp/jax_bench_cache")
    assert c.rsplit("-", 1)[1] == a.rsplit("-", 1)[1]
    assert c != a


def test_conftest_uses_machine_keyed_cache():
    import jax

    d = jax.config.jax_compilation_cache_dir
    assert d == machine_cache_dir("/tmp/jax_test_cache")
