"""Machine-keyed JAX compilation-cache directories.

The persistent compilation cache stores XLA:CPU AOT executables compiled
for the *build* machine's CPU features. /tmp can outlive the VM image in
this environment, so a cache written on one machine may be loaded on
another with a different feature set — XLA logs
``cpu_aot_loader ... could lead to execution errors such as SIGILL`` and,
in the worst case, the process dies with SIGILL mid-test. Keying the
cache path by a fingerprint of the host CPU's feature flags makes each
machine populate (and hit) only its own cache; the cost is one cold
compile per distinct machine.
"""

import hashlib
import platform


def machine_cache_dir(base: str) -> str:
    """``base`` + a stable fingerprint of this machine's CPU features.

    E.g. ``machine_cache_dir("/tmp/jax_test_cache")`` ->
    ``/tmp/jax_test_cache-1a2b3c4d5e6f``.
    """
    # Hash the model-name and bugs lines TOO, not just the ISA flags:
    # XLA:CPU bakes model-dependent tuning pseudo-features (e.g.
    # +prefer-no-gather from the Downfall/GDS mitigation, visible only
    # in cpuinfo's ``bugs`` line) into the AOT executable, so two
    # machines with identical flag lines can still mismatch.
    fingerprint = platform.machine()
    try:
        parts = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name",
                                    "bugs")):
                    parts.append(line.strip())
                    if len(parts) == 3:
                        break
        if parts:
            fingerprint = "|".join(sorted(parts))
    except OSError:
        fingerprint += platform.platform()
    # ... and STILL that is not enough: round-3 artifacts show
    # cpu_aot_loader feature mismatches (+prefer-no-gather) between two
    # VMs whose cpuinfo lines hash identically — XLA's tuning
    # pseudo-features can depend on state cpuinfo doesn't expose
    # (microcode / mitigation runtime status). Key by boot id too:
    # within one boot the cache is reused (the case that matters —
    # repeated pytest/bench/dryrun runs); across boots we eat one cold
    # compile instead of risking a SIGILL from a foreign AOT executable.
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            fingerprint += "|" + f.read().strip()
    except OSError:
        pass
    tag = hashlib.sha1(fingerprint.encode()).hexdigest()[:12]
    if base.endswith(f"-{tag}"):  # idempotent on already-keyed paths
        return base
    return f"{base}-{tag}"
