"""Device-init watchdog.

With the remote-TPU tunnel unreachable, JAX backend init blocks forever
inside ``make_c_api_client`` — an uninterruptible C call, so Python
signal handlers never run. Harness entry points (bench.py,
tools/tpu_smoke.py) wrap their first device touch with this watchdog so
an unreachable device becomes a recorded failure instead of a hang.
"""

from __future__ import annotations

import os
import threading
from typing import Callable


def device_init_watchdog(
    on_timeout: Callable[[], None], timeout: float = 300.0,
    exit_code: int = 17,
):
    """Start a daemon thread that calls ``on_timeout()`` and hard-exits
    (``os._exit`` — a blocked C call can't be unwound) unless the
    returned ``done()`` callable is invoked within ``timeout`` seconds.

    Usage::

        done = device_init_watchdog(report_fn)
        jax.devices()   # may block forever on a dead tunnel
        done()
    """
    ev = threading.Event()

    def _watch():
        if not ev.wait(timeout=timeout):
            try:
                on_timeout()
            finally:
                os._exit(exit_code)

    threading.Thread(target=_watch, daemon=True).start()
    return ev.set
