"""Bounded first contact with the (possibly remote) JAX backend.

The TPU backend in this environment is a remote "axon" PJRT plugin
behind a tunnel with measured multi-hour outages — both fast
'Unavailable' RuntimeErrors and INDEFINITE hangs inside the very
first `jax.devices()` / first dispatch. Any long-running script that
touches the device must bound its first contact or an outage turns
into a silent hang (no reference analog: the reference talks to a
local CUDA device that either exists or fails fast).

`wait_for_backend` probes `jax.devices()` under a SIGALRM bound and
retries across transient outages, clearing jax's memoized backend-
init failure between attempts so each retry actually re-dials the
tunnel. Only the probe is alarmed; later real compiles may
legitimately take minutes and are not bounded.
"""

from __future__ import annotations

import time

import jax


def wait_for_backend(retries: int = 4, wait_s: float = 120,
                     probe_timeout_s: int = 600):
    """Return `jax.devices()`, retrying across tunnel outages; raise
    after `retries` bounded attempts."""
    import signal

    def _on_alarm(signum, frame):
        raise TimeoutError(f"jax.devices() probe exceeded "
                           f"{probe_timeout_s}s (tunnel hang)")

    prev = signal.signal(signal.SIGALRM, _on_alarm)
    try:
        for attempt in range(retries):
            try:
                signal.alarm(probe_timeout_s)
                try:
                    dev = jax.devices()
                finally:
                    signal.alarm(0)
                return dev
            except (RuntimeError, TimeoutError) as e:
                print(f"# backend probe {attempt + 1}/{retries} "
                      f"failed: {type(e).__name__}: {e}", flush=True)
                if attempt == retries - 1:
                    raise
                try:
                    # jax memoizes backend-init failures; drop them so
                    # the next probe actually re-dials the tunnel
                    jax.extend.backend.clear_backends()
                except Exception:
                    pass
                time.sleep(wait_s)
    finally:
        signal.signal(signal.SIGALRM, prev)
