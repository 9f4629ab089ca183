"""Deadline-bounded jax backend initialization.

jax backend init blocks indefinitely inside PJRT client creation when the
remote-TPU (axon tunnel) backend is registered but unreachable — the
round-2 driver failure mode (MULTICHIP_r02 rc=124, BENCH_r02 rc=1). Every
driver-facing entry point (``bench.py``, ``__graft_entry__``) probes
through here so "infra down" degrades to a fast, classifiable error
instead of a hang or a 30-line traceback.

The probe runs ``jax.devices()`` in a daemon thread under a deadline. On
timeout the thread is left hung inside PJRT init (it is not killable);
callers that want a clean process exit afterwards must use ``os._exit``
(see bench.py's ``_fail_fast``).
"""

from __future__ import annotations

import threading
from typing import Tuple


def probe_backend(timeout_s: float = 55.0) -> Tuple[bool, str]:
    """Initialize the default jax backend under a deadline.

    Returns ``(ok, platform_or_reason)``: ``(True, "tpu")`` style on
    success, ``(False, reason)`` on timeout or backend error.
    """
    import jax

    out = {}

    def probe():
        try:
            devs = jax.devices()
            out["platform"] = devs[0].platform
        except Exception as e:  # backend registered but unreachable
            out["err"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return False, f"backend init exceeded {timeout_s:.0f}s (tunnel down?)"
    if "err" in out:
        return False, out["err"]
    return True, out["platform"]


def require_backend(timeout_s: float = 55.0) -> str:
    """Probe the default backend; raise ``RuntimeError`` (fast) instead of
    hanging when it is unreachable. Returns the platform name."""
    ok, info = probe_backend(timeout_s)
    if not ok:
        raise RuntimeError(
            f"backend unavailable — failing fast instead of hanging: {info}")
    return info
