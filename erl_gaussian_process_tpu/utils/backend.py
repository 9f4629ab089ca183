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


def probe_backend_subprocess(timeout_s: float = 55.0) -> Tuple[bool, str]:
    """Like :func:`probe_backend`, but in a CHILD process — after an
    in-process thread probe times out, that thread is parked inside jax's
    backend-init lock forever and every later jax call in the process
    deadlocks on it. Callers that want to FALL BACK to another backend in
    the same process (e.g. ``__graft_entry__.entry``) must probe this way;
    the in-thread probe is only safe when the process exits on failure
    (bench.py uses ``os._exit``)."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
    except subprocess.TimeoutExpired:
        return False, f"backend init exceeded {timeout_s:.0f}s (tunnel down?)"
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        return False, tail[-1] if tail else f"probe exited rc={r.returncode}"
    out = r.stdout.strip().splitlines()
    return True, out[-1] if out else "unknown"


def require_backend(timeout_s: float = 55.0) -> str:
    """Probe the default backend; raise ``RuntimeError`` (fast) instead of
    hanging when it is unreachable. Returns the platform name."""
    ok, info = probe_backend(timeout_s)
    if not ok:
        raise RuntimeError(
            f"backend unavailable — failing fast instead of hanging: {info}")
    return info
