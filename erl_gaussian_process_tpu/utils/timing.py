"""Phase timers (equivalent of the reference's ERL_BLOCK_TIMER RAII scopes and
``ReportTime`` micro-bench helper, erl_common/block_timer.hpp usage at
test_vanilla_gp.cpp:27, test_noisy_input_gp.cpp:232).

``block_until_ready`` is applied to returned pytrees so timings are honest
under JAX's async dispatch.
"""

from __future__ import annotations

import logging
import time
from typing import Callable

import jax

logger = logging.getLogger("erl_gaussian_process_tpu")


class BlockTimer:
    def __init__(self, msg: str, log=True):
        self.msg = msg
        self.log = log
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        if self.log:
            logger.info("%s: %.3f ms", self.msg, self.elapsed * 1e3)
        return False


class trace:
    """Profiler scope: wraps ``jax.profiler.trace`` (the rebuild's analogue
    of the reference's optional Tracy integration, setup.py:47,193) with a
    wall-clock fallback when no trace dir is given. View with TensorBoard or
    xprof."""

    def __init__(self, log_dir: str | None = None, msg: str = "trace"):
        self.log_dir = log_dir
        self.timer = BlockTimer(msg)
        self._ctx = None

    def __enter__(self):
        self.timer.__enter__()
        if self.log_dir:
            self._ctx = jax.profiler.trace(self.log_dir)
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            self._ctx.__exit__(*exc)
        return self.timer.__exit__(*exc)


def memory_usage(state) -> int:
    """Total bytes of all arrays in a model state pytree (equivalent of the
    reference's GetMemoryUsage introspection, src/vanilla_gp.cpp:463-474)."""
    leaves = jax.tree_util.tree_leaves(state)
    return sum(getattr(x, "nbytes", 0) for x in leaves)


def report_time(name: str, repeats: int, fn: Callable, *args, warmup: int = 1,
                **kwargs):
    """Run fn repeatedly, blocking on results; returns (mean_s, min_s)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    mean_s = sum(times) / len(times)
    logger.info("%s: mean %.3f ms, min %.3f ms over %d runs",
                name, mean_s * 1e3, min(times) * 1e3, repeats)
    return mean_s, min(times)


_warned_x64 = False


def warn_if_x64_disabled(dtype) -> None:
    """One-time warning when a float64 model is created while JAX's x64 mode
    is off — jnp would silently downcast to float32 and the reference-parity
    accuracy (1e-5, BASELINE.json) would not hold. Enable with
    ``jax.config.update("jax_enable_x64", True)``."""
    global _warned_x64
    import numpy as _np

    if _warned_x64 or _np.dtype(dtype) != _np.float64:
        return
    if not jax.config.jax_enable_x64:
        _warned_x64 = True
        logger.warning(
            "float64 model requested but jax_enable_x64 is off — computation "
            "will silently run in float32. Enable x64 for reference-parity "
            "accuracy: jax.config.update('jax_enable_x64', True)")
