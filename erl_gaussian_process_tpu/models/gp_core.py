"""Shared GP linear-algebra core.

Replaces the reference's Eigen LLT + in-place triangular solves
(src/vanilla_gp.cpp:494-505, src/noisy_input_gp.cpp:888-894) with
``jnp.linalg.cholesky`` + ``solve_triangular`` — fully batched/vmappable so a
bank of B small GPs is one MXU-tiled batched factorization (the TPU-native
replacement for both the OpenMP partition loops and the libtorch batched
CUDA path, src/batch_gp_update_torch.cpp:72-82).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular


import os

# Matmul precision for the f32 performance path. TPU's DEFAULT executes f32
# matmuls as single-pass bf16 (measured v5e: 206 TFLOP/s but 2.4e-3 rel
# error — the FITC 1/(lambda+noise) amplification turns that into THREE
# lost decimal digits of map posterior, MAE 4.2e-1 vs 3.5e-4 against
# float64). jax's "float32" alias is the SIX-pass scheme (31 TFLOP/s,
# 5.8e-7) — accurate but half the throughput of the three-pass
# BF16_BF16_F32_X3 (62 TFLOP/s, 1.3e-5), which is the accuracy class the
# fused Pallas kernels already run at (hand-rolled bf16x3, see
# ops/pallas_fitc._dot3x) and which passes every posterior quality gate.
# X3 is therefore the default; set ERL_GP_MATMUL_PRECISION=float32 to get
# the 6-pass scheme back (or any other jax precision string).
_MATMUL_PRECISION = os.environ.get("ERL_GP_MATMUL_PRECISION",
                                   "BF16_BF16_F32_X3")


def matmul_precision():
    """The ambient-precision context used by every hot model function.
    TPU-only: the CPU backend cannot lower explicit BF16_* dot algorithms
    in fused contexts (ElementalIrEmitter INVALID_ARGUMENT) and computes
    exact f32 regardless, so off-TPU this is plain "highest"."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    return jax.default_matmul_precision(
        _MATMUL_PRECISION if on_tpu else "highest")


def f32_matmul(fn):
    """Trace the wrapped function under near-f32 matmul precision (see
    ``_MATMUL_PRECISION`` above; applied at trace time, under the jit).

    Dtype-dispatched: an explicit BF16_* dot algorithm would DOWNCAST
    float64 operands (observed: the f64 golden suite fails under an
    ambient X3 because even the CPU backend emulates the bf16 passes), so
    calls whose arguments contain any f64 leaf trace under "highest"
    instead. The jit retraces per dtype anyway, so each specialization
    gets the right setting."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        leaves = jax.tree_util.tree_leaves((args, kwargs))
        any64 = any(getattr(a, "dtype", None) == jnp.float64
                    for a in leaves)
        if any64:
            with jax.default_matmul_precision("highest"):
                return fn(*args, **kwargs)
        with matmul_precision():
            return fn(*args, **kwargs)
    return wrapper


def kahan_add(s: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray):
    """One compensated (Kahan) accumulation step: returns ``(s', c')`` with
    the running sum recoverable as ``s' - c'`` to ~2 ulp of the TERM
    magnitudes, independent of how many terms have been accumulated.

    Streaming FITC accumulates ~1e3 rank-N increments into (Q_M, alpha);
    plain float32 accumulation drifts by ~sqrt(T)*eps of the RUNNING SUM
    (measured: the r4 983-pose headline needed a 1e-4 relative jitter to
    refactor Q_M — gp_core.host_jitter_retry fired in the shipping bench).
    The compensation keeps the pair (s, c) at effectively double-float32
    precision for the cost of three extra elementwise ops per update —
    native f32 on TPU (no f64 emulation), backend-uniform, and ~1e2x
    cheaper than carrying the accumulator in emulated f64 HBM traffic.

    XLA preserves the cancellation: its algebraic simplifier does not
    reassociate floats, verified numerically on both CPU and TPU by
    tests/test_sparse_pseudo_input_gp.py::test_kahan_accumulation_*."""
    y = d - c
    t = s + y
    c_new = (t - s) - y
    return t, c_new


def robust_cholesky(K: jnp.ndarray) -> jnp.ndarray:
    """Cholesky with escalating relative jitter on failure.

    FITC's Q_M (and dense pseudo-point grams K_M) are PSD by construction but
    can be numerically indefinite at float precision (condition numbers near
    1/eps); the reference factors them with no jitter and silently produces
    NaNs in that regime (src/sparse_pseudo_input_gp.cpp:839). Here a failed
    factorization retries with jitter growing from ~1e-14 of the mean
    diagonal. The fallback is a ``lax.cond`` so the common path pays exactly
    one factorization.
    """
    L = jnp.linalg.cholesky(K)
    scale = jnp.mean(jnp.diag(K))
    eye = jnp.eye(K.shape[0], dtype=K.dtype)
    eps = jnp.asarray(1e-14 if K.dtype == jnp.float64 else 1e-6, K.dtype)

    def cond_fn(c):
        j, Lc = c
        return jnp.any(jnp.isnan(Lc)) & (j < 1.0)

    def body_fn(c):
        j, _ = c
        return j * 100.0, jnp.linalg.cholesky(K + (j * scale) * eye)

    # bare while_loop: zero iterations on the well-posed path. Do NOT wrap
    # in lax.cond — measured on v5e at n=8192, the cond wrapper cost 30 ms
    # on top of a 12 ms Cholesky (2.4x) even when the fix branch never runs.
    _, L = jax.lax.while_loop(cond_fn, body_fn, (eps, L))
    return L


def cholesky_fit(K: jnp.ndarray, y: jnp.ndarray, *, robust: bool = True):
    """L = chol(K); alpha = K^{-1} y via two triangular solves.

    K: (n, n) SPD (identity-padded for inactive rows), y: (n, k).
    Returns (L, alpha). vmap over a leading batch axis for GP banks.

    ``robust=True`` uses ``robust_cholesky`` (in-jit escalating-jitter retry)
    — right for banks of small systems, where the retry structure costs
    little. For LARGE single systems any in-jit retry structure is
    expensive even when never taken (measured v5e, n=8192: plain chol
    12.6 ms; wrapped in lax.while 42 ms; in a single-retry lax.cond 29 ms —
    the conditional defeats XLA's fusion/aliasing around the
    factorization). Large-problem callers pass ``robust=False`` and retry
    on the HOST on NaN (see ``host_jitter_retry``), which costs nothing on
    the well-posed path.

    When ``robust=False`` on TPU/f32 with a thin RHS, the two solves run in
    the single-kernel Pallas substitution (ops/pallas_trsv.py) instead of
    XLA's latency-bound block chain.
    """
    if robust:
        L = robust_cholesky(K)
        a = solve_triangular(L, y, lower=True)
        a = solve_triangular(L.T, a, lower=False)
        return L, a

    from erl_gaussian_process_tpu.ops.pallas_chol import (
        chol_blocked,
        pallas_chol_enabled,
    )

    if K.ndim == 2 and pallas_chol_enabled(K.dtype, K.shape[0]):
        # streaming blocked Pallas factorization (ops/pallas_chol.py):
        # XLA's panel chain runs 2-3x off roofline at n >= 2k; its free
        # diagonal-block-inverse output feeds the substitution directly
        L, dinv = chol_blocked(K, return_dinv=True)
        return L, solve_with_L(L, y, chol_dinv=dinv)
    L = jnp.linalg.cholesky(K)
    return L, solve_with_L(L, y)


def solve_with_L(L: jnp.ndarray, y: jnp.ndarray, chol_dinv=None):
    """alpha = K^{-1} y from the Cholesky factor: the thin-RHS Pallas
    substitution on TPU/f32 (ops/pallas_trsv.py), else two trsm.
    ``chol_dinv``: the streaming Cholesky's free diagonal-block-inverse
    output — spares the substitution its batched-trsm prep."""
    from erl_gaussian_process_tpu.ops.pallas_trsv import (
        cho_solve_vec,
        pallas_trsv_enabled,
    )

    if L.ndim == 2 and pallas_trsv_enabled(L.dtype, L.shape[0], y.shape[1]):
        return cho_solve_vec(L, y, chol_dinv)
    a = solve_triangular(L, y, lower=True)
    return solve_triangular(L.T, a, lower=False)


def host_jitter_retry(fit_once, check_arrays, jitters=(0.0, 1e-10, 1e-8,
                                                       1e-6, 1e-4, 1e-2)):
    """Host-side robustness loop: ``fit_once(jitter)`` fits with ``jitter``
    added to the noise diagonal; retried with the next level while any of
    ``check_arrays(result)`` contains non-finite values. The well-posed path
    costs one small device->host fetch and no extra device work (see
    ``cholesky_fit`` for why in-jit retry is unacceptable on big systems).

    The float32 noise floor this guards: a dense n >= 4k gram has norm
    ~1e3+, so f32 STORAGE rounding alone perturbs it by ~1e-4 — noise
    below that makes the system indefinite for any f32 factorization
    (measured: XLA's 6-pass chol NaNs at var=1e-4, n=4096). When the
    retry escalates, the effective observation noise changes — hence the
    warning, so silent model changes are visible."""
    import logging

    result = None
    for j in jitters:
        result = fit_once(j)
        ok = all(bool(np.isfinite(np.asarray(a)).all())
                 for a in check_arrays(result))
        if ok:
            if j > 0:
                logging.getLogger("erl_gaussian_process_tpu").warning(
                    "fit required jitter %g on the noise diagonal — the "
                    "requested noise leaves the gram numerically "
                    "indefinite at this dtype/problem size (at float32 "
                    "the storage-rounding floor is ~1e-4 for n >= 4k; at "
                    "float64 this usually means a genuinely "
                    "ill-conditioned kernel matrix, e.g. dense smooth-RBF "
                    "grams). Effective observation noise changed; see "
                    "gp_core.host_jitter_retry", j)
            return result
    return result


def mean_from_ktest(ktest: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Posterior mean(s): ktest (n, m), alpha (n, k) -> (m, k).
    Reference: f_i = k_i · alpha (src/vanilla_gp.cpp:80-82)."""
    return ktest.T @ alpha


def whiten(L: jnp.ndarray, ktest: jnp.ndarray) -> jnp.ndarray:
    """alpha_test = L^{-1} ktest (the lazy ``PrepareForVariance`` solve,
    src/vanilla_gp.cpp:136-150). ktest: (n, m) -> (n, m).

    Wide-RHS f32 solves on TPU dispatch to the GEMM-only block
    substitution (ops/blocked_solve.py): XLA's trsm ignores the ambient
    dot algorithm and runs ~2x off the X3 MXU rate at these shapes."""
    if L.ndim == 2 and ktest.ndim == 2:
        from erl_gaussian_process_tpu.ops.blocked_solve import (
            blocked_solve_lower,
            blocked_whiten_enabled,
        )
        if blocked_whiten_enabled(L.dtype, L.shape[0], ktest.shape[1]):
            return blocked_solve_lower(L, ktest)
    return solve_triangular(L, ktest, lower=True)


def variance_from_whitened(alpha_test: jnp.ndarray, reduced_rank: bool = False):
    """var_j = 1 - ||alpha_test[:, j]||^2 for normalized kernels,
    +||.||^2 for reduced-rank kernels (sign contract:
    src/vanilla_gp.cpp:116-131).

    The normalized-kernel branch clamps at 0: near a training point the
    true variance is ~noise-level and the X3-class matmul approximations
    on the serving path (blocked L^{-1} build, then the L^{-1} @ ktest
    GEMM) can push ``1 - s`` negative by ~1e-5, which would NaN any
    downstream sqrt. The reduced-rank branch is a plain norm, already
    non-negative."""
    s = jnp.sum(alpha_test * alpha_test, axis=0)
    return s if reduced_rank else jnp.maximum(0.0, 1.0 - s)
