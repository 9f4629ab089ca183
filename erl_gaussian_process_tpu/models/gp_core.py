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
from jax.scipy.linalg import solve_triangular


def f32_matmul(fn):
    """Trace the wrapped function under true-float32 matmul precision.

    TPU's DEFAULT matmul precision executes f32 matmuls (and the matmuls
    inside XLA's triangular solves / Choleskys) as single-pass bf16 on the
    MXU. GP posteriors run through ``1 - ||L^{-1}k||^2``-style cancellations
    whose errors the FITC weights amplify by up to 1/noise — measured on
    v5e, DEFAULT costs 3 decimal digits of posterior accuracy on the
    occupancy-map workload (MAE 4.2e-1 vs 3.5e-4 against float64) for only
    ~12% speed. Every hot model function wraps itself in this decorator
    (under the jit, so the setting applies at trace time). No effect on CPU.
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapper


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

    def fix(_):
        scale = jnp.mean(jnp.diag(K))
        eye = jnp.eye(K.shape[0], dtype=K.dtype)
        eps = jnp.asarray(
            1e-14 if K.dtype == jnp.float64 else 1e-6, K.dtype)

        def cond_fn(c):
            j, Lc = c
            return jnp.any(jnp.isnan(Lc)) & (j < 1.0)

        def body_fn(c):
            j, _ = c
            return j * 100.0, jnp.linalg.cholesky(K + (j * scale) * eye)

        _, L2 = jax.lax.while_loop(cond_fn, body_fn, (eps, L))
        return L2

    return jax.lax.cond(jnp.any(jnp.isnan(L)), fix, lambda _: L, None)


def cholesky_fit(K: jnp.ndarray, y: jnp.ndarray):
    """L = chol(K); alpha = K^{-1} y via two triangular solves.

    K: (n, n) SPD (identity-padded for inactive rows), y: (n, k).
    Returns (L, alpha). vmap over a leading batch axis for GP banks.

    Uses ``robust_cholesky``: numerically indefinite grams (e.g. a dense
    NIGP joint value/gradient system with near-zero input noise) retry with
    escalating jitter instead of silently propagating NaN — the well-posed
    path pays only a NaN check.
    """
    L = robust_cholesky(K)
    a = solve_triangular(L, y, lower=True)
    a = solve_triangular(L.T, a, lower=False)
    return L, a


def mean_from_ktest(ktest: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Posterior mean(s): ktest (n, m), alpha (n, k) -> (m, k).
    Reference: f_i = k_i · alpha (src/vanilla_gp.cpp:80-82)."""
    return ktest.T @ alpha


def whiten(L: jnp.ndarray, ktest: jnp.ndarray) -> jnp.ndarray:
    """alpha_test = L^{-1} ktest (the lazy ``PrepareForVariance`` solve,
    src/vanilla_gp.cpp:136-150). ktest: (n, m) -> (n, m)."""
    return solve_triangular(L, ktest, lower=True)


def variance_from_whitened(alpha_test: jnp.ndarray, reduced_rank: bool = False):
    """var_j = 1 - ||alpha_test[:, j]||^2 for normalized kernels,
    +||.||^2 for reduced-rank kernels (sign contract:
    src/vanilla_gp.cpp:116-131)."""
    s = jnp.sum(alpha_test * alpha_test, axis=0)
    return s if reduced_rank else 1.0 - s
