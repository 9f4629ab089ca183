"""Shared GP linear-algebra core.

Replaces the reference's Eigen LLT + in-place triangular solves
(src/vanilla_gp.cpp:494-505, src/noisy_input_gp.cpp:888-894) with
``jnp.linalg.cholesky`` + ``solve_triangular`` — fully batched/vmappable so a
bank of B small GPs is one MXU-tiled batched factorization (the TPU-native
replacement for both the OpenMP partition loops and the libtorch batched
CUDA path, src/batch_gp_update_torch.cpp:72-82).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def cholesky_fit(K: jnp.ndarray, y: jnp.ndarray):
    """L = chol(K); alpha = K^{-1} y via two triangular solves.

    K: (n, n) SPD (identity-padded for inactive rows), y: (n, k).
    Returns (L, alpha). vmap over a leading batch axis for GP banks.
    """
    L = jnp.linalg.cholesky(K)
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
