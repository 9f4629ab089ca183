"""Marginal-likelihood kernel-scale selection.

The reference has no hyperparameter fitting — its tests hand-tune
``scale`` by manual sweeps and record them in comments
(/root/reference/test/gtest/test_noisy_input_gp.cpp:174-178,552-555:
"scale: 10 -> mae: ...", one line per tried value). This module automates
exactly that workflow the TPU way: the whole candidate sweep is ONE
batched (vmapped) gram + Cholesky + solve on the MXU — S scale candidates
cost barely more than one fit at the sizes where tuning matters, because
the batched factorization tiles the same way.

The criterion is the exact negative log marginal likelihood of the
masked-GP model

    NLML(s) = 0.5 sum_q y_q^T alpha_q + q * sum_i log L_ii
              + 0.5 * n_valid * q * log(2 pi)

(the multi-output form with a shared kernel/L and per-column alpha,
matching VanillaGaussianProcess's model). Masked rows are identity rows
of the gram with zeroed y, so they contribute log(1) = 0 and nothing to
the quadratic term — the fixed-shape padding is exact here too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from erl_gaussian_process_tpu.kernels import train_gram
from erl_gaussian_process_tpu.models.gp_core import f32_matmul

_LOG_2PI = float(np.log(2.0 * np.pi))


@partial(jax.jit, static_argnames=("kernel",))
@f32_matmul
def nlml_sweep(x, y, var, mask, scales, *, kernel: str):
    """Exact NLML at each candidate scale. x (n, d); y (n, q); var/mask
    (n,); scales (S,). Returns (S,) — one batched fit, no host loop."""
    yv = jnp.where(mask[:, None], y, 0.0)
    n_valid = jnp.sum(mask)
    q = y.shape[1]

    def one(s):
        K = train_gram(kernel, x, jnp.where(mask, var, 0.0), s, mask=mask)
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), yv)
        quad = 0.5 * jnp.sum(yv * a)
        logdet = q * jnp.sum(jnp.log(jnp.diagonal(L)))
        return quad + logdet + 0.5 * n_valid * q * _LOG_2PI

    return jax.vmap(one)(scales)


@partial(jax.jit, static_argnames=("kernel",))
@f32_matmul
def nlml_sweep_nigp(x, y, grad, var_x, var_y, var_grad, sample_mask,
                    grad_mask, scales, *, kernel: str):
    """Exact NLML of the NIGP joint value/gradient system at each
    candidate scale — the automated version of the sweeps the reference
    recorded for exactly this model (test_noisy_input_gp.cpp:174-178,
    552-555). x (n, d); y (n, q); grad (n, d, q); var_* (n,); masks (n,)
    bool; scales (S,). Returns (S,). The joint observation vector is the
    same [y; dim-major grads] packing nigp_fit solves against; masked
    joint rows are identity rows with zeroed observations, so they drop
    out of both terms exactly."""
    from erl_gaussian_process_tpu.kernels.gradient import (
        joint_mask,
        train_gram_with_gradient,
    )
    from erl_gaussian_process_tpu.models.noisy_input_gp import pack_alpha

    d = x.shape[1]
    obs = pack_alpha(y, grad, sample_mask, grad_mask)
    act = joint_mask(sample_mask, grad_mask, d)
    n_valid = jnp.sum(act)
    q = y.shape[1]

    def one(s):
        K = train_gram_with_gradient(
            kernel, x, jnp.where(sample_mask, var_x, 0.0),
            jnp.where(sample_mask, var_y, 0.0),
            jnp.where(grad_mask, var_grad, 0.0),
            sample_mask, grad_mask, s)
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), obs)
        quad = 0.5 * jnp.sum(obs * a)
        logdet = q * jnp.sum(jnp.log(jnp.diagonal(L)))
        return quad + logdet + 0.5 * n_valid * q * _LOG_2PI

    return jax.vmap(one)(scales)


def select_scale(x, y, var, mask=None, *, kernel: str,
                 scales=None, refine: int = 1):
    """Pick the kernel scale by exact marginal likelihood.

    x (n, d); y (n, q) (a 1-D y is promoted); var (n,) observation noise;
    ``scales`` an initial candidate grid (default: 24 log-spaced points
    spanning the data's resolvable range, from twice the median
    nearest-neighbor spacing to the domain extent). Each ``refine`` round
    re-grids (same size) around the best candidate between its grid
    neighbors. Returns (best_scale, scales (S,), nlml (S,)) of the final
    round. NaN NLML (non-SPD at that scale for this noise floor) ranks
    last."""
    x = jnp.atleast_2d(jnp.asarray(x))
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    var = jnp.asarray(var)
    if mask is None:
        mask = jnp.ones(x.shape[0], bool)
    mask = jnp.asarray(mask)
    if scales is None:
        xv = np.asarray(x)[np.asarray(mask)]
        span = float(np.linalg.norm(xv.max(0) - xv.min(0))) or 1.0
        sub = xv[:: max(1, len(xv) // 512)]
        d2 = ((sub[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        nn = float(np.median(np.sqrt(d2.min(1))))
        scales = np.geomspace(max(2.0 * nn, 1e-6 * span), span, 24)
    scales = np.asarray(scales, np.asarray(x).dtype)
    rounds = max(0, int(refine)) + 1
    for r in range(rounds):
        vals = np.asarray(
            nlml_sweep(x, y, var, mask, jnp.asarray(scales), kernel=kernel))
        ranked = np.where(np.isfinite(vals), vals, np.inf)
        b = int(ranked.argmin())
        best = float(scales[b])
        lo = scales[max(b - 1, 0)]
        hi = scales[min(b + 1, len(scales) - 1)]
        if r == rounds - 1 or hi <= lo:
            break
        scales = np.geomspace(lo, hi, len(scales)).astype(scales.dtype)
    return best, scales, vals
