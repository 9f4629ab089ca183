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


@partial(jax.jit, static_argnames=("kernel",))
@f32_matmul
def nlml_sweep_spgp(pseudo, x, y, var, mask, scales, *, kernel: str):
    """Exact FITC NLML at each candidate scale, for the SPGP model with
    FIXED pseudo points (the production occupancy-map configuration —
    config/spgp_occupancy_map_2d.yaml hand-sets ``scale: 0.18``; this
    automates that choice the same way :func:`nlml_sweep` automates the
    exact-GP sweeps).

    The FITC marginal is y ~ N(0, Q_NN + diag(lambda + var)) with
    Q_NN = K_NM K_M^{-1} K_MN and lambda_i = 1 - ||L_M^{-1} k_i||^2 (the
    same residual — including the clamp at 0 — as the update path,
    models/sparse_pseudo_input_gp.fitc_delta, so the criterion scores
    exactly the model the map runs). Evaluated by Woodbury in the M-rank
    form: with V = L_M^{-1} K_MN and W = V / sqrt(D), D = lambda + var,

        log|Sigma| = sum_i log D_i + log|I_M + W W^T|
        y^T Sigma^{-1} y = y^T D^{-1} y - ||chol(A)^{-1} (W y/sqrt(D))||^2

    so each candidate costs one (M, M) Cholesky pair + (M, n) GEMMs —
    never an (n, n) factorization. Masked rows get V column 0 / D = 1 /
    y = 0 and drop out of both terms exactly.

    pseudo (M, d); x (n, d); y (n, q); var/mask (n,); scales (S,).
    Returns (S,)."""
    from erl_gaussian_process_tpu.kernels import cross_gram, kernel_fn

    yv = jnp.where(mask[:, None], y, 0.0)
    n_valid = jnp.sum(mask)
    q = y.shape[1]
    m = pseudo.shape[0]
    eye = jnp.eye(m, dtype=pseudo.dtype)

    def one(s):
        km = kernel_fn(kernel)(pseudo, pseudo, s)
        L_m = jnp.linalg.cholesky(km)
        kmn = cross_gram(kernel, pseudo, x, s)
        V = jax.scipy.linalg.solve_triangular(L_m, kmn, lower=True)
        lam = jnp.maximum(1.0 - jnp.sum(V * V, axis=0), 0.0)
        D = jnp.where(mask, lam + var, 1.0)
        W = jnp.where(mask[None, :], V, 0.0) / jnp.sqrt(D)[None, :]
        A = eye + W @ W.T
        L_a = jnp.linalg.cholesky(A)
        yd = yv / D[:, None]
        wy = W @ (yv / jnp.sqrt(D)[:, None])                 # (M, q)
        beta = jax.scipy.linalg.solve_triangular(L_a, wy, lower=True)
        quad = 0.5 * (jnp.sum(yv * yd) - jnp.sum(beta * beta))
        logdet = q * (jnp.sum(jnp.log(jnp.diagonal(L_a)))
                      + 0.5 * jnp.sum(jnp.log(D)))
        return quad + logdet + 0.5 * n_valid * q * _LOG_2PI

    return jax.vmap(one)(scales)


def _auto_grid(x, mask, num: int = 24):
    """Default candidate grid: log-spaced from twice the median
    nearest-neighbor spacing (finest resolvable structure) to the domain
    extent. Guarded against degenerate inputs: needs >= 2 distinct valid
    points; coincident points (nn == 0) fall back to span-based bounds."""
    xv = np.asarray(x)[np.asarray(mask)]
    if xv.shape[0] < 2:
        raise ValueError(
            "select_scale auto grid needs >= 2 valid training points "
            f"(got {xv.shape[0]}); pass an explicit `scales` grid instead")
    span = float(np.linalg.norm(xv.max(0) - xv.min(0)))
    if not np.isfinite(span) or span <= 0.0:
        raise ValueError(
            "select_scale auto grid needs >= 2 distinct valid points "
            "(all inputs identical); pass an explicit `scales` grid")
    sub = xv[:: max(1, len(xv) // 512)]
    d2 = ((sub[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = float(np.median(np.sqrt(d2.min(1))))
    if not np.isfinite(nn) or nn <= 0.0:
        # duplicated points (e.g. repeated measurements): median-nn is 0 or
        # the subsample missed all distinct pairs — span-based lower bound
        nn = 5e-4 * span
    return np.geomspace(max(2.0 * nn, 1e-6 * span), span, num)


def _refine_loop(sweep, scales, dtype, refine):
    """Shared grid-refinement driver: evaluate the sweep, re-grid (same
    size) between the best candidate's grid neighbors each round. NaN NLML
    (non-SPD at that scale for this noise floor) ranks last. Returns
    (best_scale, final scales, final nlml values)."""
    scales = np.asarray(scales, dtype)
    rounds = max(0, int(refine)) + 1
    for r in range(rounds):
        vals = np.asarray(sweep(jnp.asarray(scales)))
        ranked = np.where(np.isfinite(vals), vals, np.inf)
        b = int(ranked.argmin())
        best = float(scales[b])
        lo = scales[max(b - 1, 0)]
        hi = scales[min(b + 1, len(scales) - 1)]
        if r == rounds - 1 or hi <= lo:
            break
        scales = np.geomspace(lo, hi, len(scales)).astype(scales.dtype)
    return best, scales, vals


def select_scale(x, y, var, mask=None, *, kernel: str,
                 scales=None, refine: int = 1):
    """Pick the kernel scale by exact marginal likelihood.

    x (n, d); y (n, q) (a 1-D y is promoted); var (n,) observation noise;
    ``scales`` an initial candidate grid (default: `_auto_grid`). Each
    ``refine`` round re-grids (same size) around the best candidate between
    its grid neighbors. Returns (best_scale, scales (S,), nlml (S,)) of the
    final round."""
    x = jnp.atleast_2d(jnp.asarray(x))
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    var = jnp.asarray(var)
    if mask is None:
        mask = jnp.ones(x.shape[0], bool)
    mask = jnp.asarray(mask)
    if scales is None:
        scales = _auto_grid(x, mask)
    return _refine_loop(
        lambda s: nlml_sweep(x, y, var, mask, s, kernel=kernel),
        scales, np.asarray(x).dtype, refine)


def select_scale_nigp(x, y, grad, var_x, var_y, var_grad,
                      sample_mask=None, grad_mask=None, *, kernel: str,
                      scales=None, refine: int = 1):
    """Pick the kernel scale for the NIGP joint value/gradient system by
    exact marginal likelihood — the automated end of the manual sweeps the
    reference recorded for exactly this model
    (test_noisy_input_gp.cpp:174-178, 552-555). Same grid + refinement
    driver as :func:`select_scale`, with :func:`nlml_sweep_nigp` as the
    criterion (the NLML over the active joint value/gradient rows).

    x (n, d); y (n, q) (1-D promoted); grad (n, d, q) (a (n, d) grad is
    promoted for q=1); var_* (n,) noise terms; masks (n,) bool. Returns
    (best_scale, scales (S,), nlml (S,))."""
    x = jnp.atleast_2d(jnp.asarray(x))
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    grad = jnp.asarray(grad)
    if grad.ndim == 2:
        grad = grad[:, :, None]
    var_x = jnp.asarray(var_x)
    var_y = jnp.asarray(var_y)
    var_grad = jnp.asarray(var_grad)
    if sample_mask is None:
        sample_mask = jnp.ones(x.shape[0], bool)
    sample_mask = jnp.asarray(sample_mask)
    if grad_mask is None:
        grad_mask = jnp.ones(x.shape[0], bool)
    grad_mask = jnp.asarray(grad_mask) & sample_mask
    if scales is None:
        scales = _auto_grid(x, sample_mask)
    return _refine_loop(
        lambda s: nlml_sweep_nigp(x, y, grad, var_x, var_y, var_grad,
                                  sample_mask, grad_mask, s, kernel=kernel),
        scales, np.asarray(x).dtype, refine)


def select_scale_spgp(pseudo, x, y, var, mask=None, *, kernel: str,
                      scales=None, refine: int = 1):
    """Pick the kernel scale for a fixed-pseudo-point SPGP/FITC model by
    exact FITC marginal likelihood (:func:`nlml_sweep_spgp`) — automates
    the hand-set ``scale`` in the production occupancy-map YAML. Same
    grid + refinement driver as :func:`select_scale`; the default grid is
    bounded below by the PSEUDO-POINT spacing too (a scale far under the
    grid pitch can't be represented by the inducing set, and K_M goes
    numerically singular -> NaN NLML ranks last anyway).

    pseudo (M, d); x (n, d); y (n, q) (1-D promoted); var (n,); mask (n,)
    bool. Returns (best_scale, scales (S,), nlml (S,))."""
    pseudo = jnp.atleast_2d(jnp.asarray(pseudo))
    x = jnp.atleast_2d(jnp.asarray(x))
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    var = jnp.asarray(var)
    if mask is None:
        mask = jnp.ones(x.shape[0], bool)
    mask = jnp.asarray(mask)
    if scales is None:
        scales = _auto_grid(x, mask)
    return _refine_loop(
        lambda s: nlml_sweep_spgp(pseudo, x, y, var, mask, s,
                                  kernel=kernel),
        scales, np.asarray(x).dtype, refine)


# -- gradient-driven fitting (extends the reference: jax.grad replaces the
# -- manual sweep entirely) -------------------------------------------------

def _fit_loop(loss_fn, log_s0: float, steps: int, lr: float):
    """Adam descent on log(scale) with ``jax.grad`` through the exact NLML
    (Cholesky included — jax differentiates the factorization). One jitted
    ``lax.scan`` over steps; returns (best_scale, scales (steps,),
    nlml (steps,)) with best = argmin over the whole trace (descent on a
    1-D but non-convex criterion: keep the best visited, not the last)."""
    import optax

    opt = optax.adam(lr)

    @jax.jit
    def run(log_s0):
        vg = jax.value_and_grad(loss_fn)

        def body(carry, _):
            log_s, opt_state = carry
            val, g = vg(log_s)
            # NaN guard: a candidate past the dtype's conditioning range
            # (e.g. a huge RBF scale) must not poison the whole descent
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            upd, opt_state = opt.update(g, opt_state)
            return (log_s + upd, opt_state), (jnp.exp(log_s), val)

        (_, _), (scales, vals) = jax.lax.scan(
            body, (log_s0, opt.init(log_s0)), None, length=steps)
        best = jnp.nanargmin(jnp.where(jnp.isfinite(vals), vals, jnp.inf))
        return scales[best], scales, vals

    best, scales, vals = run(jnp.asarray(log_s0))
    return float(best), np.asarray(scales), np.asarray(vals)


def fit_scale(x, y, var, mask=None, *, kernel: str, init=None,
              steps: int = 80, lr: float = 0.08):
    """Fit the kernel scale by gradient descent on the exact NLML
    (criterion: :func:`nlml_sweep` with a singleton candidate — the
    gradient flows through the very same code the sweep ranks with).
    Extends the reference, whose workflow was a hand-recorded sweep
    (test_noisy_input_gp.cpp:174-178); `select_scale` automates the sweep,
    this replaces it with ``jax.grad``. Returns (best_scale,
    per-step scales, per-step nlml)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    var = jnp.asarray(var)
    if mask is None:
        mask = jnp.ones(x.shape[0], bool)
    mask = jnp.asarray(mask)
    if init is None:
        g = _auto_grid(x, mask)
        init = float(np.sqrt(g[0] * g[-1]))
    return _fit_loop(
        lambda ls: nlml_sweep(x, y, var, mask, jnp.exp(ls)[None],
                              kernel=kernel)[0],
        np.log(init), steps, lr)


def fit_scale_nigp(x, y, grad, var_x, var_y, var_grad, sample_mask=None,
                   grad_mask=None, *, kernel: str, init=None,
                   steps: int = 80, lr: float = 0.08):
    """Gradient-driven scale fit for the NIGP joint value/gradient model
    (criterion: :func:`nlml_sweep_nigp`) — the full jax.grad replacement
    of the reference's recorded manual sweeps for exactly this model."""
    x = jnp.atleast_2d(jnp.asarray(x))
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    grad = jnp.asarray(grad)
    if grad.ndim == 2:
        grad = grad[:, :, None]
    var_x, var_y, var_grad = (jnp.asarray(v) for v in
                              (var_x, var_y, var_grad))
    if sample_mask is None:
        sample_mask = jnp.ones(x.shape[0], bool)
    sample_mask = jnp.asarray(sample_mask)
    if grad_mask is None:
        grad_mask = jnp.ones(x.shape[0], bool)
    grad_mask = jnp.asarray(grad_mask) & sample_mask
    if init is None:
        g = _auto_grid(x, sample_mask)
        init = float(np.sqrt(g[0] * g[-1]))
    return _fit_loop(
        lambda ls: nlml_sweep_nigp(x, y, grad, var_x, var_y, var_grad,
                                   sample_mask, grad_mask,
                                   jnp.exp(ls)[None], kernel=kernel)[0],
        np.log(init), steps, lr)


def fit_scale_spgp(pseudo, x, y, var, mask=None, *, kernel: str, init=None,
                   steps: int = 80, lr: float = 0.08):
    """Gradient-driven scale fit for the fixed-pseudo-point FITC model
    (criterion: :func:`nlml_sweep_spgp`) — tunes the production map YAML's
    hand-set ``scale`` by descent instead of a grid."""
    pseudo = jnp.atleast_2d(jnp.asarray(pseudo))
    x = jnp.atleast_2d(jnp.asarray(x))
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    var = jnp.asarray(var)
    if mask is None:
        mask = jnp.ones(x.shape[0], bool)
    mask = jnp.asarray(mask)
    if init is None:
        g = _auto_grid(x, mask)
        init = float(np.sqrt(g[0] * g[-1]))
    return _fit_loop(
        lambda ls: nlml_sweep_spgp(pseudo, x, y, var, mask,
                                   jnp.exp(ls)[None], kernel=kernel)[0],
        np.log(init), steps, lr)
