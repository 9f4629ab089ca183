"""Marginal-likelihood scale selection (utils/model_selection.py).

The reference hand-tunes ``scale`` by manual sweeps recorded in test
comments (test_noisy_input_gp.cpp:174-178,552-555); these tests pin the
automated equivalent: exact NLML values against a scipy-direct
computation (including masked rows), and recovery of a generative scale.
"""

import numpy as np
import jax.numpy as jnp
import scipy.linalg as sla

from erl_gaussian_process_tpu.utils import nlml_sweep, select_scale


def _ref_nlml(x, y, var, mask, scale, kernel="rbf"):
    """Dense f64 NLML over the VALID rows only (no padding trick)."""
    xv, yv, vv = x[mask], y[mask], var[mask]
    r2 = ((xv[:, None, :] - xv[None, :, :]) ** 2).sum(-1)
    if kernel == "rbf":
        K = np.exp(-0.5 * r2 / scale**2)
    else:
        raise KeyError(kernel)
    K = K + np.diag(vv)
    L = np.linalg.cholesky(K)
    a = sla.cho_solve((L, True), yv)
    q = yv.shape[1]
    return (0.5 * np.sum(yv * a) + q * np.sum(np.log(np.diag(L)))
            + 0.5 * len(xv) * q * np.log(2 * np.pi))


def test_nlml_matches_direct_computation_with_mask():
    rng = np.random.default_rng(0)
    n = 120
    x = rng.uniform(-1, 1, (n, 2))
    y = np.stack([np.sin(2 * x[:, 0]), np.cos(x[:, 1])], axis=1)
    y += rng.normal(0, 1e-2, y.shape)
    var = np.full(n, 1e-3)
    mask = rng.random(n) < 0.85
    scales = np.array([0.2, 0.5, 1.0])
    vals = np.asarray(nlml_sweep(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(var),
        jnp.asarray(mask), jnp.asarray(scales), kernel="rbf"))
    ref = [_ref_nlml(x, y, var, mask, s) for s in scales]
    np.testing.assert_allclose(vals, ref, rtol=1e-9)


def test_select_scale_recovers_generative_scale():
    """Data drawn from a known-scale RBF GP: the sweep's pick must land
    within a grid step of the truth, and beat clearly-wrong scales."""
    rng = np.random.default_rng(1)
    n, true_scale = 300, 0.4
    x = rng.uniform(-2, 2, (n, 1))
    r2 = (x[:, None, 0] - x[None, :, 0]) ** 2
    K = np.exp(-0.5 * r2 / true_scale**2) + 1e-6 * np.eye(n)
    f = np.linalg.cholesky(K) @ rng.standard_normal(n)
    noise = 1e-2
    y = (f + rng.normal(0, np.sqrt(noise), n))[:, None]
    var = np.full(n, noise)
    best, scales, vals = select_scale(x, y, var, kernel="rbf", refine=1)
    assert np.isfinite(vals).any()
    assert 0.25 < best < 0.65, best
    wrong = np.asarray(nlml_sweep(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(var),
        jnp.ones(n, bool), jnp.asarray([0.02, 4.0]), kernel="rbf"))
    best_val = vals[np.nanargmin(np.where(np.isfinite(vals), vals, np.nan))]
    assert (best_val < wrong).all()


def test_select_scale_improves_fit_quality():
    """End to end: a VanillaGP trained at the selected scale must beat the
    same model at a 5x-off scale on held-out MAE."""
    from erl_gaussian_process_tpu.kernels import KernelSetting
    from erl_gaussian_process_tpu.models.vanilla_gp import (
        VanillaGaussianProcess,
        VanillaGPSetting,
    )

    rng = np.random.default_rng(2)
    n = 200
    x = np.sort(rng.uniform(-1, 1, n))[None, :]
    y = (np.sin(4 * x[0]) + rng.normal(0, 1e-2, n))[:, None]
    var = np.full(n, 1e-4)
    best, _, _ = select_scale(x.T, y, var, kernel="rbf", refine=1)
    xq = np.linspace(-0.9, 0.9, 257)[None, :]
    truth = np.sin(4 * xq[0])

    def mae_at(s):
        gp = VanillaGaussianProcess(VanillaGPSetting(
            kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=s)))
        gp.train(x, y, var)
        return np.abs(gp.test(xq).get_mean() - truth).mean()

    assert mae_at(best) < mae_at(best * 5.0)
    assert mae_at(best) < 5e-3


def test_nlml_nigp_matches_direct_computation():
    """Joint value/gradient NLML against a dense f64 computation over the
    active joint rows (values + flagged gradient rows)."""
    from erl_gaussian_process_tpu.kernels.gradient import (
        joint_mask,
        train_gram_with_gradient,
    )
    from erl_gaussian_process_tpu.models.noisy_input_gp import pack_alpha
    from erl_gaussian_process_tpu.utils import nlml_sweep_nigp

    rng = np.random.default_rng(3)
    n, d = 60, 2
    x = rng.uniform(-1, 1, (n, d))
    y = np.sin(2 * x[:, :1]) * np.cos(x[:, 1:2])
    grad = np.stack([2 * np.cos(2 * x[:, :1]) * np.cos(x[:, 1:2]),
                     -np.sin(2 * x[:, :1]) * np.sin(x[:, 1:2])], axis=1)
    var_x = np.full(n, 1e-4)
    var_y = np.full(n, 1e-3)
    var_grad = np.full(n, 1e-2)
    sample_mask = rng.random(n) < 0.9
    grad_mask = sample_mask & (rng.random(n) < 0.6)
    scales = np.array([0.4, 0.8])
    vals = np.asarray(nlml_sweep_nigp(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(grad),
        jnp.asarray(var_x), jnp.asarray(var_y), jnp.asarray(var_grad),
        jnp.asarray(sample_mask), jnp.asarray(grad_mask),
        jnp.asarray(scales), kernel="rbf"))
    for s, v in zip(scales, vals):
        K = np.asarray(train_gram_with_gradient(
            "rbf", jnp.asarray(x), jnp.asarray(np.where(sample_mask, var_x, 0)),
            jnp.asarray(np.where(sample_mask, var_y, 0)),
            jnp.asarray(np.where(grad_mask, var_grad, 0)),
            jnp.asarray(sample_mask), jnp.asarray(grad_mask), s), np.float64)
        obs = np.asarray(pack_alpha(jnp.asarray(y), jnp.asarray(grad),
                                    jnp.asarray(sample_mask),
                                    jnp.asarray(grad_mask)), np.float64)
        act = np.asarray(joint_mask(jnp.asarray(sample_mask),
                                    jnp.asarray(grad_mask), d))
        Ka, oa = K[np.ix_(act, act)], obs[act]
        L = np.linalg.cholesky(Ka)
        a = sla.cho_solve((L, True), oa)
        ref = (0.5 * np.sum(oa * a) + np.sum(np.log(np.diag(L)))
               + 0.5 * act.sum() * np.log(2 * np.pi))
        np.testing.assert_allclose(v, ref, rtol=1e-9)
