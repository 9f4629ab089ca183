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


def test_select_scale_nigp_drives_the_reference_sweep():
    """The automated end of the reference's manual NIGP sweeps
    (test_noisy_input_gp.cpp:174-178: 1D, scales 0.5..0.1). NLML is a
    different criterion from the reference's held-out MAE — its optimum on
    this smooth problem is larger (~1.1) than the MAE-picked 0.2 — but the
    two agree on rejecting the short end (scale=0.1 is worst under BOTH,
    matching the reference's recorded 1.76e-5 blow-up there), the driver
    finds the interior NLML optimum with grid+refine, and the selected
    scale still meets the reference's own accuracy-bound family."""
    from erl_gaussian_process_tpu.kernels import KernelSetting
    from erl_gaussian_process_tpu.models import NoisyInputGaussianProcess
    from erl_gaussian_process_tpu.utils import (
        nlml_sweep_nigp,
        select_scale_nigp,
    )

    n = 100
    x = np.linspace(0, 2 * np.pi, n)[:, None]
    y = np.sin(2 * x)
    grad = 2 * np.cos(2 * x)  # (n, 1) -> promoted to (n, 1, 1)
    var = np.full(n, 1e-4)

    # NLML over the reference's recorded candidate grid: the short end the
    # reference also rejected must rank last
    ref_grid = np.array([0.1, 0.2, 0.3, 0.4, 0.5])
    vals = np.asarray(nlml_sweep_nigp(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(grad[:, :, None]),
        jnp.asarray(var), jnp.asarray(var), jnp.asarray(var),
        jnp.ones(n, bool), jnp.ones(n, bool),
        jnp.asarray(ref_grid), kernel="rbf"))
    assert np.isfinite(vals).all()
    assert vals.argmax() == 0, vals.tolist()  # scale=0.1 worst, as recorded

    # the full automated driver (auto grid + refine): interior optimum
    best, scales, nlml = select_scale_nigp(
        x, y, grad, var, var, var, kernel="rbf", refine=1)
    assert np.isfinite(best) and 0.5 < best < 2.0, best  # interior, not edge
    assert np.isfinite(nlml).any()

    # the selected scale delivers reference-grade accuracy (the reference's
    # no-gradient-case bound, 1e-4 — the hand-picked MAE optimum 0.2 gets
    # 4.2e-6; NLML trades a little MAE for calibrated smoothness)
    def mae_at(s):
        st = NoisyInputGaussianProcess.Setting(
            kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=float(s)),
            max_num_samples=n, no_gradient_observation=False)
        gp = NoisyInputGaussianProcess(st)
        assert gp.train(x.T, y[:, 0], grad.T, var_x=1e-4, var_y=1e-4,
                        var_grad=1e-4)
        xt = np.linspace(0, 2 * np.pi, 200)
        r = gp.test(xt[None], predict_gradient=False)
        return float(np.abs(r.get_mean(0) - np.sin(2 * xt)).mean())

    assert mae_at(best) < 1.0e-4, (best, mae_at(best))


def test_select_scale_nigp_2d_rejects_catastrophic_scale():
    """Reference 2D sweep (test_noisy_input_gp.cpp:552-555): scale=0.05 is
    catastrophically bad (MAE 8.4e-4 vs ~1e-5 elsewhere). On a subsampled
    version of the same problem, NLML must also rank 0.05 last and pick an
    interior candidate from the recorded grid."""
    from erl_gaussian_process_tpu.utils import select_scale_nigp

    m = 16
    xs = np.linspace(-2, 2, m)
    ys = np.linspace(-1, 1, m)
    xv, yv = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([xv.ravel(), yv.ravel()], axis=-1)
    z = 2 * np.sin(10 * pts[:, 0]) * np.cos(5 * pts[:, 1])
    gx = 20 * np.cos(10 * pts[:, 0]) * np.cos(5 * pts[:, 1])
    gy = -10 * np.sin(10 * pts[:, 0]) * np.sin(5 * pts[:, 1])
    grad = np.stack([gx, gy], axis=1)[:, :, None]
    var = np.full(m * m, 1e-4)
    ref_grid = np.array([0.05, 0.1, 0.15, 0.2])
    best, scales, vals = select_scale_nigp(
        pts, z[:, None], grad, var, var, var, kernel="rbf",
        scales=ref_grid, refine=0)
    ranked = np.where(np.isfinite(vals), vals, np.inf)
    assert ranked.argmax() == 0, vals.tolist()  # 0.05 worst, as recorded
    assert best in (0.1, 0.15, 0.2), best


def test_select_scale_rejects_degenerate_inputs():
    import pytest

    from erl_gaussian_process_tpu.utils import select_scale

    y = np.zeros((1, 1))
    with pytest.raises(ValueError, match=">= 2 valid"):
        select_scale(np.zeros((1, 1)), y, np.full(1, 1e-4), kernel="rbf")
    # all points identical: finite grid impossible -> clear error, not
    # an inf/invalid geomspace
    x = np.ones((8, 1))
    with pytest.raises(ValueError, match="distinct"):
        select_scale(x, np.zeros((8, 1)), np.full(8, 1e-4), kernel="rbf")
    # duplicated-but-not-all-identical points: median-nn may be 0; must
    # fall back to a finite span-based grid instead of producing inf
    x = np.repeat(np.linspace(0, 1, 4), 4)[:, None]
    y = np.sin(x)
    best, scales, vals = select_scale(x, y, np.full(16, 1e-2),
                                      kernel="rbf", refine=0)
    assert np.isfinite(scales).all() and np.isfinite(best)


def _ref_nlml_spgp(pseudo, x, y, var, mask, scale, kernel="matern32"):
    """Direct f64 FITC NLML: build Sigma = Q_NN + diag(lambda + var) over
    the ACTIVE rows explicitly and evaluate the Gaussian logpdf (same
    lambda clamp as the update path)."""
    from erl_gaussian_process_tpu.kernels import cross_gram, kernel_fn

    act = np.asarray(mask)
    km = np.asarray(kernel_fn(kernel)(pseudo, pseudo, scale), np.float64)
    kmn = np.asarray(cross_gram(kernel, pseudo, x, scale), np.float64)
    kmn = kmn[:, act]
    import scipy.linalg as sla
    L = np.linalg.cholesky(km)
    V = sla.solve_triangular(L, kmn, lower=True)
    lam = np.maximum(1.0 - (V * V).sum(0), 0.0)
    sigma = V.T @ V + np.diag(lam + np.asarray(var, np.float64)[act])
    yv = np.asarray(y, np.float64)[act]
    if yv.ndim == 1:
        yv = yv[:, None]
    sign, logdet = np.linalg.slogdet(sigma)
    assert sign > 0
    sol = np.linalg.solve(sigma, yv)
    q = yv.shape[1]
    return (0.5 * float((yv * sol).sum()) + 0.5 * q * float(logdet)
            + 0.5 * yv.shape[0] * q * np.log(2 * np.pi))


def test_nlml_spgp_matches_direct_computation_with_mask():
    from erl_gaussian_process_tpu.utils import nlml_sweep_spgp

    rng = np.random.default_rng(5)
    m_side, n = 6, 160
    c = np.linspace(-1, 1, m_side)
    pv, qv = np.meshgrid(c, c, indexing="ij")
    pseudo = np.stack([pv.ravel(), qv.ravel()], axis=-1)
    x = rng.uniform(-1, 1, (n, 2))
    y = np.stack([np.sin(2 * x[:, 0]) * np.cos(x[:, 1]),
                  x[:, 0] * x[:, 1]], axis=-1)   # q=2 outputs
    var = np.full(n, 1e-2)
    mask = rng.uniform(size=n) < 0.85
    scales = np.asarray([0.2, 0.4, 0.8])
    vals = np.asarray(nlml_sweep_spgp(
        jnp.asarray(pseudo), jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(var), jnp.asarray(mask), jnp.asarray(scales),
        kernel="matern32"))
    ref = [_ref_nlml_spgp(pseudo, x, y, var, mask, s) for s in scales]
    np.testing.assert_allclose(vals, ref, rtol=1e-9)


def test_select_scale_spgp_recovers_sensible_scale():
    """On data drawn from a known-scale GP, the FITC selection (fixed
    pseudo grid) must land near the exact-GP selection — the dense and
    FITC criteria score the same generative process."""
    from erl_gaussian_process_tpu.utils import select_scale, select_scale_spgp

    rng = np.random.default_rng(11)
    n = 400
    x = np.sort(rng.uniform(-2, 2, n))[:, None]
    true_scale = 0.45
    d2 = (x - x.T) ** 2
    K = np.exp(-0.5 * d2 / true_scale**2) + 1e-8 * np.eye(n)
    y = np.linalg.cholesky(K) @ rng.standard_normal((n, 1))
    var = np.full(n, 1e-4)

    pseudo = np.linspace(-2, 2, 48)[:, None]
    best_fitc, _, _ = select_scale_spgp(pseudo, x, y, var, kernel="rbf",
                                        refine=2)
    best_exact, _, _ = select_scale(x, y, var, kernel="rbf", refine=2)
    assert 0.5 * best_exact < best_fitc < 2.0 * best_exact, \
        (best_fitc, best_exact)
    assert 0.25 < best_fitc < 0.9, best_fitc


def test_fit_scale_gradient_matches_sweep_optimum():
    """jax.grad descent on the exact NLML (fit_scale) must land at the
    same optimum the batched sweep ranks (select_scale) on the 1D sine
    golden config — the full gradient replacement of the reference's
    manual sweep workflow (test_noisy_input_gp.cpp:174-178)."""
    from erl_gaussian_process_tpu.utils.model_selection import (
        fit_scale,
        select_scale,
    )

    rng = np.random.default_rng(0)
    n = 120
    x = np.sort(rng.uniform(0, 2 * np.pi, n))[:, None]
    y = np.sin(x[:, 0]) + rng.normal(0, 0.01, n)
    var = np.full(n, 1e-4)

    best_sweep, _, _ = select_scale(x, y, var, kernel="rbf", refine=2)
    best_grad, scales, vals = fit_scale(x, y, var, kernel="rbf",
                                        steps=120, lr=0.08)
    assert np.isfinite(vals).any()
    # descent converges to the sweep's basin (the criterion is smooth and
    # unimodal here; 10% tolerance covers grid quantization)
    assert abs(best_grad - best_sweep) / best_sweep < 0.1, (
        best_grad, best_sweep)
    # and the descent actually descended
    fin = vals[np.isfinite(vals)]
    assert fin[-1] <= fin[0]


def test_fit_scale_gradient_is_correct():
    """The jax.grad of the NLML agrees with a central finite difference —
    the derivative flows through gram assembly AND the Cholesky."""
    import jax
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.utils.model_selection import nlml_sweep

    rng = np.random.default_rng(1)
    n = 40
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)))
    var = jnp.full((n,), 1e-3)
    mask = jnp.asarray(rng.uniform(size=n) < 0.85)

    def f(ls):
        return nlml_sweep(x, y, var, mask, jnp.exp(ls)[None],
                          kernel="matern32")[0]

    ls0 = jnp.asarray(np.log(0.47))
    g = float(jax.grad(f)(ls0))
    h = 1e-6
    fd = float((f(ls0 + h) - f(ls0 - h)) / (2 * h))
    assert abs(g - fd) / max(1.0, abs(fd)) < 1e-5, (g, fd)


def test_fit_scale_nigp_recovers_golden_config_scale():
    """Gradient fit on the NIGP joint system recovers a scale in the
    basin the reference's hand sweep selected for the 1D golden config
    (test_noisy_input_gp.cpp:174-178 settled near scale ~1 for the
    sin(x) GPIS setup), and the fitted scale meets the golden-class MAE."""
    from erl_gaussian_process_tpu.models.noisy_input_gp import (
        NoisyInputGPSetting,
        NoisyInputGaussianProcess,
    )
    from erl_gaussian_process_tpu.utils.model_selection import (
        fit_scale_nigp,
        select_scale_nigp,
    )
    from erl_gaussian_process_tpu.kernels import KernelSetting

    rng = np.random.default_rng(0)
    n = 100
    x = np.sort(rng.uniform(0, 2 * np.pi, n))[:, None]
    y = np.sin(x[:, 0]) + rng.normal(0, 1e-3, n)
    grad = np.cos(x)                                    # (n, 1)
    var_x = np.full(n, 1e-6)
    var_y = np.full(n, 1e-6)   # matches the generating noise (1e-3)^2
    var_grad = np.full(n, 1e-6)

    best_sweep, _, _ = select_scale_nigp(
        x, y, grad, var_x, var_y, var_grad, kernel="rbf", refine=2)
    best_grad, _, vals = fit_scale_nigp(
        x, y, grad, var_x, var_y, var_grad, kernel="rbf",
        steps=120, lr=0.08)
    assert abs(best_grad - best_sweep) / best_sweep < 0.15, (
        best_grad, best_sweep)

    gp = NoisyInputGaussianProcess(
        NoisyInputGPSetting(kernel_type="rbf",
                    kernel=KernelSetting(x_dim=1, scale=float(best_grad))))
    gp.train(x.T, y[:, None], mat_grad=grad.T, var_x=var_x, var_y=var_y,
             var_grad=var_grad)
    xq = np.linspace(0.3, 2 * np.pi - 0.3, 200)[None, :]
    res = gp.test(xq, predict_gradient=False)
    mae = np.abs(res.get_mean(0) - np.sin(xq[0])).mean()
    assert mae < 1e-4, mae  # golden class: reference observed 4.16e-6
