"""Golden-accuracy tests for NoisyInputGaussianProcess, ported from the
reference's test/gtest/test_noisy_input_gp.cpp (1-D cases use the exact
golden values recorded there; the heavy 2-D case runs at reduced size and is
cross-validated against jax.jacfwd instead)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.kernels.gradient import _blocks
from erl_gaussian_process_tpu.models import NoisyInputGaussianProcess

NOISE_VAR = 0.0001


def _values_1d(x):
    return np.sin(2 * x), 2 * np.cos(2 * x)


def test_1d_with_gradient_observation(tmp_path):
    # reference: test_noisy_input_gp.cpp:13-186 (scale=0.2);
    # observed MAE 4.1624e-6 / 7.1391e-5
    n = 100
    setting = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.2),
        max_num_samples=n, no_gradient_observation=False)
    gp = NoisyInputGaussianProcess(setting)
    x = np.linspace(0, 2 * np.pi, n)
    y, g = _values_1d(x)
    assert gp.train(x[None], y, g[None], var_x=NOISE_VAR, var_y=NOISE_VAR,
                    var_grad=NOISE_VAR)

    xt = np.linspace(0, 2 * np.pi, 200)
    yt, gt = _values_1d(xt)
    res = gp.test(xt[None], predict_gradient=True)
    mae = np.abs(res.get_mean(0) - yt).mean()
    mae_g = np.abs(res.get_gradient(0)[0] - gt).mean()
    assert mae < 1.0e-5, mae
    assert mae_g < 1.0e-4, mae_g
    assert abs(mae - 4.1624286843223515e-06) < 1e-13, mae
    assert abs(mae_g - 7.139121709502966e-05) < 1e-12, mae_g

    # variance / covariance surfaces exist and are sane
    mv = res.get_mean_variance()
    gv = res.get_gradient_variance()
    cov = res.get_covariance()
    assert mv.shape == (200,) and np.all(mv > 0)
    assert gv.shape == (1, 200) and np.all(gv > 0)
    assert cov.shape == (1, 200)

    path = str(tmp_path / "nigp.npz")
    gp.save(path)
    gp2 = NoisyInputGaussianProcess(NoisyInputGaussianProcess.Setting())
    gp2.load(path)
    assert gp == gp2


def test_1d_without_gradient_observation():
    # reference: test_noisy_input_gp.cpp:188-352 (scale=0.2);
    # observed MAE 7.3775e-5 / 2.4348e-3
    n = 100
    setting = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.2),
        max_num_samples=n, no_gradient_observation=True)
    gp = NoisyInputGaussianProcess(setting)
    x = np.linspace(0, 2 * np.pi, n)
    y, g = _values_1d(x)
    assert gp.train(x[None], y, var_x=NOISE_VAR, var_y=NOISE_VAR)

    xt = np.linspace(0, 2 * np.pi, 200)
    yt, gt = _values_1d(xt)
    res = gp.test(xt[None], predict_gradient=True)
    mae = np.abs(res.get_mean(0) - yt).mean()
    mae_g = np.abs(res.get_gradient(0)[0] - gt).mean()
    assert mae < 1.0e-4, mae
    assert mae_g < 0.0025, mae_g
    assert abs(mae - 7.377464439757659e-05) < 1e-12, mae
    assert abs(mae_g - 0.0024347632450979033) < 1e-11, mae_g


@pytest.mark.parametrize("kernel", ["rbf", "matern32"])
def test_gradient_blocks_match_autodiff(kernel):
    """The analytic dk/dx2 and d2k/dx1dx2 blocks must match jax.jacfwd of the
    kernel function (validates the hand-derived NIGP gram math)."""
    from erl_gaussian_process_tpu.kernels import kernel_fn

    scale = 0.37
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.uniform(-1, 1, (4, 2)))
    x2 = jnp.asarray(rng.uniform(-1, 1, (3, 2)))
    k, dk, d2k = _blocks(kernel, x1, x2, scale)

    kf = kernel_fn(kernel)

    def k_scalar(a, b):
        return kf(a[None, :], b[None, :], scale)[0, 0]

    dk_ad = jax.vmap(lambda a: jax.vmap(
        lambda b: jax.jacfwd(k_scalar, argnums=1)(a, b))(x2))(x1)
    d2k_ad = jax.vmap(lambda a: jax.vmap(
        lambda b: jax.jacfwd(jax.jacfwd(k_scalar, argnums=1), argnums=0)(a, b)
    )(x2))(x1)
    np.testing.assert_allclose(dk, dk_ad, atol=1e-10)
    # d2k_ad[i, j, l, k] = d^2 k / dx2_l dx1_k -> transpose to (k, l)
    np.testing.assert_allclose(d2k, d2k_ad.transpose(0, 1, 3, 2), atol=1e-10)


def test_2d_with_gradient_observation():
    """Reduced-size port of test_noisy_input_gp.cpp:354-560 (30x30 grid
    instead of 50x50; asserts generous bounds, the exact math being pinned by
    the 1-D goldens)."""
    n = 30
    x = np.linspace(-2.0, 2.0, n)
    y = np.linspace(-1.0, 1.0, n)
    xv, yv = np.meshgrid(x, y, indexing="ij")
    pts = np.stack([xv.ravel(), yv.ravel()], axis=0)
    z = 2 * np.sin(10.0 * pts[0]) * np.cos(5.0 * pts[1])
    gx = 20 * np.cos(10.0 * pts[0]) * np.cos(5.0 * pts[1])
    gy = -10 * np.sin(10.0 * pts[0]) * np.sin(5.0 * pts[1])

    setting = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=2, scale=0.15),
        max_num_samples=n * n)
    gp = NoisyInputGaussianProcess(setting)
    grad = np.stack([gx, gy], axis=0)  # (d*q, n) with q=1
    assert gp.train(pts, z, grad, var_x=NOISE_VAR, var_y=NOISE_VAR,
                    var_grad=NOISE_VAR)

    res = gp.test(pts, predict_gradient=True)
    assert np.abs(res.get_mean(0) - z).mean() < 1e-3
    g = res.get_gradient(0)
    assert np.abs(g[0] - gx).mean() < 0.05
    assert np.abs(g[1] - gy).mean() < 0.05
    cov = res.get_covariance()
    assert cov.shape == (3, n * n)


def test_grad_flag_masking_matches_packed():
    """Samples with grad_flag=0 must behave exactly as if their gradient rows
    were never in the system (the reference packs them out,
    src/noisy_input_gp.cpp:845-868; we mask identity rows)."""
    rng = np.random.default_rng(2)
    n = 24
    x = np.sort(rng.uniform(0, 2 * np.pi, n))
    y, g = _values_1d(x)
    flag = rng.uniform(size=n) < 0.5

    setting = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.4),
        max_num_samples=n)
    gp = NoisyInputGaussianProcess(setting)
    gp.train(x[None], y, g[None], var_x=1e-4, var_y=1e-4, var_grad=1e-4,
             grad_flag=flag)
    xt = np.linspace(0, 2 * np.pi, 50)
    pred = gp.test(xt[None], predict_gradient=True)

    # dense numpy reference with only flagged gradient rows packed
    s = 0.4
    def k(a, b):
        return np.exp(-(a[:, None] - b[None, :]) ** 2 / (2 * s * s))
    def dk(a, b):  # d/db
        return (a[:, None] - b[None, :]) / (s * s) * k(a, b)
    def d2k(a, b):
        return (1 / (s * s) - (a[:, None] - b[None, :]) ** 2 / s ** 4) * k(a, b)

    xf = x[flag]
    K = np.block([
        [k(x, x) + np.diag(np.full(n, 2e-4)), dk(x, xf)],
        [-dk(xf, x), d2k(xf, xf) + np.diag(np.full(flag.sum(), 1e-4))]])
    rhs = np.concatenate([y, g[flag]])
    alpha = np.linalg.solve(K, rhs)
    ktm = np.vstack([k(x, xt), -dk(xf, xt)])
    np.testing.assert_allclose(pred.get_mean(0), ktm.T @ alpha, atol=1e-10)


def test_multi_output_equals_per_column():
    """2-output NIGP with a shared kernel must equal two single-output fits
    column-by-column (the reference's multi-output design: shared L,
    per-column alpha — mirrors test_noisy_input_gp.cpp's 2-output cases)."""
    n = 60
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 2 * np.pi, n))
    y2 = np.stack([np.sin(2 * x), np.cos(x)], axis=-1)          # (n, 2)
    g2 = np.stack([2 * np.cos(2 * x), -np.sin(x)], axis=0)      # (d*q, n)
    xt = np.linspace(0.2, 2 * np.pi - 0.2, 80)

    def make(q_y, q_g):
        s = NoisyInputGaussianProcess.Setting(
            kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.25),
            max_num_samples=n, no_gradient_observation=False)
        gp = NoisyInputGaussianProcess(s)
        assert gp.train(x[None], q_y, q_g, var_x=NOISE_VAR, var_y=NOISE_VAR,
                        var_grad=NOISE_VAR)
        return gp.test(xt[None], predict_gradient=True)

    res2 = make(y2, g2)
    for j in range(2):
        res1 = make(y2[:, j:j + 1], g2[j:j + 1])
        np.testing.assert_allclose(res2.get_mean(j), res1.get_mean(0),
                                   atol=1e-12)
        np.testing.assert_allclose(res2.get_gradient(j), res1.get_gradient(0),
                                   atol=1e-12)
    # shared-kernel variances are output-independent
    np.testing.assert_allclose(res2.get_mean_variance(),
                               make(y2[:, :1], g2[:1]).get_mean_variance(),
                               atol=1e-12)


def test_fast_variance_path_matches_trsm():
    """From the second variance query on, the serving path whitens with the
    amortized explicit L^{-1} GEMM (nigp_l_inv) — results must match the
    first-query triangular-solve path to solver precision."""
    rng = np.random.default_rng(5)
    n = 40
    x = np.sort(rng.uniform(-1, 1, n))
    y = np.sin(3 * x)[:, None]
    g = (3 * np.cos(3 * x))[None, :]
    s = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.3),
        max_num_samples=n, no_gradient_observation=False)
    gp = NoisyInputGaussianProcess(s)
    assert gp.train(x[None], y, g, var_x=1e-6, var_y=1e-6, var_grad=1e-4)
    xt = np.linspace(-1, 1, 33)

    r1 = gp.test(xt[None], predict_gradient=True)
    v1, gv1, c1 = (r1.get_mean_variance(), r1.get_gradient_variance(),
                   r1.get_covariance())
    assert gp._L_inv is None          # first query: triangular path
    r2 = gp.test(xt[None], predict_gradient=True)
    v2, gv2, c2 = (r2.get_mean_variance(), r2.get_gradient_variance(),
                   r2.get_covariance())
    assert gp._L_inv is not None      # second query: amortized GEMM path
    np.testing.assert_allclose(v2, v1, atol=1e-10)
    np.testing.assert_allclose(gv2, gv1, atol=1e-10)
    np.testing.assert_allclose(c2, c1, atol=1e-10)


@pytest.mark.skipif(os.environ.get("ERL_GP_HEAVY") != "1",
                    reason="7500^2 joint system, ~50 s on CPU f64 — "
                           "run with ERL_GP_HEAVY=1")
def test_2d_with_gradient_full_reference_size():
    """The reference's heaviest case at FULL size (test_noisy_input_gp.cpp:
    354-560: 50x50 grid -> 7500^2 joint system, scale=0.1). The observed
    MAEs match the reference's recorded values to every recorded digit —
    exact golden parity on the largest single factorization in the
    reference's suite. (The fast suite covers this case at reduced size
    with jacfwd cross-validation.)"""
    n = 50
    xs = np.linspace(-2, 2, n)
    ys = np.linspace(-1, 1, n)
    pts = np.array([[x, y] for x in xs for y in ys]).T          # (2, 2500)
    z = 2 * np.sin(10 * pts[0]) * np.cos(5 * pts[1])
    grad = np.stack([20 * np.cos(10 * pts[0]) * np.cos(5 * pts[1]),
                     -10 * np.sin(10 * pts[0]) * np.sin(5 * pts[1])])
    s = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=2, scale=0.1),
        max_num_samples=2500, no_gradient_observation=False)
    gp = NoisyInputGaussianProcess(s)
    assert gp.train(pts, z, grad, var_x=NOISE_VAR, var_y=NOISE_VAR,
                    var_grad=NOISE_VAR)
    nt = 100
    xt = np.linspace(-2, 2, nt)
    yt = np.linspace(-1, 1, nt)
    qt = np.array([[x, y] for x in xt for y in yt]).T
    zt = 2 * np.sin(10 * qt[0]) * np.cos(5 * qt[1])
    res = gp.test(qt, predict_gradient=True)
    mae = np.abs(res.get_mean(0) - zt).mean()
    g = res.get_gradient(0)
    mx = np.abs(g[0] - 20 * np.cos(10 * qt[0]) * np.cos(5 * qt[1])).mean()
    my = np.abs(g[1] + 10 * np.sin(10 * qt[0]) * np.sin(5 * qt[1])).mean()
    # reference bounds (test_noisy_input_gp.cpp:556-558) and recorded
    # observations (:554) — matched to every recorded digit
    assert mae < 1.0e-5 and mx < 1.1e-4 and my < 2.6e-4, (mae, mx, my)
    assert abs(mae - 9.516671456234042e-06) < 1e-12, mae
    assert abs(mx - 0.00010712550862064423) < 1e-11, mx
    assert abs(my - 0.0002508214688791491) < 1e-11, my


def _grid_pts(n, xmin, xmax, ymin, ymax):
    xs = np.linspace(xmin, xmax, n)
    ys = np.linspace(ymin, ymax, n)
    return np.array([[x, y] for x in xs for y in ys]).T   # reference order


def test_2d_without_gradient_full_reference_size():
    """Full-size port of MultiInputSingleOutputWithoutGradientObservation
    (test_noisy_input_gp.cpp:561-760: 50x50 grid, scale=0.15) — MAEs match
    the reference's recorded values (:757) to ~12 digits. A 2500^2 value-
    only system, cheap enough for every run."""
    pts = _grid_pts(50, -2, 2, -1, 1)
    z = 2 * np.sin(10 * pts[0]) * np.cos(5 * pts[1])
    s = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=2, scale=0.15),
        max_num_samples=2500, no_gradient_observation=True)
    gp = NoisyInputGaussianProcess(s)
    assert gp.train(pts, z, var_x=NOISE_VAR, var_y=NOISE_VAR)
    qt = _grid_pts(100, -2, 2, -1, 1)
    res = gp.test(qt, predict_gradient=True)
    mae = np.abs(res.get_mean(0)
                 - 2 * np.sin(10 * qt[0]) * np.cos(5 * qt[1])).mean()
    g = res.get_gradient(0)
    mx = np.abs(g[0] - 20 * np.cos(10 * qt[0]) * np.cos(5 * qt[1])).mean()
    my = np.abs(g[1] + 10 * np.sin(10 * qt[0]) * np.sin(5 * qt[1])).mean()
    assert mae < 3.4e-4 and mx < 0.01 and my < 0.015, (mae, mx, my)
    assert abs(mae - 0.0003368450993049195) < 1e-13, mae
    assert abs(mx - 0.009407525172327099) < 1e-12, mx
    assert abs(my - 0.014184702590183184) < 1e-12, my


def _two_output_values(q):
    z1 = 2 * np.sin(10 * q[0]) * np.cos(10 * q[1])
    z2 = 3 * (np.sin(10 * q[0]) + np.cos(10 * q[1]))
    g = [(20 * np.cos(10 * q[0]) * np.cos(10 * q[1]),
          -20 * np.sin(10 * q[0]) * np.sin(10 * q[1])),
         (30 * np.cos(10 * q[0]), -30 * np.sin(10 * q[1]))]
    return z1, z2, g


def test_2d_two_output_without_gradient_full_reference_size():
    """Full-size MultiInputMultiOutputWithoutGradientObservation
    (test_noisy_input_gp.cpp:1004-end: 50x50 grid on [-1,1]^2, scale=0.1)
    — output-0 MAEs match the recorded sweep line (:1228) to ~12 digits."""
    pts = _grid_pts(50, -1, 1, -1, 1)
    z1, z2, _ = _two_output_values(pts)
    s = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=2, scale=0.1),
        max_num_samples=2500, no_gradient_observation=True)
    gp = NoisyInputGaussianProcess(s)
    assert gp.train(pts, np.stack([z1, z2], axis=-1),
                    var_x=NOISE_VAR, var_y=NOISE_VAR)
    qt = _grid_pts(100, -1, 1, -1, 1)
    z1t, z2t, gt = _two_output_values(qt)
    res = gp.test(qt, predict_gradient=True)
    mae0 = np.abs(res.get_mean(0) - z1t).mean()
    g0 = res.get_gradient(0)
    assert abs(mae0 - 0.000250581062775504) < 1e-13, mae0
    assert abs(np.abs(g0[0] - gt[0][0]).mean()
               - 0.014144193031284197) < 1e-12
    assert abs(np.abs(g0[1] - gt[0][1]).mean()
               - 0.010989238198062933) < 1e-12


@pytest.mark.skipif(os.environ.get("ERL_GP_HEAVY") != "1",
                    reason="7500^2 joint system, ~50 s on CPU f64 — "
                           "run with ERL_GP_HEAVY=1")
def test_2d_two_output_with_gradient_full_reference_size():
    """Full-size MultiInputMultiOutputWithGradientObservation
    (test_noisy_input_gp.cpp:763-1002: 50x50 grid on [-1,1]^2, scale=0.15,
    both outputs with gradients -> 7500^2 joint system, 2 alpha columns).
    All six MAEs match the recorded values (:990-996) to ~10 digits."""
    pts = _grid_pts(50, -1, 1, -1, 1)
    z1, z2, g = _two_output_values(pts)
    grad = np.stack([g[0][0], g[0][1], g[1][0], g[1][1]])
    s = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=2, scale=0.15),
        max_num_samples=2500, no_gradient_observation=False)
    gp = NoisyInputGaussianProcess(s)
    assert gp.train(pts, np.stack([z1, z2], axis=-1), grad,
                    var_x=NOISE_VAR, var_y=NOISE_VAR, var_grad=NOISE_VAR)
    qt = _grid_pts(100, -1, 1, -1, 1)
    z1t, z2t, gt = _two_output_values(qt)
    res = gp.test(qt, predict_gradient=True)
    recorded = [(6.205702021195462e-06, 0.00016324462241659358,
                 0.0002209177886253753),
                (1.1967913545722718e-05, 0.000292787449896784,
                 0.00034572267944076794)]
    for d, ztt in enumerate([z1t, z2t]):
        mae = np.abs(res.get_mean(d) - ztt).mean()
        gg = res.get_gradient(d)
        mx = np.abs(gg[0] - gt[d][0]).mean()
        my = np.abs(gg[1] - gt[d][1]).mean()
        r = recorded[d]
        assert abs(mae - r[0]) < 1e-12, (d, mae)
        assert abs(mx - r[1]) < 1e-11, (d, mx)
        assert abs(my - r[2]) < 1e-11, (d, my)
