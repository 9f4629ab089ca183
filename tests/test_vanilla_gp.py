"""Golden-accuracy tests for VanillaGaussianProcess, ported from the
reference's test/gtest/test_vanilla_gp.cpp (same synthetic functions, same
thresholds; observed reference values in comments)."""

import numpy as np
import pytest

from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.models import VanillaGaussianProcess
from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting

NOISE_VAR = 0.001


def _grid2d(n, x_min=-1.0, x_max=1.0, y_min=-1.0, y_max=1.0):
    x = np.linspace(x_min, x_max, n)
    y = np.linspace(y_min, y_max, n)
    # reference iterates x-major (xi outer, yi inner), test_vanilla_gp.cpp:118
    xv, yv = np.meshgrid(x, y, indexing="ij")
    return np.stack([xv.ravel(), yv.ravel()], axis=0)  # (2, n*n)


def test_single_input_single_output(tmp_path):
    # reference: test_vanilla_gp.cpp:13-110, observed MAE 2.4246e-4 (< 3e-4)
    n = 100
    setting = VanillaGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.5),
        max_num_samples=n)
    gp = VanillaGaussianProcess(setting)
    x = np.linspace(0, 2 * np.pi, n)
    y = np.sin(x)
    assert gp.train(x[None, :], y, np.full(n, NOISE_VAR))

    x_test = np.linspace(0, 2 * np.pi, 200)
    res = gp.test(x_test[None, :])
    y_pred = res.get_mean(0)
    mae = np.abs(y_pred - np.sin(x_test)).mean()
    assert mae < 3.0e-4, mae
    # match the reference's own observed value to float64 round-off
    assert abs(mae - 2.4246430481069056e-4) < 1e-12, mae

    var = res.get_variance()
    assert var.shape == (200,)
    assert np.all(var > 0) and np.all(var < NOISE_VAR * 10)

    # serialization round-trip equality (reference :106-109)
    path = str(tmp_path / "vanilla_gp.npz")
    gp.save(path)
    gp2 = VanillaGaussianProcess(VanillaGaussianProcess.Setting())
    gp2.load(path)
    assert gp == gp2
    res2 = gp2.test(x_test[None, :])
    np.testing.assert_array_equal(res.get_mean(0), res2.get_mean(0))


def test_multi_input_single_output():
    # reference: test_vanilla_gp.cpp:112-221, observed MAE 5.0356e-4 (< 5.1e-4)
    n = 50
    pts = _grid2d(n)
    z = 2 * np.sin(10.0 * pts[0]) * np.cos(10.0 * pts[1])
    setting = VanillaGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=2, scale=0.1),
        max_num_samples=n * n)
    gp = VanillaGaussianProcess(setting)
    assert gp.train(pts, z, np.full(n * n, NOISE_VAR))

    pts_t = _grid2d(100)
    z_t = 2 * np.sin(10.0 * pts_t[0]) * np.cos(10.0 * pts_t[1])
    z_pred = gp.test(pts_t).get_mean(0)
    mae = np.abs(z_pred - z_t).mean()
    assert mae < 5.1e-4, mae
    assert abs(mae - 5.035569336460338e-4) < 1e-10, mae


def test_multi_input_multi_output():
    # reference: test_vanilla_gp.cpp:223-373, MAE 5.04e-4 / 1.13e-3
    n = 50
    pts = _grid2d(n)
    z1 = 2 * np.sin(10.0 * pts[0]) * np.cos(10.0 * pts[1])
    z2 = 3 * (np.sin(10.0 * pts[0]) + np.cos(10.0 * pts[1]))
    setting = VanillaGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=2, scale=5 * 1.0 / n),
        max_num_samples=n * n)
    gp = VanillaGaussianProcess(setting)
    assert gp.train(pts, np.stack([z1, z2], axis=1), np.full(n * n, NOISE_VAR))

    pts_t = _grid2d(100)
    z1_t = 2 * np.sin(10.0 * pts_t[0]) * np.cos(10.0 * pts_t[1])
    z2_t = 3 * (np.sin(10.0 * pts_t[0]) + np.cos(10.0 * pts_t[1]))
    res = gp.test(pts_t)
    mae1 = np.abs(res.get_mean(0) - z1_t).mean()
    mae2 = np.abs(res.get_mean(1) - z2_t).mean()
    assert mae1 < 5.1e-4, mae1   # reference observed 5.0356e-4
    assert mae2 < 1.2e-3, mae2   # reference observed 1.1258e-3


def test_padded_equals_exact():
    """Identity-padding must not change results vs an exact-size fit."""
    rng = np.random.default_rng(0)
    n = 37
    x = rng.uniform(0, 2 * np.pi, n)
    y = np.sin(x)
    s_exact = VanillaGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(scale=0.5), max_num_samples=n)
    s_pad = VanillaGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(scale=0.5),
        max_num_samples=64)
    g1 = VanillaGaussianProcess(s_exact)
    g2 = VanillaGaussianProcess(s_pad)
    g1.train(x[None], y, 1e-3)
    g2.train(x[None], y, 1e-3)
    xt = np.linspace(0, 2 * np.pi, 50)
    np.testing.assert_allclose(
        g1.test(xt[None]).get_mean(0), g2.test(xt[None]).get_mean(0),
        rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        g1.test(xt[None]).get_variance(), g2.test(xt[None]).get_variance(),
        rtol=0, atol=1e-12)


@pytest.mark.parametrize("kernel", ["rbf", "matern32", "ou"])
def test_kernel_families_fit(kernel):
    """All three reference kernel families train and interpolate."""
    n = 200
    x = np.linspace(0, 2 * np.pi, n)
    y = np.sin(x)
    setting = VanillaGaussianProcess.Setting(
        kernel_type=kernel, kernel=KernelSetting(scale=0.5),
        max_num_samples=n)
    gp = VanillaGaussianProcess(setting)
    assert gp.train(x[None], y, 1e-4)
    pred = gp.test(x[None]).get_mean(0)
    assert np.abs(pred - y).mean() < 5e-3


def test_repeated_variance_queries_use_consistent_fast_path():
    """From the second variance query on, whitening switches to the
    amortized L^{-1} GEMM; results must match the triangular-solve path to
    float roundoff."""
    rng = np.random.default_rng(0)
    gp = VanillaGaussianProcess(VanillaGPSetting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.3)))
    x = np.sort(rng.uniform(-1, 1, 120))[None, :]
    gp.train(x, np.sin(3 * x[0])[:, None], np.full(120, 1e-4))
    xq = np.linspace(-0.8, 0.8, 75)[None, :]
    v1 = gp.test(xq).get_variance()          # trsm path
    assert gp._L_inv is None
    v2 = gp.test(xq).get_variance()          # switches to L_inv GEMM
    assert gp._L_inv is not None
    v3 = gp.test(xq + 0.01).get_variance()   # reuses cache
    np.testing.assert_allclose(v2, v1, rtol=1e-9, atol=1e-12)
    assert np.all(np.isfinite(v3)) and np.all(v3 <= 1.0)
    # retrain invalidates the cache
    gp.train(x, np.cos(2 * x[0])[:, None], np.full(120, 1e-4))
    assert gp._L_inv is None and gp._var_queries == 0
