"""Golden-accuracy tests for SparsePseudoInputGaussianProcess, ported from
the reference's test/gtest/test_sparse_pseudo_input_gp.cpp."""

import numpy as np

from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.models import SparsePseudoInputGaussianProcess

NOISE_VAR = 0.001


def _make_1d(n=1000, m=20):
    setting = SparsePseudoInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.6),
        max_num_samples=n)
    pseudo = np.linspace(0, 2 * np.pi, m)
    gp = SparsePseudoInputGaussianProcess(setting, pseudo[None, :])
    x = np.linspace(0, 2 * np.pi, n)
    y = np.sin(x)
    return gp, x, y


def test_single_input_single_output(tmp_path):
    # reference: test_sparse_pseudo_input_gp.cpp:11-117 (m=20, n=1000,
    # scale=0.6); observed MAE 1.3952e-4 (< 4.02e-4)
    gp, x, y = _make_1d()
    assert gp.update(x[None], y, NOISE_VAR)
    xt = np.linspace(0, 2 * np.pi, 200)
    res = gp.test(xt[None], predict_gradient=False)
    mae = np.abs(res.get_mean(0) - np.sin(xt)).mean()
    assert mae < 4.02e-4, mae
    # Q_M accumulates ~1e5-magnitude sums; reduction order across backends
    # shifts the solve at the 1e-8 level, so match the reference's observed
    # value loosely (the hard contract is the assert bound above)
    assert abs(mae - 1.3951539277877418e-4) < 1e-7, mae
    var = res.get_variance()
    assert var.shape == (200,) and np.all(np.isfinite(var))

    path = str(tmp_path / "spgp.npz")
    gp.save(path)
    gp2, _, _ = _make_1d()
    gp2.load(path)
    assert gp == gp2


def test_incremental_equals_batch():
    """Accumulating the same data in chunks must equal one batch update
    (the streaming-FITC contract, sparse_pseudo_input_gp.hpp:13-33)."""
    gp1, x, y = _make_1d(n=600)
    gp2, _, _ = _make_1d(n=600)
    gp1.update(x[None], y, NOISE_VAR)
    gp2.update(x[None, :200], y[:200], NOISE_VAR)
    gp2.update(x[None, 200:450], y[200:450], NOISE_VAR)
    gp2.update(x[None, 450:], y[450:], NOISE_VAR)
    # chunked accumulation reassociates the GEMM sums -> fp64-level drift
    # relative to entry magnitudes (~1e4)
    np.testing.assert_allclose(gp1.mat_qm, gp2.mat_qm, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(gp1.mat_alpha, gp2.mat_alpha, rtol=1e-8,
                               atol=1e-8)


def test_multi_input_multi_output():
    # reference: test_sparse_pseudo_input_gp.cpp:119-231, :233-392
    # (m=400 pseudo grid, n=2500); observed MAE 1.75e-3 / 3.48e-3
    m, n = 20, 50
    x = np.linspace(-1.0, 1.0, n)
    y = np.linspace(-1.0, 1.0, n)
    xv, yv = np.meshgrid(x, y, indexing="ij")
    pts = np.stack([xv.ravel(), yv.ravel()], axis=0)
    z1 = 2 * np.sin(10.0 * pts[0]) * np.cos(10.0 * pts[1])
    z2 = 3 * (np.sin(10.0 * pts[0]) + np.cos(10.0 * pts[1]))

    # pseudo grid: m x m lattice spanning the box (endpoints included)
    c = np.linspace(-1.0, 1.0, m)
    pv, qv = np.meshgrid(c, c, indexing="ij")
    pseudo = np.stack([pv.ravel(), qv.ravel()], axis=0)

    setting = SparsePseudoInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=2, scale=0.17),
        max_num_samples=n * n)
    gp = SparsePseudoInputGaussianProcess(setting, pseudo, y_dim=2)
    assert gp.update(pts, np.stack([z1, z2], axis=1), NOISE_VAR)

    nt = 60
    t = np.linspace(-1.0, 1.0, nt)
    tv, uv = np.meshgrid(t, t, indexing="ij")
    pts_t = np.stack([tv.ravel(), uv.ravel()], axis=0)
    z1_t = 2 * np.sin(10.0 * pts_t[0]) * np.cos(10.0 * pts_t[1])
    z2_t = 3 * (np.sin(10.0 * pts_t[0]) + np.cos(10.0 * pts_t[1]))
    res = gp.test(pts_t, predict_gradient=True)
    mae1 = np.abs(res.get_mean(0) - z1_t).mean()
    mae2 = np.abs(res.get_mean(1) - z2_t).mean()
    assert mae1 < 1.8e-3, mae1   # reference observed 1.75e-3
    # reference observed 3.48e-3 on its GridMapInfo pseudo lattice;
    # our lattice differs at the boundary, costing ~8%% here
    assert mae2 < 4.0e-3, mae2
    g = res.get_gradient(0)
    assert g.shape == (2, nt * nt) and np.all(np.isfinite(g))


def test_diagonal_qm_mode():
    setting = SparsePseudoInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.6),
        max_num_samples=200, diagonal_qm=True)
    pseudo = np.linspace(0, 2 * np.pi, 20)
    gp = SparsePseudoInputGaussianProcess(setting, pseudo[None, :])
    x = np.linspace(0, 2 * np.pi, 200)
    gp.update(x[None], np.sin(x), NOISE_VAR)
    pred = gp.test(x[None, ::10]).get_mean(0)
    assert np.all(np.isfinite(pred))
