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


def _thresholded_reference(pseudo, x, y, var, scale, thr):
    """scipy.sparse reference of the reference's UpdateSparse chain
    (src/sparse_pseudo_input_gp.cpp:793-832): threshold K_MN, per-column
    beta solve + lambda scaling, Q_M/alpha accumulation, then the
    thresholded-Ktest posterior (TestResult ctor, :55-109)."""
    import scipy.linalg as sla
    import scipy.sparse as sp

    M = pseudo.shape[0]
    r2 = ((pseudo[:, None, :] - pseudo[None, :, :]) ** 2).sum(-1)
    K_M = np.exp(-0.5 * r2 / scale**2)
    L_km = np.linalg.cholesky(K_M)
    r2 = ((pseudo[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    kmn = np.exp(-0.5 * r2 / scale**2)
    kmn[np.abs(kmn) < thr] = 0.0
    kmn_s = sp.csc_matrix(kmn)            # the reference's SparseMatrix
    kmn_scaled = kmn_s.copy().toarray()
    for i in range(x.shape[0]):
        beta = sla.solve_triangular(L_km, kmn_s[:, i].toarray()[:, 0],
                                    lower=True)
        # the rebuild's lambda clamp (applied on the dense path too):
        # thresholding can push ||beta||^2 past 1 LEGITIMATELY (not just
        # float roundoff), where the reference's unclamped 1/(lam+var)
        # can flip the column weight's sign and break Q_M's PSD-ness —
        # the clamp bounds the weight at 1/var instead (documented with
        # deviation #1 in docs/parity.md)
        lam = max(1.0 - beta @ beta, 0.0)
        kmn_scaled[:, i] *= 1.0 / (lam + var[i])
    qm = K_M + kmn_scaled @ kmn_s.T.toarray()
    alpha = kmn_scaled @ y
    return L_km, qm, alpha


def test_use_sparse_reproduces_reference_thresholded_chain():
    """use_sparse=True must equal the reference's UpdateSparse math (a
    scipy.sparse implementation of the thresholded chain) — the masked
    dense computation and the sparse data structure are the same
    arithmetic. An aggressive threshold makes the result genuinely
    different from the dense path, so this cannot pass by accident."""
    rng = np.random.default_rng(0)
    n, m = 300, 16
    x = np.sort(rng.uniform(0, 2 * np.pi, n))
    y = np.sin(x)
    var = np.full(n, 1e-3)
    thr = 0.05   # aggressive: drops ~half the gram at scale=0.6
    setting = SparsePseudoInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.6),
        max_num_samples=n, use_sparse=True, sparse_zero_threshold=thr)
    pseudo = np.linspace(0, 2 * np.pi, m)
    gp = SparsePseudoInputGaussianProcess(setting, pseudo[None, :])
    assert gp.update(x[None], y, var)

    L_km, qm_ref, alpha_ref = _thresholded_reference(
        pseudo[:, None], x[:, None], y[:, None], var, 0.6, thr)
    np.testing.assert_allclose(np.asarray(gp.state.qm), qm_ref,
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gp.state.alpha), alpha_ref,
                               rtol=1e-9, atol=1e-11)

    # the dense path at the same data must differ (the threshold bites)
    dsetting = SparsePseudoInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.6),
        max_num_samples=n)
    gpd = SparsePseudoInputGaussianProcess(dsetting, pseudo[None, :])
    gpd.update(x[None], y, var)
    assert np.abs(np.asarray(gpd.state.qm) - qm_ref).max() > 1e-6

    # thresholded predict: posterior still reference-quality at a sane
    # threshold, and the Ktest thresholding is applied (prediction far
    # from every pseudo point sees an all-zero k* -> prior)
    xt = np.linspace(0.3, 2 * np.pi - 0.3, 100)
    res = gp.test(xt[None])
    mae = np.abs(res.get_mean(0) - np.sin(xt)).mean()
    assert mae < 5e-2, mae
    far = gp.test(np.array([[1e3]]))
    assert abs(far.get_mean(0)[0]) < 1e-12
    assert abs(far.get_variance()[0] - 1.0) < 1e-9


def test_use_sparse_tiny_threshold_matches_dense():
    """At the reference's default threshold (1e-6) the sparse and dense
    posteriors agree to O(n * threshold * FITC amplification) — a real
    tail of the gram IS dropped (RBF decays past 1e-6 within ~3 length
    scales), so agreement is close but not bitwise; this pins the scale
    of the approximation the reference's own two paths differ by."""
    gp_dense, x, y = _make_1d(n=400)
    setting = SparsePseudoInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.6),
        max_num_samples=400, use_sparse=True)
    gp_sp = SparsePseudoInputGaussianProcess(
        setting, np.linspace(0, 2 * np.pi, 20)[None, :])
    gp_dense.update(x[None], y, NOISE_VAR)
    gp_sp.update(x[None], y, NOISE_VAR)
    xt = np.linspace(0, 2 * np.pi, 200)
    md = gp_dense.test(xt[None]).get_mean(0)
    ms = gp_sp.test(xt[None]).get_mean(0)
    np.testing.assert_allclose(ms, md, rtol=1e-2, atol=1e-4)
    assert np.abs(ms - md).max() > 0  # the threshold does bite


def test_use_sparse_checkpoint_round_trip(tmp_path):
    setting = SparsePseudoInputGaussianProcess.Setting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.6),
        max_num_samples=100, use_sparse=True, sparse_zero_threshold=0.02)
    gp = SparsePseudoInputGaussianProcess(
        setting, np.linspace(0, 2 * np.pi, 12)[None, :])
    x = np.linspace(0, 2 * np.pi, 100)
    gp.update(x[None], np.sin(x), NOISE_VAR)
    p = str(tmp_path / "spgp_sparse.npz")
    gp.save(p)
    gp2 = SparsePseudoInputGaussianProcess(
        SparsePseudoInputGaussianProcess.Setting(),
        np.zeros((1, 1)))
    gp2.load(p)
    assert gp2._zero_threshold == 0.02
    xt = np.linspace(0, 2 * np.pi, 50)
    np.testing.assert_array_equal(gp.test(xt[None]).get_mean(0),
                                  gp2.test(xt[None]).get_mean(0))


def test_kahan_accumulation_survives_xla():
    """gp_core.kahan_add relies on XLA NOT reassociating float adds: if the
    compiler simplified ``(t - s) - y`` to zero, the compensation would be
    identically 0 and streaming accumulation would silently revert to plain
    f32 drift. Accumulate 4096 below-ulp increments onto 1e8 under jit+scan
    (the exact structure of the FITC replay): plain f32 loses all of them;
    the compensated pair must recover the sum exactly."""
    import jax
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.models.gp_core import kahan_add

    @jax.jit
    def run():
        def body(carry, _):
            s, c, plain = carry
            d = jnp.full((8, 128), 1.0, jnp.float32)
            s, c = kahan_add(s, c, d)
            return (s, c, plain + d), None
        z = jnp.full((8, 128), 1e8, jnp.float32)
        (s, c, plain), _ = jax.lax.scan(
            body, (z, jnp.zeros_like(z), z), None, length=4096)
        return s, c, plain

    s, c, plain = run()
    # plain f32: every add of 1.0 rounds away (ulp(1e8) = 8)
    assert float(np.asarray(plain)[0, 0]) == 1e8
    got = np.asarray(s, np.float64) - np.asarray(c, np.float64)
    np.testing.assert_array_equal(got, np.full((8, 128), 1e8 + 4096))


def test_long_horizon_compensated_accumulation_exact_sum():
    """What the compensation guarantees: the stored (qm, qm_c) pair tracks
    the EXACT sum of the f32 pipeline's own increments, with no growth in
    T — where the plain f32 running sum drifts by ~sqrt(T)*eps*||Q_M||.

    Repeating the identical batch makes every update's increment
    bitwise-identical (same jitted program, same inputs), so the exact
    reference is K_M + T*dq with dq recovered from the first update's own
    compensated state — isolating summation error from the (separate,
    systematic) f32-vs-f64 forward error of the increments themselves,
    which no summation scheme can remove and which the end-to-end
    f32-vs-f64 posterior gates measure instead
    (test_spgp_occupancy_map.test_float32_matches_float64_posterior and
    the bench's 983-pose drift gate)."""
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        spgp_init,
        spgp_update,
    )

    rng = np.random.default_rng(0)
    pseudo = rng.uniform(-1, 1, (32, 2)).astype(np.float32)
    r = np.random.default_rng(99)
    x = jnp.asarray(r.uniform(-1, 1, (64, 2)).astype(np.float32))
    y = jnp.asarray(r.uniform(-1, 1, (64, 1)).astype(np.float32))
    var = jnp.full((64,), np.float32(1e-3))
    mask = jnp.ones((64,), bool)

    def upd(st):
        return spgp_update(st, x, y, var, mask, np.float32(0.4),
                           kernel="matern32")

    st0 = spgp_init(jnp.asarray(pseudo), np.float32(0.4), kernel="matern32")
    km = np.asarray(st0.qm, np.float64)
    st = upd(st0)
    # the first update's compensated state recovers K_M + dq to ~1e-14:
    # dq (in f64) = (qm1 - qm1_c) - K_M
    dq = (np.asarray(st.qm, np.float64) - np.asarray(st.qm_c, np.float64)
          - km)
    T = 1200
    for _ in range(T - 1):
        st = upd(st)
    exact = km + T * dq
    scale = np.abs(exact).max()
    raw_err = np.abs(np.asarray(st.qm, np.float64) - exact).max()
    comp = (np.asarray(st.qm, np.float64)
            - np.asarray(st.qm_c, np.float64))
    comp_err = np.abs(comp - exact).max()
    # compensated: no T-growth — stays ~ulp-of-one-increment above exact
    assert comp_err / scale < 1e-6, (comp_err / scale, raw_err / scale)
    # the compensation is live in the real update pipeline (not fused away)
    # and at least as good as the raw estimate (identical increments are a
    # benign case for plain f32, so the margin here is modest; the
    # synthetic kahan test above shows the adversarial-case gap)
    assert np.abs(np.asarray(st.qm_c)).max() > 0
    assert comp_err <= raw_err, (comp_err, raw_err, scale)


def test_prepare_exact_host_refactorization_no_jitter(caplog):
    """A long-accumulated f32 Q_M whose chol is numerically indefinite at
    f32 (lambda_min/diag below f32 resolution) but SPD at f64 must be
    served through the EXACT float64 host refactorization — finite
    posterior, no jitter warning (the r4 bench's host_jitter_retry fired
    here; VERDICT r4 weak #1)."""
    import logging

    import jax.numpy as jnp

    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SparsePseudoInputGaussianProcess,
        SpGpSetting,
    )

    rng = np.random.default_rng(3)
    pseudo = rng.uniform(-1, 1, (2, 48))      # (d, M) reference layout
    gp = SparsePseudoInputGaussianProcess(
        SpGpSetting(kernel_type="matern32",
                    kernel=KernelSetting(x_dim=2, scale=0.6),
                    max_num_samples=32),
        pseudo, dtype=np.float32)
    # the same 24 samples re-observed many times at tiny noise: Q_M's
    # data-spanned eigenvalues grow ~T/var while the others stay at
    # lambda_min(K_M) -> conditioning walks past 1/eps_f32
    x = rng.uniform(-1, 1, (24, 2)).astype(np.float32)
    y = rng.uniform(-1, 1, (24, 1)).astype(np.float32)
    for _ in range(400):
        gp.update(x.T, y, np.float32(1e-6))
    qm = np.asarray(gp.state.qm, np.float64)
    cond = np.linalg.cond(qm)
    assert cond > 3e7, cond  # the regime is actually reached
    with caplog.at_level(logging.INFO, "erl_gaussian_process_tpu"):
        res = gp.test(rng.uniform(-1, 1, (16, 2)).astype(np.float32).T)
        mean = res.get_mean(0)
    assert np.isfinite(mean).all()
    warnings = [r for r in caplog.records if r.levelno >= logging.WARNING]
    assert not warnings, [r.getMessage() for r in warnings]


def test_amortized_inverse_variance_matches_trsm():
    """The f32 serving path whitens the Q_M variance term as a GEMM
    against the cached chol(Q_M)^{-1} (fitc_variance ``li_qm``); the
    exact-trsm path is the semantic reference. Measured motivation in
    fitc_variance's docstring (the per-call trsm held mean+var at 4.6x
    its HBM roofline on v5e)."""
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        _tri_inv,
        pad_pseudo_points,
        spgp_init,
        spgp_predict,
        spgp_prepare,
        spgp_update,
    )

    rng = np.random.default_rng(7)
    ps = pad_pseudo_points(rng.uniform(-1, 1, (100, 2)).astype(np.float32))
    st = spgp_init(jnp.asarray(ps), np.float32(0.4), kernel="matern32")
    st = spgp_update(
        st, jnp.asarray(rng.uniform(-1, 1, (300, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 1, (300, 1)).astype(np.float32)),
        jnp.full((300,), np.float32(1e-3)), jnp.ones((300,), bool),
        np.float32(0.4), kernel="matern32")
    L, a = spgp_prepare(st)
    xq = jnp.asarray(rng.uniform(-1, 1, (50, 2)).astype(np.float32))
    kw = dict(kernel="matern32", with_grad=True, with_var=True)
    m1, g1, v1 = spgp_predict(st, L, a, xq, np.float32(0.4), **kw)
    m2, g2, v2 = spgp_predict(st, L, a, xq, np.float32(0.4),
                              li_qm=_tri_inv(L), **kw)
    # mean/grad jaxprs are identical; tiny drift is XLA re-fusing the
    # larger program (f32 reduction order), not a semantic change
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=5e-5)


def test_prepared_inv_cache_invalidated_by_update():
    """_prepared_inv is keyed on the prepared factor's identity: an
    update must refresh it (a stale chol(Q_M)^{-1} would silently wrong
    every subsequent variance)."""
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpSetting,
    )

    rng = np.random.default_rng(8)
    pseudo = rng.uniform(-1, 1, (2, 60))
    gp = SparsePseudoInputGaussianProcess(
        SpGpSetting(kernel_type="matern32",
                    kernel=KernelSetting(x_dim=2, scale=0.5),
                    max_num_samples=64),
        pseudo, dtype=np.float32)
    x = rng.uniform(-1, 1, (40, 2)).astype(np.float32)
    y = rng.uniform(-1, 1, (40, 1)).astype(np.float32)
    gp.update(x.T, y, np.float32(1e-3))
    li1 = gp._prepared_inv()
    assert gp._prepared_inv() is li1  # cached while the map is unchanged
    gp.update(x.T, -y, np.float32(1e-3))
    li2 = gp._prepared_inv()
    assert li2 is not li1
    L2, _ = gp._prepared()
    np.testing.assert_allclose(
        np.asarray(li2) @ np.asarray(L2),
        np.eye(L2.shape[0], dtype=np.float32), atol=2e-4)
