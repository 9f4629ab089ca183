"""Mapping transforms (reference: src/mapping.cpp:114-163) and the batched
GP bank (replacement for BatchGaussianProcessUpdateTorch +
the OpenMP partition loops; reference: src/batch_gp_update_torch.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.models import (
    BatchGPBank,
    Mapping,
    MappingType,
    VanillaGaussianProcess,
)
from erl_gaussian_process_tpu.models.batch_gp import (
    bank_fit,
    bank_predict,
    bank_predict_assigned,
)
from erl_gaussian_process_tpu.models.mapping import MappingSetting


@pytest.mark.parametrize("mtype,scale,domain", [
    (MappingType.IDENTITY, 1.0, (0.1, 10.0)),
    (MappingType.INVERSE, 1.0, (0.1, 10.0)),
    (MappingType.INVERSE_SQRT, 1.0, (0.1, 10.0)),
    (MappingType.EXP, 0.7, (0.1, 10.0)),
    (MappingType.LOG, 0.7, (0.1, 10.0)),
    (MappingType.TANH, 0.3, (0.1, 3.0)),
    (MappingType.SIGMOID, 0.5, (0.1, 10.0)),
])
def test_mapping_roundtrip(mtype, scale, domain):
    m = Mapping(MappingSetting(type=mtype, scale=scale))
    x = np.linspace(*domain, 50)
    np.testing.assert_allclose(np.asarray(m.inv(m.map(x))), x, rtol=1e-9)


def test_mapping_yaml_names():
    assert MappingType.parse("kInverseSqrt") == MappingType.INVERSE_SQRT
    assert MappingType.parse("kIdentity") == MappingType.IDENTITY
    s = MappingSetting.from_dict({"type": "kExp", "scale": 2.0})
    assert s.type == MappingType.EXP and s.scale == 2.0


def test_bank_fit_matches_individual_gps():
    """One vmapped batched fit == per-GP fits (the C9 equivalence check,
    reference test_batch_gp_update_torch.cpp:42-66 compares CPU vs GPU
    batched solve)."""
    rng = np.random.default_rng(0)
    B, nmax = 5, 32
    xs = np.zeros((B, nmax, 1))
    ys = np.zeros((B, nmax, 1))
    vs = np.zeros((B, nmax))
    ms = np.zeros((B, nmax), bool)
    counts = [32, 7, 20, 1, 15]
    for b, n in enumerate(counts):
        xs[b, :n, 0] = np.sort(rng.uniform(0, 2 * np.pi, n))
        ys[b, :n, 0] = np.sin(xs[b, :n, 0]) * (b + 1)
        vs[b, :n] = 1e-3
        ms[b, :n] = True

    bank = bank_fit(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                    jnp.asarray(ms), 0.5, kernel="rbf")
    xq = np.linspace(0, 2 * np.pi, 17)

    for b, n in enumerate(counts):
        gp = VanillaGaussianProcess(VanillaGaussianProcess.Setting(
            kernel_type="rbf", kernel=KernelSetting(scale=0.5),
            max_num_samples=n))
        gp.train(xs[b, :n, 0][None], ys[b, :n, 0], 1e-3)
        res = gp.test(xq[None])
        mean_b, var_b = bank_predict(
            bank, jnp.asarray(np.tile(xq[None, :, None], (B, 1, 1))), 0.5,
            kernel="rbf")
        np.testing.assert_allclose(np.asarray(mean_b[b][:, 0]),
                                   res.get_mean(0), atol=1e-11)
        np.testing.assert_allclose(np.asarray(var_b[b]),
                                   res.get_variance(), atol=1e-11)


def test_bank_predict_assigned_routing():
    rng = np.random.default_rng(1)
    B, nmax = 4, 16
    xs = rng.uniform(0, 1, (B, nmax, 1)) + np.arange(B)[:, None, None]
    ys = np.full((B, nmax, 1), 0.0) + np.arange(B)[:, None, None]
    vs = np.full((B, nmax), 1e-4)
    ms = np.ones((B, nmax), bool)
    ms[2] = False  # untrained member
    bank = bank_fit(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                    jnp.asarray(ms), 0.3, kernel="rbf")
    q = np.array([[0.5], [1.5], [2.5], [3.5], [0.7]])
    idx = np.array([0, 1, 2, 3, -1], np.int32)
    mean, var, valid = bank_predict_assigned(
        bank, jnp.asarray(q), jnp.asarray(idx), 0.3, kernel="rbf")
    valid = np.asarray(valid)
    assert list(valid) == [True, True, False, True, False]
    # each member predicts its own constant (up to zero-mean GP shrinkage)
    np.testing.assert_allclose(np.asarray(mean)[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mean)[1, 0], 1.0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(mean)[3, 0], 3.0, atol=5e-3)


def test_bank_predict_assigned_matches_per_member_oracle():
    """The segmented routed predict (queries grouped by partition, one
    whitening GEMM per member) must equal the brute-force oracle of every
    member answering every query (bank_predict) — the restructure that
    removed the O(m·n²) per-query factor gather must not change values."""
    rng = np.random.default_rng(7)
    B, nmax, m = 6, 24, 237
    xs = rng.uniform(-1, 1, (B, nmax, 2))
    ys = np.sin(xs[:, :, :1] * 3) + np.arange(B)[:, None, None]
    vs = np.full((B, nmax), 1e-3)
    ms = np.ones((B, nmax), bool)
    ms[4, 11:] = False
    bank = bank_fit(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                    jnp.asarray(ms), 0.4, kernel="matern32")
    q = rng.uniform(-1, 1, (m, 2))
    idx = rng.integers(-1, B, m).astype(np.int32)   # incl. unresolved -1
    mean, var, valid = bank_predict_assigned(
        bank, q, idx, 0.4, kernel="matern32")
    # oracle: every member answers every query; select the routed one
    om, ov = bank_predict(
        bank, jnp.asarray(np.tile(q[None], (B, 1, 1))), 0.4,
        kernel="matern32")
    om, ov = np.asarray(om), np.asarray(ov)
    assert list(np.asarray(valid)) == list(idx >= 0)
    sel = idx >= 0
    np.testing.assert_allclose(mean[sel], om[idx[sel], np.arange(m)[sel]],
                               atol=1e-11)
    np.testing.assert_allclose(var[sel], ov[idx[sel], np.arange(m)[sel]],
                               atol=1e-11)


def test_bank_predict_assigned_profile_dict():
    """The optional profile dict records every phase and does not change
    the results (the serving-path phase decomposition, VERDICT r3 #5)."""
    rng = np.random.default_rng(3)
    B, nmax, m = 4, 16, 57
    xs = rng.uniform(-1, 1, (B, nmax, 2))
    ys = rng.uniform(-1, 1, (B, nmax, 1))
    vs = np.full((B, nmax), 1e-3)
    ms = np.ones((B, nmax), bool)
    bank = bank_fit(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                    jnp.asarray(ms), 0.4, kernel="matern32")
    q = rng.uniform(-1, 1, (m, 2))
    idx = rng.integers(-1, B, m).astype(np.int32)
    mean0, var0, valid0 = bank_predict_assigned(
        bank, q, idx, 0.4, kernel="matern32")
    prof = {}
    mean1, var1, valid1 = bank_predict_assigned(
        bank, q, idx, 0.4, kernel="matern32", profile=prof)
    np.testing.assert_array_equal(mean0, mean1)
    np.testing.assert_array_equal(var0, var1)
    np.testing.assert_array_equal(valid0, valid1)
    for k in ("host_group", "h2d", "device", "d2h_scatter"):
        assert k in prof and prof[k] >= 0.0
    assert prof["bucket"][0] % 8 == 0 and prof["bucket"][1] >= 1


def test_bank_fit_rr_matches_single_rr_gp():
    """Reduced-rank bank: each member's basis information system must match
    a standalone reduced-rank VanillaGP on the same data (the RR-threading
    contract for the partition classes, lidar_gp_2d.cpp:148-151)."""
    from erl_gaussian_process_tpu.kernels import ReducedRankSetting
    from erl_gaussian_process_tpu.kernels.reduced_rank import ReducedRankBasis
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit_rr
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting

    rng = np.random.default_rng(11)
    B, nmax = 3, 40
    xs = np.zeros((B, nmax, 1))
    ys = np.zeros((B, nmax, 1))
    vs = np.zeros((B, nmax))
    ms = np.zeros((B, nmax), bool)
    counts = [40, 18, 29]
    for b, n in enumerate(counts):
        xs[b, :n, 0] = np.sort(rng.uniform(-0.8, 0.8, n))
        ys[b, :n, 0] = np.sin(3 * xs[b, :n, 0]) * (b + 1)
        vs[b, :n] = 1e-3
        ms[b, :n] = True
    rset = ReducedRankSetting(x_dim=1, scale=0.3, num_basis=[48],
                              boundary=[1.5], coord_origin=[0.0])
    basis = ReducedRankBasis(rset, dtype=np.float64)
    bank = bank_fit_rr(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                       jnp.asarray(ms), basis)
    assert bank.L.shape == (B, 48, 48)  # rows = #basis, not n

    q = np.linspace(-0.7, 0.7, 33)
    idx = np.tile(np.arange(B), 11)
    mean, var, valid = bank_predict_assigned(
        bank, np.tile(q[:, None], (1, 1)), idx.astype(np.int32), 0.3,
        kernel="rbf", reduced_rank=True, basis=basis)
    assert np.asarray(valid).all()
    assert (var > 0).all()  # +||.||^2 sign contract
    for b in range(B):
        gp = VanillaGaussianProcess(VanillaGPSetting(
            kernel_type="rr_rbf", kernel=rset))
        n = counts[b]
        gp.train(xs[b, :n, 0][None], ys[b, :n, 0], 1e-3)
        res = gp.test(q[None, :])
        sel = np.flatnonzero(idx == b)
        np.testing.assert_allclose(mean[sel, 0], res.get_mean()[sel],
                                   atol=1e-10)
        np.testing.assert_allclose(var[sel], res.get_variance()[sel],
                                   atol=1e-10)


def test_batch_gp_bank_c9_api():
    """The BatchGaussianProcessUpdateTorch-style staging API: load padded
    (K, alpha) problems, one batched solve, read back L/alpha."""
    rng = np.random.default_rng(2)
    bank = BatchGPBank(batch_size=3, max_num_samples=24, y_dim=1,
                       dtype=np.float64)
    problems = []
    for i, n in enumerate([24, 10, 17]):
        x = np.sort(rng.uniform(0, 1, n))
        K = np.exp(-(x[:, None] - x[None, :]) ** 2 / (2 * 0.2 ** 2))
        K += np.diag(np.full(n, 1e-3))
        y = np.sin(5 * x)[:, None]
        bank.load_gp_data(i, n, K, y)
        problems.append((K, y, n))
    bank.solve()
    for i, (K, y, n) in enumerate(problems):
        L_np = np.linalg.cholesky(K)
        a_np = np.linalg.solve(K, y)
        L, a = bank.get_gp_result(i)
        np.testing.assert_allclose(L[:n, :n], L_np, atol=1e-10)
        np.testing.assert_allclose(a[:n], a_np, atol=1e-9)
        # padding: identity L, zero alpha
        np.testing.assert_allclose(L[n:, n:], np.eye(24 - n), atol=0)
        np.testing.assert_allclose(a[n:], 0.0, atol=0)
