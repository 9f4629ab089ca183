"""Scale-mixture kernels (erl_covariance ``Setting{scale, scale_mix,
weights}``; reference builds its kernel from the full setting,
src/vanilla_gp.cpp:820). erl_covariance's source is not vendored in the
snapshot, so the mixture contract is this rebuild's (docs/parity.md):
component i has scale ``scale * scale_mix**i``, weights normalized to sum 1
so k(x,x)=1 — the unit-variance invariant every variance formula relies on.
Validated against dense sum-of-component-grams computations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erl_gaussian_process_tpu.kernels import (
    KernelSetting,
    cross_gram,
    is_mixture_setting,
    kernel_fn,
    mixture_params,
    resolve_kernel_setting,
    train_gram,
)

FAMILIES = ["rbf", "ou", "matern32"]

from tests.conftest import interpret_test


def _dense_mixture(name, x1, x2, scale, scale_mix, weights):
    """Reference computation: explicit weighted sum of component grams."""
    w = np.asarray(weights, np.float64)
    w = w / w.sum()
    out = np.zeros((x1.shape[0], x2.shape[0]))
    for i, wi in enumerate(w):
        out += wi * np.asarray(
            kernel_fn(name)(jnp.asarray(x1), jnp.asarray(x2),
                            scale * scale_mix**i), np.float64)
    return out


@pytest.mark.parametrize("family", FAMILIES)
def test_mixture_gram_matches_dense_sum(family):
    rng = np.random.default_rng(0)
    x1 = rng.uniform(-1, 1, (40, 2))
    x2 = rng.uniform(-1, 1, (25, 2))
    ks = KernelSetting(x_dim=2, scale=0.4, scale_mix=0.5,
                       weights=[0.5, 0.3, 0.2])
    name = resolve_kernel_setting(family, ks, "test")
    assert mixture_params(name) is not None
    got = np.asarray(kernel_fn(name)(jnp.asarray(x1), jnp.asarray(x2), 0.4))
    ref = _dense_mixture(family, x1, x2, 0.4, 0.5, [0.5, 0.3, 0.2])
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-14)
    # unit-variance invariant: k(x, x) = 1 (weights normalized)
    diag = np.asarray(kernel_fn(name)(jnp.asarray(x1), jnp.asarray(x1), 0.4))
    np.testing.assert_allclose(np.diag(diag), 1.0, rtol=1e-12)


def test_mixture_threads_through_gram_builders():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (30, 2))
    var = np.full(30, 1e-3)
    mask = rng.random(30) < 0.85
    ks = KernelSetting(x_dim=2, scale=0.3, scale_mix=0.6, weights=[2.0, 1.0])
    name = resolve_kernel_setting("rbf", ks, "test")
    K = np.asarray(train_gram(name, jnp.asarray(x), jnp.asarray(var), 0.3,
                              mask=jnp.asarray(mask)))
    ref = _dense_mixture("rbf", x, x, 0.3, 0.6, [2.0, 1.0]) + np.diag(var)
    m2 = mask[:, None] & mask[None, :]
    ref = np.where(m2, ref, np.eye(30))
    np.testing.assert_allclose(K, ref, rtol=1e-12, atol=1e-14)
    Kt = np.asarray(cross_gram(name, jnp.asarray(x), jnp.asarray(x[:7]), 0.3,
                               mask1=jnp.asarray(mask)))
    reft = np.where(mask[:, None],
                    _dense_mixture("rbf", x, x[:7], 0.3, 0.6, [2.0, 1.0]), 0.0)
    np.testing.assert_allclose(Kt, reft, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("family", FAMILIES)
def test_vanilla_gp_trains_with_mixture(family):
    """Mixture posterior == a hand-built dense GP with the summed gram."""
    import scipy.linalg as sla

    from erl_gaussian_process_tpu.models import VanillaGaussianProcess
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting

    n = 80
    x = np.linspace(0, 2 * np.pi, n)
    y = np.sin(2 * x)
    wts = [0.7, 0.3]
    s = VanillaGPSetting(
        kernel_type=family,
        kernel=KernelSetting(x_dim=1, scale=0.5, scale_mix=0.4, weights=wts),
        max_num_samples=n)
    gp = VanillaGaussianProcess(s)
    assert gp.train(x[None], y, np.full(n, 1e-4))
    xt = np.linspace(0, 2 * np.pi, 150)
    res = gp.test(xt[None])
    mean = res.get_mean(0)
    var_pred = res.get_variance()

    K = _dense_mixture(family, x[:, None], x[:, None], 0.5, 0.4, wts) \
        + 1e-4 * np.eye(n)
    Kt = _dense_mixture(family, x[:, None], xt[:, None], 0.5, 0.4, wts)
    L = np.linalg.cholesky(K)
    alpha = sla.cho_solve((L, True), y)
    ref_mean = Kt.T @ alpha
    A = sla.solve_triangular(L, Kt, lower=True)
    ref_var = 1.0 - np.sum(A * A, axis=0)
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(var_pred, ref_var, rtol=1e-6, atol=1e-9)


def test_nigp_mixture_gradient_blocks_match_autodiff():
    """The mixture's joint value/gradient gram blocks must equal jacfwd of
    the mixture kernel function — differentiation is linear in components."""
    from erl_gaussian_process_tpu.kernels.gradient import _blocks

    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.uniform(-1, 1, (6, 2)))
    x2 = jnp.asarray(rng.uniform(-1, 1, (5, 2)))
    ks = KernelSetting(x_dim=2, scale=0.6, scale_mix=0.5,
                       weights=[0.6, 0.4])
    name = resolve_kernel_setting("matern32", ks, "test")
    k, dk, d2k = _blocks(name, x1, x2, 0.6)

    kf = kernel_fn(name)

    def k_pair(a, b):
        return kf(a[None, :], b[None, :], 0.6)[0, 0]

    # TPU's emulated f64 evaluates the two expression orders (analytic
    # blocks vs jacfwd chain) ~1e-8 apart (observed 2.2e-8 rel on v5e);
    # native f64 on CPU agrees to 1e-10
    on_cpu = jax.default_backend() == "cpu"
    r0, r1_, r2_ = (1e-10, 1e-8, 1e-7) if on_cpu else (1e-7, 1e-6, 1e-6)
    for i in range(3):
        for j in range(3):
            a, b = x1[i], x2[j]
            np.testing.assert_allclose(k[i, j], k_pair(a, b), rtol=r0)
            np.testing.assert_allclose(
                dk[i, j], jax.jacfwd(k_pair, argnums=1)(a, b), rtol=r1_)
            np.testing.assert_allclose(
                d2k[i, j],
                jax.jacfwd(jax.jacfwd(k_pair, argnums=1), argnums=0)(a, b),
                rtol=r2_, atol=1e-9)


def test_nigp_trains_with_mixture():
    from erl_gaussian_process_tpu.models import NoisyInputGaussianProcess

    n = 60
    x = np.linspace(0, 2 * np.pi, n)
    y = np.sin(2 * x)
    g = 2 * np.cos(2 * x)
    s = NoisyInputGaussianProcess.Setting(
        kernel_type="rbf",
        kernel=KernelSetting(x_dim=1, scale=0.3, scale_mix=0.7,
                             weights=[0.8, 0.2]),
        max_num_samples=n, no_gradient_observation=False)
    gp = NoisyInputGaussianProcess(s)
    assert gp.train(x[None], y, g[None], var_x=1e-4, var_y=1e-4,
                    var_grad=1e-4)
    xt = np.linspace(0, 2 * np.pi, 100)
    res = gp.test(xt[None], predict_gradient=True)
    mae = np.abs(res.get_mean(0) - np.sin(2 * xt)).mean()
    mae_g = np.abs(res.get_gradient(0)[0] - 2 * np.cos(2 * xt)).mean()
    assert mae < 1e-3, mae
    assert mae_g < 1e-2, mae_g
    assert np.all(res.get_mean_variance() > 0)


def test_spgp_trains_with_mixture():
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SparsePseudoInputGaussianProcess,
        SpGpSetting,
    )

    n, m = 400, 24
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 2 * np.pi, n))
    y = np.sin(2 * x)
    pseudo = np.linspace(0, 2 * np.pi, m)
    s = SpGpSetting(
        kernel_type="matern32",
        kernel=KernelSetting(x_dim=1, scale=0.8, scale_mix=0.5,
                             weights=[0.6, 0.4]),
        max_num_samples=n)
    gp = SparsePseudoInputGaussianProcess(s, pseudo[None, :])
    gp.update(x[None, :], y[:, None], np.full(n, 1e-3))
    res = gp.test(np.linspace(0.3, 2 * np.pi - 0.3, 64)[None, :])
    pred = res.get_mean(0)
    mae = np.abs(pred - np.sin(2 * np.linspace(0.3, 2 * np.pi - 0.3,
                                               64))).mean()
    assert mae < 0.05, mae


def test_mixture_yaml_round_trip(tmp_path):
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting
    from erl_gaussian_process_tpu.utils import as_yaml_file, from_yaml_file

    s = VanillaGPSetting(
        kernel_type="rbf",
        kernel=KernelSetting(x_dim=1, scale=0.5, scale_mix=0.4,
                             weights=[0.5, 0.5]),
        max_num_samples=32)
    p = str(tmp_path / "mix.yaml")
    as_yaml_file(s, p)
    s2 = from_yaml_file(VanillaGPSetting, p)
    assert s2.to_dict() == s.to_dict()
    assert is_mixture_setting(s2.kernel)
    # and the loaded config trains
    from erl_gaussian_process_tpu.models import VanillaGaussianProcess
    gp = VanillaGaussianProcess(s2)
    x = np.linspace(0, 1, 32)
    assert gp.train(x[None], np.sin(x), np.full(32, 1e-4))


def test_mixture_checkpoint_round_trip(tmp_path):
    from erl_gaussian_process_tpu.models import VanillaGaussianProcess
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting

    n = 40
    x = np.linspace(0, 1, n)
    s = VanillaGPSetting(
        kernel_type="ou",
        kernel=KernelSetting(x_dim=1, scale=0.3, scale_mix=0.5,
                             weights=[0.7, 0.3]),
        max_num_samples=n)
    gp = VanillaGaussianProcess(s)
    assert gp.train(x[None], np.sin(3 * x), np.full(n, 1e-4))
    p = str(tmp_path / "mix_gp.npz")
    gp.save(p)
    gp2 = VanillaGaussianProcess(VanillaGPSetting())
    gp2.load(p)
    assert gp == gp2
    xt = np.linspace(0, 1, 17)
    np.testing.assert_array_equal(gp.test(xt[None]).get_mean(0),
                                  gp2.test(xt[None]).get_mean(0))


def test_mixture_rejections():
    from erl_gaussian_process_tpu.models import VanillaGaussianProcess
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting

    # half-specified: scale_mix without weights names zero components
    with pytest.raises(ValueError, match="no mixture components"):
        resolve_kernel_setting(
            "rbf", KernelSetting(x_dim=1, scale_mix=0.5), "test")
    with pytest.raises(ValueError, match="non-negative"):
        resolve_kernel_setting(
            "rbf", KernelSetting(x_dim=1, weights=[0.5, -0.5]), "test")
    with pytest.raises(ValueError, match="positive"):
        resolve_kernel_setting(
            "rbf", KernelSetting(x_dim=1, scale_mix=-1.0, weights=[1.0]),
            "test")
    # reduced-rank bases are single-scale: mixture + RR rejects loudly
    from erl_gaussian_process_tpu.kernels import ReducedRankSetting
    s = VanillaGPSetting(
        kernel_type="reduced_rank_rbf",
        kernel=ReducedRankSetting(x_dim=1, scale=0.3, num_basis=[32],
                                  weights=[0.5, 0.5]),
        max_num_samples=16)
    with pytest.raises(NotImplementedError, match="reduced-rank"):
        VanillaGaussianProcess(s)


@interpret_test
def test_pallas_gram_mixture_parity_interpret():
    """Mixture kernels stay on the fused Pallas gram path: _apply_family
    unrolls the static (ratios, weights) inside the kernel tile. Parity
    with the jnp mixture closure in interpret mode."""
    from jax.experimental import pallas as pl  # noqa: F401
    import jax.experimental.pallas.tpu as pltpu

    from erl_gaussian_process_tpu.ops.pallas_gram import pallas_cross_gram

    rng = np.random.default_rng(5)
    ks = KernelSetting(x_dim=2, scale=0.4, scale_mix=0.5,
                       weights=[0.5, 0.3, 0.2])
    name = resolve_kernel_setting("matern32", ks, "test")
    x1 = jnp.asarray(rng.uniform(-2, 2, (300, 2)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(-2, 2, (513, 2)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        kp = pallas_cross_gram(name, x1, x2, 0.4)
    kj = kernel_fn(name)(x1, x2, np.float32(0.4))
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kj),
                               rtol=1e-6, atol=1e-6)


@interpret_test
def test_pallas_fitc_mixture_parity_interpret():
    """The fused FITC update accepts mixture names (it applies the kernel
    via _apply_family on the in-register distance tile)."""
    import jax.experimental.pallas.tpu as pltpu

    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        spgp_init,
    )
    from erl_gaussian_process_tpu.ops.pallas_fitc import pallas_fitc_update

    rng = np.random.default_rng(6)
    ks = KernelSetting(x_dim=2, scale=0.5, scale_mix=0.6, weights=[0.7, 0.3])
    name = resolve_kernel_setting("rbf", ks, "test")
    m, n, d = 128, 200, 2
    pseudo = jnp.asarray(rng.uniform(-2, 2, (m, d)).astype(np.float32))
    st = spgp_init(pseudo, np.float32(0.5), kernel=name)
    x = jnp.asarray(rng.uniform(-2, 2, (n, d)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(np.float32))
    var = jnp.full((n,), 1e-1, jnp.float32)
    mask = jnp.asarray(rng.uniform(size=n) < 0.8)
    with pltpu.force_tpu_interpret_mode():
        dq, da = pallas_fitc_update(name, st.pseudo, st.L_inv, x, y,
                                    var, mask, np.float32(0.5))
    kmn = cross_gram(name, st.pseudo, x, np.float32(0.5))
    beta = st.L_inv @ kmn
    lam = jnp.maximum(1.0 - jnp.sum(beta * beta, axis=0), 0.0)
    inv = jnp.where(mask, 1.0 / (lam + var), 0.0)
    ksc = kmn * inv[None, :]
    # tolerance: the mixture K_M is more ill-conditioned than a single
    # kernel (the short-scale component adds near-duplicate columns), so
    # ||L_inv|| is larger and the kernel's bf16x3 beta errors amplify to
    # ~4e-3 through 1/(lam+var) — this test pins MECHANICS; production
    # accuracy is the map-level f32-vs-f64 gate
    # magnitude-relative bounds (individual entries cancel to near zero):
    # measured error class is ~0.5% — bf16x3 beta errors through the
    # 1/(lam+var) amplification on a mixture K_M that is more
    # ill-conditioned than any single kernel's
    dq_ref = np.asarray(ksc @ kmn.T)
    assert np.abs(np.asarray(dq) - dq_ref).max() < 1e-2 * np.abs(
        dq_ref).max()
    da_ref = np.asarray(ksc @ jnp.where(mask[:, None], y, 0.0))
    assert np.abs(np.asarray(da) - da_ref).max() < 1e-2 * np.abs(
        da_ref).max()
