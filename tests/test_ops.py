"""Pallas ops + numerical-robustness tests.

The Pallas kernels only compile on TPU; on the CPU test backend we run them
in interpreter mode (small shapes) to pin parity with the jnp reference
implementations. TPU-only compiled-path parity is covered by the same
functions executing inside bench.py's quality gate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from erl_gaussian_process_tpu.kernels import cross_gram, kernel_fn
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
    pad_pseudo_points,
    spgp_init,
    spgp_prepare,
    spgp_predict,
    spgp_update,
)

# Interpret-mode tests exist to pin kernel parity on CPU-only checkouts.
from tests.conftest import interpret_test


@pytest.mark.parametrize("fam", ["rbf", "ou", "matern32"])
@interpret_test
def test_pallas_gram_parity_interpret(fam):
    from erl_gaussian_process_tpu.ops.pallas_gram import pallas_cross_gram

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(-2, 2, (300, 2)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(-2, 2, (513, 2)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        kp = pallas_cross_gram(fam, x1, x2, 0.3)
    kj = kernel_fn(fam)(x1, x2, np.float32(0.3))
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kj),
                               rtol=1e-6, atol=1e-6)
    assert kp.shape == (300, 513)


@interpret_test
@pytest.mark.parametrize("m", [128, 384])
def test_pallas_fitc_parity_interpret(m):
    """m=128 picks nb=1 (full-GEMM dq); m=384 picks nb=3 (symmetric
    lower-triangular block dq + mirror) — see pallas_fitc._pick_nb."""
    from erl_gaussian_process_tpu.ops.pallas_fitc import (
        _pick_nb,
        pallas_fitc_update,
    )

    assert _pick_nb(m) == {128: 1, 384: 3}[m]
    rng = np.random.default_rng(1)
    n, d = 200, 2
    # box side scales with sqrt(m) so pseudo-point spacing (hence K_M
    # conditioning and the 1/(lam+var) amplification of the bf16x3 dot
    # noise) stays comparable across the two cases
    half = 2.0 * np.sqrt(m / 128.0)
    pseudo = jnp.asarray(rng.uniform(-half, half, (m, d)).astype(np.float32))
    st = spgp_init(pseudo, np.float32(0.5), kernel="matern32")
    x = jnp.asarray(rng.uniform(-2, 2, (n, d)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(np.float32))
    # moderate noise floor: the kernel's bf16x3 dots are accurate to ~5e-6,
    # but w = 1/(lam+var) amplifies that near lam -> 0; at var = 0.1 the
    # amplification is <= 10 and the comparison tests MECHANICS. The
    # production-regime (var=1e-4) accuracy is pinned end-to-end by
    # test_spgp_occupancy_map.py::test_float32_matches_float64_posterior
    # and the bench quality gate.
    var = jnp.full((n,), 1e-1, jnp.float32)
    mask = jnp.asarray(rng.uniform(size=n) < 0.8)
    with pltpu.force_tpu_interpret_mode():
        dq, da = pallas_fitc_update("matern32", st.pseudo, st.L_inv, x, y,
                                    var, mask, np.float32(0.5))
    # jnp reference (same beta-via-L_inv formulation)
    kmn = cross_gram("matern32", st.pseudo, x, np.float32(0.5))
    beta = st.L_inv @ kmn
    lam = jnp.maximum(1.0 - jnp.sum(beta * beta, axis=0), 0.0)
    inv = jnp.where(mask, 1.0 / (lam + var), 0.0)
    ksc = kmn * inv[None, :]
    np.testing.assert_allclose(np.asarray(dq), np.asarray(ksc @ kmn.T),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(da),
        np.asarray(ksc @ jnp.where(mask[:, None], y, 0.0)),
        rtol=2e-3, atol=2e-3)


def test_pallas_fitc_vmem_budget_eligibility(monkeypatch):
    """The VMEM-budget gate (pallas_fitc.pallas_fitc_enabled): M=1152 (the
    hotel-0 3D shape, ~14.2 MB resident) is eligible; M=1280 (~17 MB)
    exceeds the 16 MB scoped-VMEM class and must fall back to the XLA
    chain. Alignment/dtype/dim gates checked alongside."""
    from erl_gaussian_process_tpu.ops import pallas_fitc

    monkeypatch.delenv("ERL_GP_NO_PALLAS_FITC", raising=False)
    monkeypatch.delenv("ERL_GP_NO_PALLAS", raising=False)
    monkeypatch.setattr(pallas_fitc.jax, "default_backend", lambda: "tpu")
    enabled = pallas_fitc.pallas_fitc_enabled
    assert enabled(np.float32, 1024, 2)
    assert enabled(np.float32, 1152, 3)      # hotel-0 shape: in budget
    assert not enabled(np.float32, 1280, 3)  # next 128-step: over budget
    assert not enabled(np.float32, 1000, 2)  # not 128-aligned
    assert not enabled(np.float64, 1024, 2)  # f64 path stays on XLA
    assert not enabled(np.float32, 1024, 4)  # d > _MAX_D
    monkeypatch.setenv("ERL_GP_NO_PALLAS_FITC", "1")
    assert not enabled(np.float32, 1024, 2)


def test_far_point_padding_is_exact():
    """Padded SPGP must give bit-for-bit the same posterior as unpadded:
    far-point rows produce exactly-zero kernel values and identity L rows."""
    rng = np.random.default_rng(2)
    m, n, d = 60, 100, 2
    P = rng.uniform(-1, 1, (m, d))
    Pp = pad_pseudo_points(P.copy(), multiple=64)   # (64+ rows)
    assert Pp.shape[0] == 64 and np.array_equal(Pp[:m], P)

    def posterior(pp):
        st = spgp_init(jnp.asarray(pp), 0.4, kernel="matern32")
        x = jnp.asarray(rng2.uniform(-1, 1, (n, d)))
        y = jnp.asarray(rng2.uniform(-1, 1, (n, 1)))
        st = spgp_update(st, x, y, jnp.full((n,), 1e-3), jnp.ones(n, bool),
                         0.4, kernel="matern32")
        L_qm, a = spgp_prepare(st)
        xq = jnp.asarray(np.linspace(-0.9, 0.9, 25)[:, None].repeat(d, 1))
        mean, _, var = spgp_predict(st, L_qm, a, xq, 0.4, kernel="matern32")
        return np.asarray(mean), np.asarray(var), st

    rng2 = np.random.default_rng(3)
    m1, v1, st1 = posterior(P)
    rng2 = np.random.default_rng(3)
    m2, v2, st2 = posterior(Pp)
    # padded rows add exact zeros to every contraction; the only deviation
    # is f64 reassociation in longer GEMM reductions
    np.testing.assert_allclose(m1, m2, rtol=0, atol=1e-9)
    np.testing.assert_allclose(v1, v2, rtol=0, atol=1e-9)
    # padded kernel rows are exactly zero / identity-blocked
    assert np.all(np.asarray(st2.qm)[m:, :m] == 0)
    assert np.allclose(np.asarray(st2.qm)[m:, m:], np.eye(64 - m))
    assert np.all(np.asarray(st2.alpha)[m:] == 0)


def test_lambda_clamp_no_nan_when_sample_hits_pseudo_point():
    """A training sample exactly on a pseudo point drives ||beta||^2 -> 1;
    roundoff past 1 must not produce inf/NaN state (lambda clamp)."""
    P = np.stack(np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8),
                             indexing="ij"), -1).reshape(-1, 2)
    st = spgp_init(jnp.asarray(P, jnp.float32), np.float32(0.3),
                   kernel="matern32")
    x = jnp.asarray(P[:32], jnp.float32)  # exactly on pseudo points
    y = jnp.ones((32, 1), jnp.float32)
    st = spgp_update(st, x, y, jnp.full((32,), 1e-6, jnp.float32),
                     jnp.ones(32, bool), np.float32(0.3), kernel="matern32")
    assert np.isfinite(np.asarray(st.qm)).all()
    assert np.isfinite(np.asarray(st.alpha)).all()


def test_f32_matmul_precision_context_applies():
    """The hot fns trace under a non-DEFAULT matmul precision (the
    TPU-default single-pass bf16 loses ~3 digits of posterior accuracy).
    On this CPU test backend the decorator resolves to "highest" (exact
    f32); on TPU it resolves to the configured X3 scheme. f64 arguments
    always get "highest" (an explicit BF16_* algorithm would downcast)."""
    from erl_gaussian_process_tpu.models.gp_core import f32_matmul

    seen = []

    @f32_matmul
    def probe(x):
        seen.append(jax.config.jax_default_matmul_precision)
        return x

    probe(jnp.ones((2,), jnp.float32))
    probe(jnp.ones((2,), jnp.float64))
    assert seen[0] in ("highest", "BF16_BF16_F32_X3")
    assert seen[1] == "highest"
    # and the models actually use the decorator
    import erl_gaussian_process_tpu.models.vanilla_gp as vg
    import erl_gaussian_process_tpu.models.sparse_pseudo_input_gp as sp
    import inspect
    assert "@f32_matmul" in inspect.getsource(vg)
    assert "@f32_matmul" in inspect.getsource(sp)


@pytest.mark.skipif(jax.default_backend() == "tpu",
                    reason="asserts the OFF-TPU fallback behavior")
def test_bank_fit_falls_back_off_tpu():
    """On the CPU test backend the fused bank kernel must be disabled and
    bank_fit must return a plain (no L_inv) state via the jnp path."""
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit
    from erl_gaussian_process_tpu.ops.pallas_bank import pallas_bank_enabled

    assert not pallas_bank_enabled(jnp.float32, 128, 2)
    rng = np.random.default_rng(0)
    B, n = 3, 96
    x = jnp.asarray(rng.normal(size=(B, n, 2)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, n, 1)).astype(np.float32))
    var = jnp.full((B, n), 0.01, jnp.float32)
    mask = jnp.asarray(rng.random((B, n)) < 0.9)
    st = bank_fit(x, y, var, mask, np.float32(0.5), kernel="rbf")
    assert st.L_inv is None
    assert np.isfinite(np.asarray(st.alpha)).all()


def test_bank_pick_g_matches_measured_winners():
    """The VMEM-budget G picker must reproduce every on-chip A/B winner
    (v5e, 2026-08-19) and stay under every measured Mosaic OOM boundary
    (fit: G48*R104*n128 and G16*R256*n256 both OOM'd at compile; the
    picker's choices all compiled and were the fastest compilable G)."""
    from erl_gaussian_process_tpu.ops.pallas_bank import (
        _VMEM_ELEMS_FIT,
        _VMEM_ELEMS_GRAM_IN,
        _pick_g,
    )

    fit = [  # (R, n, d, B) -> measured-best G
        (104, 128, 1, 1000, 32),   # reference torch-sweep shape
        (128, 128, 1, 1024, 32),
        (144, 256, 2, 408, 16),    # 3D sensor bank (271x91 scan)
        (256, 256, 2, 256, 8),
        (384, 384, 2, 64, 4),
        (512, 512, 2, 32, 2),
    ]
    for R, n, d, B, exp in fit:
        assert _pick_g(R, 2 * n + 128 * d, _VMEM_ELEMS_FIT, B) == exp, (R, n)
    gram_in = [(128, 128, 512, 32), (256, 256, 256, 8)]
    for R, n, B, exp in gram_in:
        assert _pick_g(R, 3 * n, _VMEM_ELEMS_GRAM_IN, B) == exp, (R, n)
    # OOM boundaries stay excluded
    assert _pick_g(104, 2 * 128 + 128, _VMEM_ELEMS_FIT, 10_000) < 48
    assert _pick_g(256, 2 * 256 + 256, _VMEM_ELEMS_FIT, 10_000) < 16
    # tiny banks don't pad B several-fold
    assert _pick_g(104, 384, _VMEM_ELEMS_FIT, 4) == 4


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas bank kernel compiles only on TPU "
                           "(interpret mode is impractically slow for its "
                           "n-step elimination loop)")
@pytest.mark.parametrize("fam", ["rbf", "ou", "matern32"])
def test_pallas_bank_fit_parity_tpu(fam):
    """Fused bank fit (gram + batched Cholesky + L^{-1}) vs the vmapped jnp
    path, including masking, n- and B-padding, and multi-output alpha."""
    from erl_gaussian_process_tpu.models.batch_gp import _bank_fit_xla
    from erl_gaussian_process_tpu.ops.pallas_bank import bank_fit_fused

    rng = np.random.default_rng(0)
    B, n, d, q = 37, 100, 2, 2   # deliberately off the 128/G grid
    x = jnp.asarray(rng.normal(size=(B, n, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, n, q)).astype(np.float32))
    var = jnp.asarray((0.01 + 0.1 * rng.random((B, n))).astype(np.float32))
    mask = jnp.asarray(rng.random((B, n)) < 0.9)
    L, L_inv, alpha = bank_fit_fused(fam, x, y, var, mask, np.float32(0.7))
    st = _bank_fit_xla(x, y, var, mask, np.float32(0.7), kernel=fam)
    tri = np.tril(np.ones((n, n), bool))
    assert np.abs(np.where(tri, np.asarray(L) - np.asarray(st.L),
                           0)).max() < 1e-4
    a_ref = np.asarray(st.alpha)
    assert (np.abs(np.asarray(alpha) - a_ref).max()
            / max(np.abs(a_ref).max(), 1e-12)) < 1e-4
    # L_inv really is the inverse of L (identity on masked rows)
    eye_err = np.abs(np.asarray(L_inv) @ np.asarray(st.L)
                     - np.eye(n)[None]).max()
    assert eye_err < 1e-4


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas bank kernel compiles only on TPU")
def test_pallas_bank_cholesky_solve_parity_tpu():
    from erl_gaussian_process_tpu.models.batch_gp import (
        _batched_cholesky_solve,
    )
    from erl_gaussian_process_tpu.ops.pallas_bank import (
        bank_cholesky_solve_fused,
    )

    rng = np.random.default_rng(1)
    B, n, q = 21, 100, 1
    X = rng.normal(size=(B, n, 8)).astype(np.float32)
    K = jnp.asarray(np.einsum("bnd,bmd->bnm", X, X) / 8
                    + 2 * np.eye(n, dtype=np.float32))
    y = jnp.asarray(rng.normal(size=(B, n, q)).astype(np.float32))
    L, _, alpha = bank_cholesky_solve_fused(K, y)
    L_ref, a_ref = _batched_cholesky_solve(K, y)
    tri = np.tril(np.ones((n, n), bool))
    assert np.abs(np.where(tri, np.asarray(L) - np.asarray(L_ref),
                           0)).max() < 1e-4
    assert (np.abs(np.asarray(alpha) - np.asarray(a_ref)).max()
            / np.abs(np.asarray(a_ref)).max()) < 1e-3


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas trsv compiles only on TPU (interpret "
                           "mode is impractically slow for its loops)")
def test_pallas_trsv_parity_tpu():
    from erl_gaussian_process_tpu.ops.pallas_trsv import (
        cho_solve_vec,
        solve_lower,
        solve_lower_t,
    )
    import scipy.linalg as sla

    rng = np.random.default_rng(0)
    n = 512
    X = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    A = X @ X.T + np.eye(n, dtype=np.float32)
    L = np.linalg.cholesky(A).astype(np.float32)
    b = rng.standard_normal((n, 2)).astype(np.float32)
    x = np.asarray(solve_lower(jnp.asarray(L), jnp.asarray(b)))
    xt = np.asarray(solve_lower_t(jnp.asarray(L), jnp.asarray(b)))
    cs = np.asarray(cho_solve_vec(jnp.asarray(L), jnp.asarray(b)))
    x_ref = sla.solve_triangular(L.astype(np.float64), b, lower=True)
    xt_ref = sla.solve_triangular(L.T.astype(np.float64), b, lower=False)
    cs_ref = sla.cho_solve((L.astype(np.float64), True), b)
    # bf16x3 in-kernel dots: X3-class accuracy (was 1e-5 with the
    # 2x-slower 6-pass dots)
    for got, ref in [(x, x_ref), (xt, xt_ref), (cs, cs_ref)]:
        assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-5

    # chol_dinv fast path: the streaming chol's free diagonal-block
    # inverses (one 512-block here, identity-padded) must give the same
    # solve as the batched-trsm prep
    Lp = np.eye(512, dtype=np.float32)
    Lp[:n, :n] = L
    dinv = sla.solve_triangular(Lp, np.eye(512, dtype=np.float32),
                                lower=True).astype(np.float32)
    cs2 = np.asarray(cho_solve_vec(jnp.asarray(L), jnp.asarray(b),
                                   chol_dinv=jnp.asarray(dinv)))
    assert np.abs(cs2 - cs_ref).max() / np.abs(cs_ref).max() < 5e-5


def test_inverses_from_chol_dinv_matches_block_inverses():
    """The pure-slicing derivation of the substitution-block inverses
    from the streaming Cholesky's (n_pad, 512) diagonal-block-inverse
    output must equal the batched-trsm path — including a final
    partially-padded 512-block (identity beyond the caller's n), the
    layout every ``return_dinv=True`` consumer sees. CPU-runnable: the
    math is pure jnp."""
    import scipy.linalg as sla

    from erl_gaussian_process_tpu.ops.pallas_trsv import (
        _diag_block_inverses,
        inverses_from_chol_dinv,
    )

    rng = np.random.default_rng(7)
    n, npad = 640, 1024          # 5 valid 128-blocks in 2 padded 512-blocks
    X = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    A = X @ X.T + np.eye(n, dtype=np.float32)
    L = np.linalg.cholesky(A).astype(np.float32)
    Lp = np.eye(npad, dtype=np.float32)
    Lp[:n, :n] = L
    # what the kernel emits: block row j = inv(Lp[jT:(j+1)T, jT:(j+1)T])
    dinv = np.concatenate([
        sla.solve_triangular(Lp[j * 512:(j + 1) * 512,
                                j * 512:(j + 1) * 512],
                             np.eye(512, dtype=np.float32), lower=True)
        for j in range(npad // 512)]).astype(np.float32)
    got = np.asarray(inverses_from_chol_dinv(jnp.asarray(dinv), n))
    ref = np.asarray(_diag_block_inverses(jnp.asarray(L)))
    assert got.shape == ref.shape == (n, 128)
    assert np.abs(got - ref).max() < 1e-5


def test_pallas_kernels_trace_i64_free_under_x64():
    """Under jax_enable_x64 (on in this suite), every Pallas kernel's traced
    jaxpr must be free of i64 values: Mosaic's convert-element-type lowering
    recurses infinitely on 64-bit conversions (observed on-device:
    RecursionError from fori_loop's hidden i64 scan counter; a Mosaic
    func.return legalization failure from bare-int index-map literals).
    CPU-traceable guard for a TPU-only compile failure."""
    import jax.experimental.pallas as pl
    from erl_gaussian_process_tpu.ops.pallas_bank import _elim
    from erl_gaussian_process_tpu.ops import pallas_trsv

    assert jax.config.jax_enable_x64

    G, n = 2, 128
    def bank_kernel(in_ref, m_ref):
        m_ref[:] = in_ref[:]
        _elim(m_ref, n)

    f = pl.pallas_call(
        bank_kernel,
        out_shape=jax.ShapeDtypeStruct((G, n, 2 * n), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec((G, n, 2 * n), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((G, n, 2 * n), lambda i: (0, 0, 0)))
    x = jnp.zeros((G, n, 2 * n), jnp.float32)
    s = str(jax.make_jaxpr(f)(x))
    assert "i64" not in s and "int64" not in s

    L = jnp.eye(256, dtype=jnp.float32)
    b = jnp.ones((256, 2), jnp.float32)
    inv = pallas_trsv._diag_block_inverses(L)
    bp, _ = pallas_trsv._pad_rhs(b)
    for solver in (pallas_trsv._solve_lower, pallas_trsv._solve_lower_t):
        s = str(jax.make_jaxpr(lambda L, i, b: solver(L, i, b))(L, inv, bp))
        assert "i64" not in s and "int64" not in s

    # the streaming blocked Cholesky (slot/semaphore indices must be i32:
    # tpu.memref_slice rejects i64 operands, observed on-device)
    from erl_gaussian_process_tpu.ops import pallas_chol
    # nb >= 5 is the kernel's structural minimum (the (T, 4T) slab DMAs
    # and the bj panel's 4-tile chunk slices are static shapes)
    A = jnp.eye(2560, dtype=jnp.float32)
    ti, tj = pallas_chol._tile_tables(5)
    s = str(jax.make_jaxpr(
        lambda A, ti, tj: pallas_chol._chol_padded(A, ti, tj, tile=512))(
            A, jnp.asarray(ti), jnp.asarray(tj)))
    assert "i64" not in s and "int64" not in s


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas chol compiles only on TPU")
def test_pallas_chol_parity_tpu():
    """Streaming blocked Cholesky vs XLA's factorization, including the
    pad-to-512 path (n=2600) and posterior-grade accuracy vs float64.
    n >= 2560 (nb >= 5): chol_blocked's padded-size assert keeps the
    structural minimum (enable gates keep real traffic at n >= 6000)."""
    from erl_gaussian_process_tpu.ops.pallas_chol import chol_blocked

    rng = np.random.default_rng(3)
    for n in (2560, 2600):
        X = rng.standard_normal((n, n + 8)).astype(np.float32)
        A = (X @ X.T / n + 2 * np.eye(n, dtype=np.float32))
        L = np.asarray(chol_blocked(jnp.asarray(A)))
        Lr = np.linalg.cholesky(A.astype(np.float64))
        rel = np.abs(L - Lr).max() / np.abs(Lr).max()
        assert rel < 5e-5, (n, rel)
        assert np.abs(np.triu(L, 1)).max() == 0.0


def test_blocked_solve_matches_trsm():
    """The GEMM-only block forward substitution (wide-RHS whitening path)
    must match scipy's triangular solve. On CPU the GEMMs run at exact f32
    ('highest'), so the bound checks the ALGORITHM at 1e-5. On TPU
    (`ERL_GP_TEST_TPU=1`) the f32_matmul dispatch uses the 3-pass bf16
    algorithm: each product drops the lo*lo term (~eps_bf16^2 ~ 6e-5
    relative), which accumulates over the dot length and amplifies
    through the substitution chain — measured max rel error 4.1e-3 at
    n=256 (v5e). The on-chip bound pins that accuracy CLASS with ~5x
    headroom; posterior-grade acceptance of the X3 tradeoff is pinned
    end-to-end by the f32-vs-f64 posterior regression test instead."""
    import scipy.linalg as sla
    from erl_gaussian_process_tpu.ops.blocked_solve import (
        blocked_solve_lower,
    )

    tol = 1e-5 if jax.default_backend() != "tpu" else 2e-2
    rng = np.random.default_rng(7)
    for n in (256, 640):   # exercises block picks 256 and 128
        X = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
        A = X @ X.T + np.eye(n, dtype=np.float32)
        L = np.linalg.cholesky(A).astype(np.float32)
        B = rng.standard_normal((n, 700)).astype(np.float32)
        got = np.asarray(blocked_solve_lower(jnp.asarray(L),
                                             jnp.asarray(B)))
        ref = sla.solve_triangular(L.astype(np.float64), B, lower=True)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < tol, rel


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas chol compiles only on TPU")
def test_pallas_chol_gram_parity_tpu():
    """Gram-fused streaming Cholesky vs train_gram + factorization,
    including masked rows (identity via far-point coords) and padding.

    Forward L-comparison is the wrong metric on an ill-conditioned train
    gram (Cholesky sensitivity amplifies the X3-class trailing-update
    error); what the posterior sees is the backward error ||L L^T - K||
    and the resulting predictions, so those are what this test pins."""
    import scipy.linalg as sla
    from erl_gaussian_process_tpu.kernels import cross_gram, train_gram
    from erl_gaussian_process_tpu.ops.pallas_chol import chol_blocked_gram

    rng = np.random.default_rng(11)
    n, d = 2600, 2   # pads to 3072 (nb=6, above the nb>=5 structural min)
    x = jnp.asarray(rng.uniform(-2, 2, (n, d)).astype(np.float32))
    # noise in the f32-feasible regime (below ~1e-3 the gram's own
    # f32 storage rounding makes the system indefinite at this n)
    var = jnp.asarray((1e-2 + 1e-2 * rng.random(n)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.95)
    y = np.where(np.asarray(mask), np.sin(2 * np.asarray(x[:, 0])), 0.0)
    xq = jnp.asarray(rng.uniform(-2, 2, (200, d)).astype(np.float32))
    for fam in ("rbf", "matern32"):
        L = np.asarray(chol_blocked_gram(fam, x, var, mask,
                                         np.float32(0.5)))
        assert np.abs(np.triu(L, 1)).max() == 0.0
        K = np.asarray(train_gram(fam, x, jnp.where(mask, var, 0.0),
                                  np.float32(0.5), mask=mask), np.float64)
        recon = np.abs(L.astype(np.float64) @ L.astype(np.float64).T
                       - K).max()
        assert recon < 5e-4, (fam, recon)
        # posterior parity: mean predictions through the fused factor vs
        # the f64 exact solve
        kt = np.asarray(cross_gram(fam, x, xq, np.float32(0.5),
                                   mask1=mask), np.float64)
        a = sla.cho_solve((L.astype(np.float64), True), y)
        a_ref = sla.cho_solve((np.linalg.cholesky(K), True), y)
        mu, mu_ref = kt.T @ a, kt.T @ a_ref
        mae = np.abs(mu - mu_ref).mean()
        assert mae < 2e-3, (fam, mae)


@pytest.mark.parametrize("rank", [1, 2])
@interpret_test
def test_elim2d_interpret_parity(rank):
    """The streaming-Cholesky elimination base case ([D|I] -> [L^T|L^-1])
    against numpy, in interpret mode — pins ops/pallas_chol._elim2d and
    its rank-2 form on a backend where the TPU-only parity tests skip."""
    from jax.experimental import pallas as pl

    from erl_gaussian_process_tpu.ops.pallas_chol import (_SB, _elim2d,
                                                          _elim2d_r2)
    elim = _elim2d if rank == 1 else _elim2d_r2

    def kern(aug_in, aug_out, aug_scratch):
        aug_scratch[:, :] = aug_in[:, :]
        elim(aug_scratch, _SB)
        aug_out[:, :] = aug_scratch[:, :]

    rng = np.random.default_rng(0)
    X = rng.standard_normal((_SB, _SB)).astype(np.float32)
    D = (X @ X.T + _SB * np.eye(_SB)).astype(np.float32)
    aug = np.concatenate([D, np.eye(_SB, dtype=np.float32)], axis=1)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((_SB, 2 * _SB), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_SB, 2 * _SB), jnp.float32)],
        interpret=True,
    )(jnp.asarray(aug))
    out = np.asarray(out, np.float64)
    L = np.tril(out[:, :_SB].T)
    L_inv = out[:, _SB:]
    L_ref = np.linalg.cholesky(D.astype(np.float64))
    assert np.abs(L - L_ref).max() / np.abs(L_ref).max() < 1e-5
    assert np.abs(L_inv @ L - np.eye(_SB)).max() < 1e-4


@pytest.mark.parametrize("rank", [1, 2])
@interpret_test
def test_bank_elimination_interpret_parity(rank):
    """The bank kernel's batched augmented elimination (both ranks)
    against numpy per-member Cholesky, in interpret mode — including an
    identity (far-point-padded) member, which the rank-2 2x2 pivot must
    pass through unchanged."""
    from jax.experimental import pallas as pl

    from erl_gaussian_process_tpu.ops.pallas_bank import (_elimination,
                                                          _elimination_r2)
    elim = _elimination if rank == 1 else _elimination_r2

    G, n = 3, 128
    rng = np.random.default_rng(1)
    A = np.empty((G, n, n), np.float32)
    for g in range(G - 1):
        X = rng.standard_normal((n, n)).astype(np.float32)
        A[g] = X @ X.T + n * np.eye(n, dtype=np.float32)
    A[G - 1] = np.eye(n, dtype=np.float32)   # far-point-padded member
    aug = np.concatenate(
        [A, np.broadcast_to(np.eye(n, dtype=np.float32), (G, n, n))], axis=2)

    def kern(aug_in, aug_out, scratch):
        scratch[:] = aug_in[:]
        elim(scratch, n, n)
        aug_out[:] = scratch[:]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((G, n, 2 * n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, n, 2 * n), jnp.float32)],
        interpret=True,
    )(jnp.asarray(aug))
    out = np.asarray(out, np.float64)
    for g in range(G):
        L = np.tril(out[g, :, :n].T)
        L_inv = out[g, :, n:]
        L_ref = np.linalg.cholesky(A[g].astype(np.float64))
        assert np.abs(L - L_ref).max() / np.abs(L_ref).max() < 1e-5, g
        assert np.abs(L_inv @ L - np.eye(n)).max() < 1e-4, g


@pytest.mark.parametrize("rank", [1, 2])
@interpret_test
def test_bank_elimination_stop_bound_parity(rank):
    """Bounding the serial elimination at the unpadded member size n0 must
    be BITWISE identical on the n0-crop to running the full padded chain:
    columns >= n0 are identity rows (the wrappers' far-point / diag
    padding), whose elimination is an exact no-op that never touches rows
    < n0. This is the contract that lets bank_fit_fused skip the padding's
    serialized cost (e.g. 112 of 256 slab RMWs at the 3D sensor bank's
    n0=144)."""
    from jax.experimental import pallas as pl

    from erl_gaussian_process_tpu.ops.pallas_bank import (_elimination,
                                                          _elimination_r2)
    elim = _elimination if rank == 1 else _elimination_r2

    G, n, n0 = 2, 128, 100
    rng = np.random.default_rng(2)
    A = np.zeros((G, n, n), np.float32)
    for g in range(G):
        X = rng.standard_normal((n0, n0)).astype(np.float32)
        A[g, :n0, :n0] = X @ X.T + n0 * np.eye(n0, dtype=np.float32)
        A[g, range(n0, n), range(n0, n)] = 1.0   # identity padding tail
    aug = np.concatenate(
        [A, np.broadcast_to(np.eye(n, dtype=np.float32), (G, n, n))], axis=2)

    def run(stop):
        def kern(aug_in, aug_out, scratch):
            scratch[:] = aug_in[:]
            elim(scratch, n, stop)
            aug_out[:] = scratch[:]

        return np.asarray(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G, n, 2 * n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((G, n, 2 * n), jnp.float32)],
            interpret=True,
        )(jnp.asarray(aug)))

    full, bounded = run(n), run(n0)
    # crop exactly as _split_outputs does
    np.testing.assert_array_equal(bounded[:, :n0, :n][:, :, :n0],
                                  full[:, :n0, :n][:, :, :n0])
    np.testing.assert_array_equal(bounded[:, :n0, n:][:, :, :n0],
                                  full[:, :n0, n:][:, :, :n0])


@interpret_test
def test_bank_fit_fused_rectangular_interpret_parity():
    """The full fused bank-fit wrapper at a non-128 member size, in
    interpret mode: the rectangular (R=8-grain rows, 128-grain lanes) slab
    plus the n0-bounded elimination must reproduce per-member numpy
    Cholesky factors exactly where valid — including masked slots and
    B-padding to the grid."""
    from erl_gaussian_process_tpu.ops.pallas_bank import bank_fit_fused

    rng = np.random.default_rng(3)
    B, n0, d, q = 3, 20, 2, 2        # R=24 rows, 128 lanes, Bp=16-grid pad
    x = jnp.asarray(rng.normal(size=(B, n0, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, n0, q)).astype(np.float32))
    var = jnp.asarray((0.5 + 0.1 * rng.random((B, n0))).astype(np.float32))
    mask = jnp.asarray(rng.random((B, n0)) < 0.8)
    with pltpu.force_tpu_interpret_mode():
        L, L_inv, alpha = bank_fit_fused("rbf", x, y, var, mask,
                                         np.float32(0.7))
    assert L.shape == (B, n0, n0) and alpha.shape == (B, n0, q)
    xn, yn = np.asarray(x, np.float64), np.asarray(y, np.float64)
    mn = np.asarray(mask)
    for b in range(B):
        r2 = ((xn[b][:, None, :] - xn[b][None, :, :]) ** 2).sum(-1)
        A = np.exp(-r2 / (2 * 0.7 ** 2)) + np.diag(np.asarray(var)[b].astype(np.float64))
        A = np.where(mn[b][:, None] & mn[b][None, :], A, 0.0)
        A[~mn[b], ~mn[b]] = 1.0
        L_ref = np.linalg.cholesky(A)
        a_ref = np.linalg.solve(A, np.where(mn[b][:, None], yn[b], 0.0))
        tri = np.tril(np.ones((n0, n0), bool))
        assert np.abs(np.where(tri, np.asarray(L[b]) - L_ref, 0)).max() < 1e-4
        assert np.abs(np.asarray(alpha[b]) - a_ref).max() < 1e-4
        assert np.abs(np.asarray(L_inv[b]) @ L_ref - np.eye(n0)).max() < 1e-4


@interpret_test
def test_chol_blocked_interpret_parity(monkeypatch):
    """FULL streaming-Cholesky kernel (grid schedule, pair-stream prefix
    window, deferred writes, mirror zero-fill) against numpy in
    interpret mode at a shrunk tile — pins the index arithmetic of every
    DMA descriptor on a backend where the TPU parity tests skip.
    Interpret mode emulates DMAs sequentially, so this cannot catch
    semaphore-ordering races (the on-chip tests own those), but any
    wrong slice/offset/predicate corrupts the factor and fails here.
    nb in {5, 6, 9} covers: the structural minimum, an even chunk split,
    and full-chunk + remainder panels on both sides of a 4-boundary."""
    from erl_gaussian_process_tpu.ops import pallas_chol as pc

    monkeypatch.setattr(pc, "_SB", 8)   # 128 serial elim rounds -> 8
    tile = 16
    rng = np.random.default_rng(0)
    for nb in (5, 6, 9):
        n = nb * tile
        X = rng.standard_normal((n, n)).astype(np.float32)
        A = X @ X.T / n + np.eye(n, dtype=np.float32) * 2.0
        with pltpu.force_tpu_interpret_mode():
            L = np.asarray(pc.chol_blocked(jnp.asarray(A), tile=tile))
        ref = np.linalg.cholesky(A.astype(np.float64))
        assert np.abs(L - ref).max() < 5e-5, nb
        assert np.abs(np.triu(L, 1)).max() == 0.0, nb


@interpret_test
def test_chol_blocked_gram_interpret_parity(monkeypatch):
    """Gram-fused variant of the above: in-kernel gram build from
    coordinate slices + masked rows via far-point coords + pad rows,
    against a dense numpy gram, in interpret mode at a shrunk tile."""
    from erl_gaussian_process_tpu.ops import pallas_chol as pc

    from erl_gaussian_process_tpu.kernels.stationary import (
        register_scale_mixture,
    )

    monkeypatch.setattr(pc, "_SB", 8)
    tile = 16
    rng = np.random.default_rng(1)
    mix = register_scale_mixture("rbf", 0.5, (0.7, 0.3))
    for nb, fam in ((5, "rbf"), (6, "matern32"), (9, "ou"), (5, mix)):
        n0 = nb * tile - 3          # exercises the pad-identity rows
        d = 2
        x = rng.uniform(-3, 3, (n0, d)).astype(np.float32)
        var = (0.05 + 0.01 * rng.random(n0)).astype(np.float32)
        mask = np.ones(n0, bool)
        mask[-4:] = False
        scale = np.float32(1.7)
        with pltpu.force_tpu_interpret_mode():
            L = np.asarray(pc.chol_blocked_gram(
                fam, jnp.asarray(x), jnp.asarray(var), jnp.asarray(mask),
                scale, tile=tile))
        r = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1))
        if fam == "rbf":
            K = np.exp(-0.5 * (r / scale) ** 2)
        elif fam == "ou":
            K = np.exp(-r / scale)
        elif fam == mix:
            K = (0.7 * np.exp(-0.5 * (r / scale) ** 2)
                 + 0.3 * np.exp(-0.5 * (r / (0.5 * scale)) ** 2))
        else:
            c = np.sqrt(3) / scale
            K = (1 + c * r) * np.exp(-c * r)
        K = K + np.diag(var)
        K[~mask, :] = 0.0
        K[:, ~mask] = 0.0
        K[np.ix_(~mask, ~mask)] = np.eye(int((~mask).sum()))
        ref = np.linalg.cholesky(K.astype(np.float64))
        assert np.abs(L - ref).max() < 3e-4, (nb, fam)
        assert np.abs(np.triu(L, 1)).max() == 0.0, (nb, fam)


@interpret_test
def test_chol_blocked_gram_joint_interpret_parity(monkeypatch):
    """JOINT value/gradient gram-fused streaming Cholesky against the jnp
    joint gram (kernels/gradient.train_gram_with_gradient) in interpret
    mode at a shrunk tile: pins the per-row metadata block selection
    (value/grad_k row types crossing tile boundaries), the masked-row
    identity diagonal, and the pad rows, for both differentiable
    families."""
    from erl_gaussian_process_tpu.kernels import train_gram_with_gradient
    from erl_gaussian_process_tpu.ops import pallas_chol as pc

    monkeypatch.setattr(pc, "_SB", 8)
    tile = 16
    rng = np.random.default_rng(3)
    for fam, d, n0 in (("rbf", 2, 33), ("matern32", 2, 33),
                       ("matern32", 1, 45), ("rbf", 3, 23)):
        # n0 chosen so block boundaries land mid-tile and the joint size
        # needs pad rows
        x = rng.uniform(-2, 2, (n0, d)).astype(np.float32)
        var_x = (0.02 + 0.01 * rng.random(n0)).astype(np.float32)
        var_y = (0.03 + 0.01 * rng.random(n0)).astype(np.float32)
        var_g = (0.05 + 0.01 * rng.random(n0)).astype(np.float32)
        sample_mask = rng.random(n0) < 0.9
        grad_mask = rng.random(n0) < 0.7
        scale = np.float32(0.9)
        with pltpu.force_tpu_interpret_mode():
            L = np.asarray(pc.chol_blocked_gram_joint(
                fam, jnp.asarray(x), jnp.asarray(var_x + var_y),
                jnp.asarray(var_g), jnp.asarray(sample_mask),
                jnp.asarray(grad_mask), scale, tile=tile))
        K = np.asarray(train_gram_with_gradient(
            fam, jnp.asarray(x),
            jnp.where(jnp.asarray(sample_mask), jnp.asarray(var_x), 0.0),
            jnp.where(jnp.asarray(sample_mask), jnp.asarray(var_y), 0.0),
            jnp.where(jnp.asarray(grad_mask), jnp.asarray(var_g), 0.0),
            jnp.asarray(sample_mask), jnp.asarray(grad_mask), scale),
            np.float64)
        ref = np.linalg.cholesky(K)
        assert np.abs(L - ref).max() < 5e-4, (fam, d)
        assert np.abs(np.triu(L, 1)).max() == 0.0, (fam, d)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas chol compiles only on TPU")
def test_pallas_chol_joint_gram_parity_tpu():
    """Joint gram-fused streaming Cholesky on-chip vs the jnp joint gram:
    backward error ||L L^T - K|| plus NIGP posterior mean/gradient parity
    through the fused factor (same metric rationale as
    test_pallas_chol_gram_parity_tpu)."""
    import scipy.linalg as sla
    from erl_gaussian_process_tpu.kernels import (
        cross_gram_with_gradient,
        train_gram_with_gradient,
    )
    from erl_gaussian_process_tpu.ops.pallas_chol import (
        chol_blocked_gram_joint,
    )

    rng = np.random.default_rng(5)
    n, d = 900, 2   # joint 2700 -> pads to 3072 (nb=6)
    x = jnp.asarray(rng.uniform(-2, 2, (n, d)).astype(np.float32))
    var_x = jnp.asarray((5e-3 + 1e-3 * rng.random(n)).astype(np.float32))
    var_y = jnp.asarray((5e-3 + 1e-3 * rng.random(n)).astype(np.float32))
    var_g = jnp.asarray((2e-2 + 1e-2 * rng.random(n)).astype(np.float32))
    sample_mask = jnp.asarray(rng.random(n) < 0.95)
    grad_mask = jnp.asarray(rng.random(n) < 0.8) & sample_mask
    xq = jnp.asarray(rng.uniform(-2, 2, (200, d)).astype(np.float32))
    for fam in ("rbf", "matern32"):
        L = np.asarray(chol_blocked_gram_joint(
            fam, x, var_x + var_y, var_g, sample_mask, grad_mask,
            np.float32(0.5)))
        assert np.abs(np.triu(L, 1)).max() == 0.0
        K = np.asarray(train_gram_with_gradient(
            fam, x, jnp.where(sample_mask, var_x, 0.0),
            jnp.where(sample_mask, var_y, 0.0),
            jnp.where(grad_mask, var_g, 0.0),
            sample_mask, grad_mask, np.float32(0.5)), np.float64)
        recon = np.abs(L.astype(np.float64) @ L.astype(np.float64).T
                       - K).max()
        assert recon < 5e-4, (fam, recon)
        # posterior parity through the factor: joint rhs = [y; grads]
        yv = np.where(np.asarray(sample_mask),
                      np.sin(2 * np.asarray(x[:, 0])), 0.0)
        gv = np.zeros((d * n,))
        gv[:n] = np.where(np.asarray(grad_mask),
                          2 * np.cos(2 * np.asarray(x[:, 0])), 0.0)
        rhs = np.concatenate([yv, gv])
        kt = np.asarray(cross_gram_with_gradient(
            fam, x, xq, np.float32(0.5), sample_mask, grad_mask,
            with_test_grad=True), np.float64)
        a = sla.cho_solve((L.astype(np.float64), True), rhs)
        a_ref = sla.cho_solve((np.linalg.cholesky(K), True), rhs)
        mu, mu_ref = kt.T @ a, kt.T @ a_ref
        mae = np.abs(mu - mu_ref).mean()
        assert mae < 2e-3, (fam, mae)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="verifies the Mosaic bank kernel composes with "
                           "shard_map on real hardware")
def test_pallas_bank_composes_with_shard_map_tpu():
    """sharded_bank_fit on a 1-device mesh must take the fused Pallas
    kernel (pallas_bank_applies holds for this shape) and agree with the
    plain bank_fit dispatch — the 'Mosaic kernels compose with shard_map'
    contract claimed by parallel/mesh.sharded_bank_fit, checked on-chip
    where the CPU-mesh suite cannot (the kernel compiles only for real
    hardware, and tests/test_parallel.py needs 8 devices)."""
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit
    from erl_gaussian_process_tpu.ops.pallas_bank import pallas_bank_applies
    from erl_gaussian_process_tpu.parallel import make_mesh, sharded_bank_fit

    rng = np.random.default_rng(7)
    B, n, d = 8, 200, 2
    x = jnp.asarray(rng.uniform(-2, 2, (B, n, d)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (B, n, 1)).astype(np.float32))
    var = jnp.full((B, n), np.float32(1e-2))
    mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.9)
    assert pallas_bank_applies(x.dtype, n, d)
    mesh = make_mesh(1)
    sharded = sharded_bank_fit(mesh, x, y, var, mask, np.float32(0.5),
                               kernel="rbf")
    local = bank_fit(x, y, var, mask, np.float32(0.5), kernel="rbf")
    assert sharded.L_inv is not None and local.L_inv is not None
    np.testing.assert_allclose(np.asarray(sharded.L), np.asarray(local.L),
                               atol=0.0)
    np.testing.assert_allclose(np.asarray(sharded.alpha),
                               np.asarray(local.alpha), atol=0.0)
