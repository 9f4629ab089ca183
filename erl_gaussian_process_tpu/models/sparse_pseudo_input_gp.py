"""Incremental sparse pseudo-input GP (SPGP/FITC) over fixed pseudo-points.

Reference: SparsePseudoInputGaussianProcess
(include/erl_gaussian_process/sparse_pseudo_input_gp.hpp:13-33 documents the
algorithm; src/sparse_pseudo_input_gp.cpp implements it):

    init:    K_M = k(P, P);  L_KM = chol(K_M);  Q_M = K_M;  alpha = 0
    update:  Q_M   += K_MN (Lambda + diag(var))^{-1} K_MN^T
             alpha += K_MN (Lambda + diag(var))^{-1} y
             lambda_i = 1 - ||L_KM^{-1} k_i||^2
    predict: mean  = k*^T Q_M^{-1} alpha
             var   = 1 - ||L_KM^{-1} k*||^2 + ||L_QM^{-1} k*||^2
             (noise NOT added, matching the implementation rather than the
             header comment, src/sparse_pseudo_input_gp.cpp:280-300)

TPU design: the whole update is three dense ops — one (M, N) cross gram, one
batched triangular solve against L_KM, and one M×M×N GEMM on the MXU — as a
single jitted step with donated (Q_M, alpha) buffers, replacing the
reference's per-column OpenMP loop (src/sparse_pseudo_input_gp.cpp:768-774).
The reference's sparse-matrix variant (``use_sparse``) drops K entries
below ``sparse_zero_threshold`` before every solve/GEMM
(UpdateSparse/ComputeKtestSparse, src/sparse_pseudo_input_gp.cpp:793-832,
:55-77). Its MATH is reproduced here exactly as a masked dense
computation — scatter/gather sparsity would force dynamic shapes and is
hostile to the MXU, while zeros flow through dense GEMMs at full
throughput, so the CPU cache win it buys Eigen does not exist on TPU.

Note: the reference's vector-valued ``TestResult::GetGradient`` dots the RAW
accumulated alpha instead of Q_M^{-1} alpha (src/sparse_pseudo_input_gp.cpp:
212 vs :263); the scalar overload uses the solved alpha. We implement the
mathematically consistent solved-alpha form everywhere.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from erl_gaussian_process_tpu.kernels import (
    KernelSetting,
    cross_gram,
    cross_gram_with_gradient,
    kernel_fn,
    resolve_kernel_name,
)
from erl_gaussian_process_tpu.models.gp_core import (
    f32_matmul,
    kahan_add,
    robust_cholesky,
)
from erl_gaussian_process_tpu.utils.serialization import (
    eq_state,
    load_pytree,
    save_pytree,
)


class SpGpState(NamedTuple):
    """pseudo (M, d); L_km (M, M); L_inv (M, M) = L_km^{-1} (precomputed once
    — pseudo points are fixed, so every update's triangular solve becomes an
    MXU GEMM; TPUs run trsm far below matmul throughput); qm (M, M) [or
    (M, 1) when diagonal]; alpha (M, q).

    M may include far-point padding rows (see ``pad_pseudo_points``): padded
    pseudo points sit at distinct coordinates ~1e15 apart, so every kernel
    value against them underflows to exactly 0 and K_M is block-diag(K, I) —
    all downstream linear algebra is exact without any masks.

    ``qm_c``/``alpha_c`` are the Kahan compensation buffers for the
    streaming accumulation (see gp_core.kahan_add): ``qm - qm_c`` recovers
    the accumulated Q_M to ~double-float32 precision after thousands of
    rank-N updates, where the plain f32 running sum drifts by ~sqrt(T)*eps
    and leaves chol(Q_M) numerically indefinite at the production config.
    ``qm`` alone is still the correctly-rounded f32 estimate (|qm_c| stays
    below one ulp of qm), so every consumer of ``qm`` is unchanged; the
    compensation is consulted only by the exact float64 refactorization
    (``spgp_prepare_exact_host``)."""

    pseudo: jnp.ndarray
    L_km: jnp.ndarray
    L_inv: jnp.ndarray
    qm: jnp.ndarray
    alpha: jnp.ndarray
    qm_c: jnp.ndarray
    alpha_c: jnp.ndarray


def pad_pseudo_points(p: np.ndarray, multiple: int = 128) -> np.ndarray:
    """Pad (M, d) pseudo points to a multiple of ``multiple`` rows using the
    far-point trick: row i of the padding sits at 1e15 * (i + 2) in every
    coordinate, so padded rows are mutually distant and far from any data —
    k(pad, .) == +0.0 exactly for rbf/ou/matern32 in both float32/float64
    (distances stay finite: squared-distance ~1e36 < f32 max)."""
    m, d = p.shape
    m_pad = -(-m // multiple) * multiple
    if m_pad == m:
        return p
    pad = (np.arange(m_pad - m, dtype=p.dtype) + 2.0)[:, None] * p.dtype.type(
        1e15) * np.ones((1, d), p.dtype)
    return np.concatenate([p, pad], axis=0)


@partial(jax.jit, static_argnames=("kernel", "diagonal_qm", "y_dim"))
@f32_matmul
def spgp_init(pseudo, scale, *, kernel: str, diagonal_qm: bool = False,
              y_dim: int = 1) -> SpGpState:
    """K_M, chol, Q_M <- K_M (or ones when diagonal), alpha <- 0
    (reference ctor, src/sparse_pseudo_input_gp.cpp:336-350)."""
    m = pseudo.shape[0]
    km = kernel_fn(kernel)(pseudo, pseudo, scale)
    L_km = robust_cholesky(km)
    L_inv = solve_triangular(L_km, jnp.eye(m, dtype=km.dtype), lower=True)
    qm = jnp.ones((m, 1), km.dtype) if diagonal_qm else km
    alpha = jnp.zeros((m, y_dim), km.dtype)
    return SpGpState(pseudo=pseudo, L_km=L_km, L_inv=L_inv, qm=qm,
                     alpha=alpha, qm_c=jnp.zeros_like(qm),
                     alpha_c=jnp.zeros_like(alpha))


@partial(jax.jit, static_argnames=("kernel", "diagonal_qm", "use_pallas",
                                   "zero_threshold"),
         donate_argnames=("state",))
@f32_matmul
def spgp_update(state: SpGpState, x, y, var, mask, scale, *, kernel: str,
                diagonal_qm: bool = False,
                use_pallas: Optional[bool] = None,
                zero_threshold: float = 0.0) -> SpGpState:
    """Rank-N FITC update (UpdateDense, src/sparse_pseudo_input_gp.cpp:751-791)
    with fixed-shape masking: masked-out columns contribute nothing.

    x (n, d); y (n, q); var/mask (n,).

    On TPU/float32 with MXU-aligned M this dispatches to the fully fused
    Pallas kernel (ops/pallas_fitc.py); otherwise the jnp path below, whose
    chain XLA fuses well but whose triangular solve it cannot avoid.
    ``use_pallas`` is a static arg (not an ambient env check) so toggling it
    can never be defeated by the jit cache.

    ``zero_threshold`` > 0 reproduces UpdateSparse
    (src/sparse_pseudo_input_gp.cpp:793-832): K_MN entries below the
    threshold are zeroed BEFORE the beta solve, exactly as the reference's
    sparse kernel computation drops them — as a masked dense chain, since
    scatter/gather sparsity is hostile to the MXU while zeros flow through
    GEMMs at full throughput (docs/parity.md deviation #1)."""
    from erl_gaussian_process_tpu.ops.pallas_fitc import (
        pallas_fitc_enabled,
        pallas_fitc_update,
    )

    m = state.pseudo.shape[0]
    if use_pallas is None:
        use_pallas = (not diagonal_qm and zero_threshold == 0.0
                      and pallas_fitc_enabled(
                          state.pseudo.dtype, m, state.pseudo.shape[1]))
    if use_pallas:
        dq, da = pallas_fitc_update(kernel, state.pseudo, state.L_inv, x, y,
                                    var, mask, scale)
        qm, qm_c = kahan_add(state.qm, state.qm_c, dq)
        alpha, alpha_c = kahan_add(state.alpha, state.alpha_c, da)
        return SpGpState(pseudo=state.pseudo, L_km=state.L_km,
                         L_inv=state.L_inv, qm=qm, alpha=alpha,
                         qm_c=qm_c, alpha_c=alpha_c)

    # f32 perf path: beta as one GEMM against the amortized L_inv (the same
    # trick the Pallas kernel uses) — XLA's trsm is latency-bound far below
    # the MXU roofline. f64 keeps the triangular solve (reference parity
    # path; L_inv at f64 is equally accurate but trsm is the reference's
    # semantics and f64 is never the hot path).
    l_inv = state.L_inv if state.pseudo.dtype == jnp.float32 else None
    dq, da = fitc_delta(state.pseudo, state.L_km, x, y, var, mask, scale,
                        kernel=kernel, diagonal_qm=diagonal_qm,
                        zero_threshold=zero_threshold, L_inv=l_inv)
    qm, qm_c = kahan_add(state.qm, state.qm_c, dq)
    alpha, alpha_c = kahan_add(state.alpha, state.alpha_c, da)
    return SpGpState(pseudo=state.pseudo, L_km=state.L_km,
                     L_inv=state.L_inv, qm=qm, alpha=alpha,
                     qm_c=qm_c, alpha_c=alpha_c)


def fitc_delta(pseudo, L_km, x, y, var, mask, scale, *, kernel: str,
               diagonal_qm: bool = False, reduce=lambda t: t,
               zero_threshold: float = 0.0, L_inv=None):
    """The per-column FITC increment (dQ_M (M, M|1), dalpha (M, q)) —
    the ONE implementation of UpdateDense's column math
    (src/sparse_pseudo_input_gp.cpp:758-780), shared by the single-chip
    update above and the mesh-sharded paths (parallel/mesh.py), so a
    numerical fix here (e.g. the lambda clamp) can never drift between
    them. ``reduce`` wraps each accumulated product; the sharded callers
    pass a psum so the cross-shard sum rides ICI.

    ``zero_threshold`` > 0: UpdateSparse semantics — sub-threshold K_MN
    entries zeroed before the solve (masked dense; see spgp_update).

    ``L_inv``: when given, beta is computed as the GEMM ``L_inv @ kmn``
    instead of a triangular solve against ``L_km`` — the f32 perf path
    (see spgp_update); pass None to keep the trsm (f64 parity path)."""
    kmn = cross_gram(kernel, pseudo, x, scale)                 # (M, n)
    if zero_threshold:
        kmn = jnp.where(jnp.abs(kmn) >= zero_threshold, kmn, 0.0)
    if L_inv is not None:
        # one MXU GEMM against the amortized inverse instead of XLA's
        # latency-bound block trsm chain (pseudo points are fixed, so
        # L_inv = L_KM^{-1} is computed once at init)
        beta = L_inv @ kmn                                     # (M, n)
    else:
        beta = solve_triangular(L_km, kmn, lower=True)         # (M, n)
    # lambda >= 0 mathematically (FITC residual variance); float roundoff can
    # push ||beta||^2 past 1 near pseudo points, and an unclamped lambda can
    # cancel var exactly -> w = inf -> NaN state. Clamp to the math.
    lam = jnp.maximum(1.0 - jnp.sum(beta * beta, axis=0), 0.0)  # (n,)
    inv = jnp.where(mask, 1.0 / (lam + var), 0.0)              # (n,)
    ksc = kmn * inv[None, :]
    if diagonal_qm:
        dqm = reduce(jnp.sum(ksc * kmn, axis=1, keepdims=True))
    else:
        dqm = reduce(ksc @ kmn.T)
    yv = jnp.where(mask[:, None], y, 0.0)
    dalpha = reduce(ksc @ yv)
    return dqm, dalpha


@partial(jax.jit, static_argnames=("diagonal_qm",))
@f32_matmul
def spgp_prepare(state: SpGpState, jitter=0.0, *,
                 diagonal_qm: bool = False):
    """(L_qm, alpha_solved = Q_M^{-1} alpha) — the lazy PrepareLqm +
    TestResult ctor solve (src/sparse_pseudo_input_gp.cpp:834-842, :100-109).

    Plain Cholesky + a ``jitter`` knob: the class ``_prepared`` cache
    retries on the HOST with escalating jitter if Q_M is numerically
    indefinite — in-jit retry structures cost 2-3x the factorization on
    TPU even when never taken (see gp_core.cholesky_fit)."""
    if diagonal_qm:
        L_qm = jnp.sqrt(state.qm[:, 0])
        return jnp.diag(L_qm), state.alpha / state.qm
    m = state.qm.shape[0]
    qm = state.qm + (jitter * jnp.mean(jnp.diag(state.qm))) * jnp.eye(
        m, dtype=state.qm.dtype)
    L_qm = jnp.linalg.cholesky(qm)
    a = solve_triangular(L_qm, state.alpha, lower=True)
    a = solve_triangular(L_qm.T, a, lower=False)
    return L_qm, a


@jax.jit
def _tri_inv(L):
    """Explicit lower-triangular inverse (one trsm with M RHS); feeds
    fitc_variance's amortized-GEMM whitening via ``li_qm``."""
    return solve_triangular(L, jnp.eye(L.shape[0], dtype=L.dtype),
                            lower=True)


def spgp_prepare_exact_host(state: SpGpState, *, diagonal_qm: bool = False):
    """Exact float64 HOST refactorization of Q_M for states whose chol is
    numerically indefinite at the state dtype (the production f32 regime:
    after ~1e3 accumulated rank-N updates, lambda_min(Q_M)/diag can sit
    below f32 resolution even though Q_M is SPD — the reference NaNs here,
    src/sparse_pseudo_input_gp.cpp:834-842).

    Semantics-preserving, unlike a jitter retry: the compensated
    (qm - qm_c, alpha - alpha_c) pair recovers the accumulated system to
    ~double-f32 precision, the f64 factorization's backward error is far
    below f32 resolution, and the effective observation noise is untouched.
    Lazy-path cost only: one M^2 device->host fetch + a host chol
    (~10 ms at M=1152), cached until the next update.

    If the STORED Q_M is indefinite even at float64 — accumulated
    GEMM-rounding noise in the increments themselves has pushed
    lambda_min below 0, which no summation precision can prevent — the
    noise-dominated eigendirections are repaired surgically: eigenvalues
    below the measured breach magnitude |lambda_min^-| are clamped UP to
    ~2x that noise floor, which bounds their contribution to the
    posterior by 1/noise without touching the data-bearing directions
    (unlike a global jitter, which inflates every direction and changes
    the effective observation noise — the warning case). The repair's
    end-to-end posterior impact is what the bench's 983-pose
    f32-vs-f64 drift gate quantifies.

    Returns (L_qm, alpha_solved) in the state dtype, or None if the
    system is non-finite/degenerate (callers fall back to the jitter
    ladder, which warns)."""
    import logging

    import scipy.linalg

    log = logging.getLogger("erl_gaussian_process_tpu")
    dt = np.asarray(state.qm).dtype
    qm = np.asarray(state.qm, np.float64) - np.asarray(state.qm_c,
                                                       np.float64)
    al = np.asarray(state.alpha, np.float64) - np.asarray(state.alpha_c,
                                                          np.float64)
    if not (np.isfinite(qm).all() and np.isfinite(al).all()):
        return None
    if diagonal_qm:
        if not (qm > 0).all():
            return None
        L = np.sqrt(qm[:, 0])
        return jnp.asarray(np.diag(L).astype(dt)), jnp.asarray(
            (al / qm).astype(dt))
    try:
        L = np.linalg.cholesky(qm)
    except np.linalg.LinAlgError:
        w, v = np.linalg.eigh(qm)
        if w[-1] <= 0:
            return None  # degenerate beyond repair
        floor = 2.0 * max(-w[0], 0.0) + 1e-12 * w[-1]
        n_clamped = int((w < floor).sum())
        log.info(
            "Q_M indefinite at float64 (lambda_min %.3e vs lambda_max "
            "%.3e): accumulated increment-rounding noise breached PSD; "
            "clamping %d noise-dominated eigenvalues up to %.3e "
            "(see spgp_prepare_exact_host)", w[0], w[-1], n_clamped, floor)
        w = np.maximum(w, floor)
        qm = (v * w) @ v.T
        L = np.linalg.cholesky(qm)
    a = scipy.linalg.solve_triangular(L, al, lower=True)
    a = scipy.linalg.solve_triangular(L.T, a, lower=False)
    return jnp.asarray(L.astype(dt)), jnp.asarray(a.astype(dt))


@partial(jax.jit, static_argnames=("kernel", "with_grad", "with_var",
                                   "zero_threshold"))
@f32_matmul
def spgp_predict(state: SpGpState, L_qm, alpha_solved, xq, scale, *,
                 kernel: str, with_grad: bool = False, with_var: bool = True,
                 zero_threshold: float = 0.0, li_qm=None):
    """mean (m_q, q), grad (m_q, d, q) | None, var (m_q,) | None.

    ``zero_threshold`` > 0: the reference's sparse TestResult semantics
    (ComputeKtest[WithGradient]Sparse, src/sparse_pseudo_input_gp.cpp:
    55-77) — sub-threshold k* entries zeroed, as masked dense.

    ``li_qm``: optional precomputed chol(Q_M)^{-1} — turns the variance
    whitening into a GEMM (see fitc_variance); the f32 serving path
    passes it (class ``_prepared_inv`` cache), the f64 parity path and
    one-shot callers leave the exact trsm."""
    mq, d = xq.shape[0], xq.shape[1]
    zeros = jnp.zeros(state.pseudo.shape[0], bool)
    if with_grad:
        kt = cross_gram_with_gradient(
            kernel, state.pseudo, xq, scale,
            sample_mask=jnp.ones(state.pseudo.shape[0], bool),
            grad_mask=zeros, with_test_grad=True, with_train_grad=False)
    else:
        kt = cross_gram(kernel, state.pseudo, xq, scale)
    if zero_threshold:
        kt = jnp.where(jnp.abs(kt) >= zero_threshold, kt, 0.0)
    mean = kt[:, :mq].T @ alpha_solved
    grad = None
    if with_grad:
        g = kt[:, mq:].T @ alpha_solved                 # (d*mq, q)
        grad = g.reshape(d, mq, -1).transpose(1, 0, 2)  # (mq, d, q)
    var = None
    if with_var:
        var = fitc_variance(state.L_inv, L_qm, kt[:, :mq], li_qm=li_qm)
    return mean, grad, var


def fitc_variance(L_inv, L_qm, kmean, li_qm=None):
    """FITC predictive variance 1 - ||L_km^{-1}k*||^2 + ||L_qm^{-1}k*||^2
    (src/sparse_pseudo_input_gp.cpp:280-300) — shared by the single-chip
    predict above and parallel/mesh.sharded_spgp_predict. beta via the
    precomputed L_km^{-1}: a GEMM instead of a triangular solve (TPUs run
    trsm well below matmul throughput and L_inv is amortized over every
    query — pseudo points are fixed). Clamped at 0 like
    gp_core.variance_from_whitened: X3-class whitening can push
    1 - ||beta||^2 slightly negative near pseudo points.

    gamma takes the same amortized-inverse GEMM when the caller passes
    ``li_qm`` = chol(Q_M)^{-1} (cached per prepare, like L_inv is cached
    per pseudo grid): measured v5e M=1152 mq=2048 matern32, the per-call
    trsm held the mean+var path at 317 us — 4.6x over its ~69 us HBM
    roofline — while the mean-only (20.7 us, 0.9x roofline) and
    mean+grad (73.5 us, 0.8x) paths sit AT roofline
    (benchmarks/profile_grad_predict.py). Without ``li_qm`` the exact
    trsm is kept: it is the f64 parity semantics and the right call for
    one-shot queries where no prepare cache exists."""
    beta = L_inv @ kmean
    if li_qm is not None:
        gamma = li_qm @ kmean
    else:
        gamma = solve_triangular(L_qm, kmean, lower=True)
    return jnp.maximum(0.0, 1.0 - jnp.sum(beta * beta, axis=0)
                       + jnp.sum(gamma * gamma, axis=0))


@dataclasses.dataclass
class SpGpSetting:
    """Mirror of SparsePseudoInputGaussianProcess::Setting
    (sparse_pseudo_input_gp.hpp:45-66). ``use_sparse: true`` runs the
    reference's thresholded (UpdateSparse/ComputeKtestSparse) math —
    K entries below ``sparse_zero_threshold`` zeroed before every solve —
    implemented as a masked dense computation (see module docstring)."""

    kernel_type: str = "rbf"
    kernel: KernelSetting = dataclasses.field(default_factory=KernelSetting)
    max_num_samples: int = 256
    sparse_zero_threshold: float = 1e-6
    use_sparse: bool = False
    diagonal_qm: bool = False

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        d = dict(d or {})
        d.pop("kernel_setting_type", None)
        if "kernel" in d:
            d["kernel"] = KernelSetting.from_dict(d["kernel"])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class SpGpTestResult:
    def __init__(self, gp: "SparsePseudoInputGaussianProcess", xq,
                 will_predict_gradient: bool):
        self._gp = gp
        L_qm, a = gp._prepared()
        # f32 serving: variance whitening as a GEMM against the cached
        # chol(Q_M)^{-1} (fitc_variance docstring has the measured trsm
        # penalty this removes). f64 keeps the exact trsm — it is the
        # parity dtype and golden tests pin its semantics.
        li = gp._prepared_inv() if gp.dtype == np.float32 else None
        self._mean, self._grad, self._var = spgp_predict(
            gp.state, L_qm, a, xq, gp._scale, kernel=gp._kernel,
            with_grad=will_predict_gradient, with_var=True,
            zero_threshold=gp._zero_threshold, li_qm=li)
        self.num_test = xq.shape[0]

    def get_mean(self, y_index: int = 0, parallel: bool = True):
        del parallel
        return np.asarray(self._mean[:, y_index])

    def get_gradient(self, y_index: int = 0, parallel: bool = True):
        del parallel
        assert self._grad is not None
        return np.asarray(self._grad[:, :, y_index]).T  # (d, m)

    def get_variance(self, parallel: bool = True):
        del parallel
        return np.asarray(self._var)


class SparsePseudoInputGaussianProcess:
    """Stateful wrapper mirroring the reference API. ``pseudo_points`` is
    (d, M) column-major as in the reference ctor
    (sparse_pseudo_input_gp.cpp:313-356)."""

    Setting = SpGpSetting
    TestResult = SpGpTestResult

    def __init__(self, setting: Optional[SpGpSetting], pseudo_points,
                 dtype=np.float64, y_dim: int = 1):
        self.setting = setting or SpGpSetting()
        self.dtype = np.dtype(dtype)
        from erl_gaussian_process_tpu.utils.timing import (
            warn_if_x64_disabled,
        )
        warn_if_x64_disabled(self.dtype)
        from erl_gaussian_process_tpu.kernels import resolve_kernel_setting
        # use_sparse semantics (UpdateSparse/ComputeKtestSparse,
        # src/sparse_pseudo_input_gp.cpp:793-832, :55-77): K entries below
        # sparse_zero_threshold are dropped before every solve/GEMM. That
        # is exactly reproducible as a masked DENSE computation (zeros flow
        # through the MXU at full throughput, while scatter/gather sparsity
        # would force dynamic shapes) — so the posterior matches the
        # reference's sparse variant, on dense hardware paths.
        self._zero_threshold = (float(self.setting.sparse_zero_threshold)
                                if self.setting.use_sparse else 0.0)
        if self.setting.use_sparse:
            import logging
            logging.getLogger("erl_gaussian_process_tpu").info(
                "use_sparse: true — running the reference's thresholded "
                "(UpdateSparse) math as a masked dense computation, "
                "zero_threshold=%g (docs/parity.md deviations #1)",
                self._zero_threshold)
        self._kernel = resolve_kernel_setting(
            self.setting.kernel_type, self.setting.kernel,
            "SparsePseudoInputGaussianProcess")
        self._scale = float(self.setting.kernel.scale)
        p = np.asarray(pseudo_points, self.dtype)
        if p.ndim == 1:
            p = p[None, :]
        self._y_dim = y_dim
        pr = np.ascontiguousarray(p.T)                # (M, d)
        self._m_valid = pr.shape[0]
        if self.dtype == np.float32:
            # MXU-align the pseudo axis so updates take the fused Pallas path
            # (far-point padding is numerically exact, see pad_pseudo_points)
            pr = pad_pseudo_points(pr)
        self.state = spgp_init(
            jnp.asarray(pr),
            self.dtype.type(self._scale), kernel=self._kernel,
            diagonal_qm=self.setting.diagonal_qm, y_dim=y_dim)
        self._trained = False
        self._cache = None

    # -- accessors mirroring the reference ---------------------------------
    @property
    def is_trained(self):
        return self._trained

    @property
    def num_pseudo_points(self):
        return self._m_valid

    @property
    def pseudo_points(self):
        return np.asarray(self.state.pseudo[: self._m_valid]).T

    @property
    def mat_l_km(self):
        m = self._m_valid
        return np.asarray(self.state.L_km[:m, :m])

    @property
    def mat_qm(self):
        m = self._m_valid
        q = np.asarray(self.state.qm)
        return q[:m] if self.setting.diagonal_qm else q[:m, :m]

    @property
    def mat_alpha(self):
        return np.asarray(self.state.alpha[: self._m_valid])

    @property
    def mat_l_qm(self):
        """chol(Q_M) — computed lazily like the reference's PrepareLqm
        (src/sparse_pseudo_input_gp.cpp:834-842)."""
        m = self._m_valid
        return np.asarray(self._prepared()[0])[:m, :m]

    def _prepared(self):
        """Lazily-cached (chol(Q_M), Q_M^{-1} alpha), three tiers:

        1. device chol at the state dtype (the fast path — one
           factorization, no retry structure in the jit);
        2. on NaN OR ill-conditioning: EXACT float64 host refactorization
           from the compensated accumulators (``spgp_prepare_exact_host``)
           — the production-f32 long-horizon regime; posterior semantics
           unchanged, INFO log. The conditioning trigger exists because
           the f32 chol is a KNIFE EDGE near cond(Q_M) ~ 1/eps_f32: it
           can stay finite while its solve carries O(0.1-1) forward
           error (measured in-bench 2026-08-20: a finite tier-1 solve at
           cond 6e8 drifted the 983-pose posterior 9.1e-2 from f64 where
           the exact tier reads 7.5e-5). The estimate is the squared
           Cholesky pivot ratio (max diag(L)/min diag(L))^2 — free from
           the already-fetched factor — escalating above
           ``ERL_GP_COND_ESCALATE`` (default 1e7, ~1/eps_f32/2; f64
           states use 1e15). Cost when taken: one M^2 fetch + ~10 ms
           host chol at M=1152, amortized by this cache;
        3. only if Q_M is indefinite even at f64 (genuinely singular):
           the escalating jitter ladder, which changes the effective noise
           and therefore WARNS (gp_core.host_jitter_retry)."""
        if self._cache is None:
            r = spgp_prepare(self.state, self.dtype.type(0.0),
                             diagonal_qm=self.setting.diagonal_qm)
            ok = bool(np.isfinite(np.asarray(r[1])).all())
            if ok and not self.setting.diagonal_qm:
                dl = np.abs(np.diag(np.asarray(r[0], np.float64)))
                dmin = dl.min()
                thresh = float(os.environ.get(
                    "ERL_GP_COND_ESCALATE",
                    1e7 if self.dtype == np.float32 else 1e15))
                ok = dmin > 0 and (dl.max() / dmin) ** 2 <= thresh
            if ok:
                self._cache = r
            else:
                exact = spgp_prepare_exact_host(
                    self.state, diagonal_qm=self.setting.diagonal_qm)
                if exact is not None and bool(
                        np.isfinite(np.asarray(exact[1])).all()):
                    import logging
                    logging.getLogger("erl_gaussian_process_tpu").info(
                        "chol(Q_M) numerically indefinite or "
                        "ill-conditioned at %s — exact float64 host "
                        "refactorization from the compensated accumulators "
                        "(posterior unchanged; see "
                        "spgp_prepare_exact_host)", self.dtype)
                    self._cache = exact
                else:
                    from erl_gaussian_process_tpu.models.gp_core import (
                        host_jitter_retry,
                    )
                    self._cache = host_jitter_retry(
                        lambda j: spgp_prepare(
                            self.state, self.dtype.type(j),
                            diagonal_qm=self.setting.diagonal_qm),
                        lambda r: (r[1],), jitters=(1e-10, 1e-8, 1e-6,
                                                    1e-4, 1e-2))
        return self._cache

    def _prepared_inv(self):
        """chol(Q_M)^{-1}, cached per prepared factor: one trsm with M
        RHS when the lazy prepare refreshes, amortized over every
        subsequent variance query — the same contract as state.L_inv
        (fixed pseudo grid). Keyed on the L_qm array identity, so every
        path that invalidates ``_cache`` (update, load, retrain)
        invalidates this too."""
        L_qm, _ = self._prepared()
        li = getattr(self, "_li", None)
        if li is None or li[0] is not L_qm:
            li = (L_qm, _tri_inv(L_qm))
            self._li = li
        return li[1]

    def update(self, x, y, var, parallel: bool = True) -> bool:
        """Accumulate one batch. x (d, n); y (n, q) or (n,); var (n,) or
        scalar. (reference: Update → UpdateDense)."""
        del parallel
        x = np.asarray(x, self.dtype)
        if x.ndim == 1:
            x = x[None, :]
        n = x.shape[1]
        if n == 0:
            return False
        y = np.asarray(y, self.dtype)
        if y.ndim == 1:
            y = y[:, None]
        var = np.broadcast_to(np.asarray(var, self.dtype), (n,))
        nmax = max(self.setting.max_num_samples, n)
        xp = np.zeros((nmax, x.shape[0]), self.dtype)
        xp[:n] = x.T
        yp = np.zeros((nmax, y.shape[1]), self.dtype)
        yp[:n] = y
        vp = np.zeros((nmax,), self.dtype)
        vp[:n] = var
        mask = np.zeros((nmax,), bool)
        mask[:n] = True
        self.state = spgp_update(
            self.state, jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(vp),
            jnp.asarray(mask), self.dtype.type(self._scale),
            kernel=self._kernel, diagonal_qm=self.setting.diagonal_qm,
            zero_threshold=self._zero_threshold)
        self._trained = True
        self._cache = None
        return True

    def test(self, mat_x_test, predict_gradient: bool = False
             ) -> SpGpTestResult:
        xq = np.asarray(mat_x_test, self.dtype)
        if xq.ndim == 1:
            xq = xq[None, :]
        return SpGpTestResult(self, jnp.asarray(np.ascontiguousarray(xq.T)),
                              predict_gradient)

    def get_memory_usage(self) -> int:
        """Bytes held by model arrays (reference GetMemoryUsage
        introspection, SURVEY.md §5.5)."""
        from erl_gaussian_process_tpu.utils.timing import memory_usage
        return memory_usage(self.state)

    # -- checkpoint ---------------------------------------------------------
    def state_dict(self):
        return {
            "setting": self.setting.to_dict(),
            "trained": self._trained,
            "y_dim": self._y_dim,
            "m_valid": self._m_valid,
            "state": self.state._asdict(),
        }

    def load_state_dict(self, d):
        from erl_gaussian_process_tpu.kernels import resolve_kernel_setting
        self.setting = SpGpSetting.from_dict(d["setting"])
        self._kernel = resolve_kernel_setting(
            self.setting.kernel_type, self.setting.kernel,
            "SparsePseudoInputGaussianProcess")
        self._scale = float(self.setting.kernel.scale)
        self._zero_threshold = (float(self.setting.sparse_zero_threshold)
                                if self.setting.use_sparse else 0.0)
        self._trained = bool(d["trained"])
        self._y_dim = int(d["y_dim"])
        self._m_valid = int(d.get("m_valid", len(d["state"]["pseudo"])))
        st = {k: jnp.asarray(v) for k, v in d["state"].items()}
        # pre-compensation checkpoints: zero compensation is exact (the
        # accumulated values are unchanged; only future drift correction
        # restarts from here)
        st.setdefault("qm_c", jnp.zeros_like(st["qm"]))
        st.setdefault("alpha_c", jnp.zeros_like(st["alpha"]))
        self.state = SpGpState(**st)
        self._cache = None

    def save(self, path):
        save_pytree(path, self.state_dict())

    def load(self, path):
        self.load_state_dict(load_pytree(path))

    def __eq__(self, other):
        if not isinstance(other, SparsePseudoInputGaussianProcess):
            return NotImplemented
        return eq_state(self.state_dict(), other.state_dict())
