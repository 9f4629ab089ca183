"""GP with noisy inputs and optional per-sample gradient observations
(NIGP/GPIS-style; reference: NoisyInputGaussianProcess,
include/erl_gaussian_process/noisy_input_gp.hpp, src/noisy_input_gp.cpp).

Joint value/gradient system layout and noise placement are documented in
kernels/gradient.py. Per-sample ``grad_flag`` becomes a boolean mask over
fixed-shape gradient slots (one per sample per dim) — unflagged slots are
identity rows with zero alpha, which reproduces the reference's packed
variable-size system exactly while keeping shapes static for XLA.

Predictive quantities (reference formulas):
- mean:          k*ᵀ alpha                         (src/noisy_input_gp.cpp:140-143)
- gradient:      grad-column dot alpha              (:194-204)
- mean var:      1 - ||L⁻¹ k*||²                    (:238-250)
- grad var:      3/s² - ||L⁻¹ k*_grad||²            (:270-280, the 3/s² quirk)
- mean/grad cov: lower triangle of -(L⁻¹k*_j)ᵀ(L⁻¹k*_k)  (:320-331)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from erl_gaussian_process_tpu.kernels import (
    KernelSetting,
    cross_gram_with_gradient,
    gradient_prior_variance,
    resolve_kernel_name,
    train_gram,
    train_gram_with_gradient,
)
from erl_gaussian_process_tpu.kernels.reduced_rank import (
    ReducedRankBasis,
    ReducedRankSetting,
    parse_reduced_rank_name,
    rr_features,
    rr_joint_train_system,
    rr_ktest_joint,
    rr_train_system,
)
from erl_gaussian_process_tpu.models.gp_core import cholesky_fit, f32_matmul, whiten
from erl_gaussian_process_tpu.utils.serialization import (
    eq_state,
    load_pytree,
    save_pytree,
)


class NoisyInputGPState(NamedTuple):
    """x (n, d); masks (n,); L/alpha over the joint system
    (N = n if trained without gradient observations, else n(1+d))."""

    x: jnp.ndarray
    sample_mask: jnp.ndarray
    grad_mask: jnp.ndarray
    L: jnp.ndarray
    alpha: jnp.ndarray


def pack_alpha(y, grad, sample_mask, grad_mask):
    """alpha rows = [y(n); dim-major gradient blocks], masked to zero.
    y: (n, q); grad: (n, d, q). Mirrors the reference's interleaved packing
    (src/noisy_input_gp.cpp:845-857) with fixed-size blocks."""
    n, d, q = grad.shape
    yv = jnp.where(sample_mask[:, None], y, 0.0)
    gv = jnp.where(grad_mask[:, None, None], grad, 0.0)
    gflat = gv.transpose(1, 0, 2).reshape(d * n, q)
    return jnp.concatenate([yv, gflat], axis=0)


@partial(jax.jit, static_argnames=("kernel",))
@f32_matmul
def nigp_fit(x, y, grad, var_x, var_y, var_grad, sample_mask, grad_mask,
             scale, *, kernel: str) -> NoisyInputGPState:
    """Train with gradient observations: joint gram + LLT solve
    (src/noisy_input_gp.cpp:807-898).

    On TPU/f32 at joint size (1+d)n in [3584, 16384] the gram build is
    fused INTO the streaming factorization (ops/pallas_chol.
    chol_blocked_gram_joint): the jnp path materializes the (n, n, d)
    and (n, n, d, d) derivative blocks plus the (N, N) assembled gram in
    HBM before factoring — the fused kernel builds each tile in VMEM
    from per-row metadata instead."""
    from erl_gaussian_process_tpu.models.gp_core import solve_with_L
    from erl_gaussian_process_tpu.ops.pallas_chol import (
        chol_blocked_gram_joint,
        pallas_chol_joint_enabled,
    )

    alpha = pack_alpha(y, grad, sample_mask, grad_mask)
    if pallas_chol_joint_enabled(x.dtype, x.shape[0], kernel, x.shape[1]):
        L, dinv = chol_blocked_gram_joint(
            kernel, x, var_x + var_y, var_grad, sample_mask, grad_mask,
            scale, return_dinv=True)
        return NoisyInputGPState(x, sample_mask, grad_mask, L,
                                 solve_with_L(L, alpha, chol_dinv=dinv))
    K = train_gram_with_gradient(
        kernel, x, jnp.where(sample_mask, var_x, 0.0),
        jnp.where(sample_mask, var_y, 0.0),
        jnp.where(grad_mask, var_grad, 0.0),
        sample_mask, grad_mask, scale)
    L, a = cholesky_fit(K, alpha, robust=False)
    return NoisyInputGPState(x, sample_mask, grad_mask, L, a)


@partial(jax.jit, static_argnames=("kernel",))
@f32_matmul
def nigp_fit_nograd(x, y, var_x, var_y, sample_mask, scale, *, kernel: str
                    ) -> NoisyInputGPState:
    """Train without gradient observations: plain gram with
    var = var_x + var_y (src/noisy_input_gp.cpp:821-829)."""
    from erl_gaussian_process_tpu.models.gp_core import solve_with_L
    from erl_gaussian_process_tpu.ops.pallas_chol import (
        chol_blocked_gram,
        pallas_chol_gram_enabled,
    )

    var = jnp.where(sample_mask, var_x + var_y, 0.0)
    yv = jnp.where(sample_mask[:, None], y, 0.0)
    grad_mask = jnp.zeros_like(sample_mask)
    if pallas_chol_gram_enabled(x.dtype, x.shape[0], kernel, x.shape[1]):
        L, dinv = chol_blocked_gram(kernel, x, var, sample_mask, scale,
                                    return_dinv=True)
        return NoisyInputGPState(x, sample_mask, grad_mask, L,
                                 solve_with_L(L, yv, chol_dinv=dinv))
    K = train_gram(kernel, x, var, scale, mask=sample_mask)
    L, a = cholesky_fit(K, yv, robust=False)
    return NoisyInputGPState(x, sample_mask, grad_mask, L, a)


@jax.jit
@f32_matmul
def nigp_rr_fit(x, y, grad, var_x, var_y, var_grad, sample_mask, grad_mask,
                freq, sqrt_s, origin, half, inv_sqrt_vol
                ) -> NoisyInputGPState:
    """Reduced-rank train with gradient observations: the joint
    value/gradient information system A = I + Phi^T Wv Phi + dPhi^T Wg dPhi
    (kernels/reduced_rank.rr_joint_train_system — gradient observations are
    linear observations of the basis weights). L is (m, m) with m = #basis;
    the reference's 'Ktrain rows = #basis' reduced-rank shape contract
    threaded through NIGP (src/noisy_input_gp.cpp:860-868 + 1183-1184)."""
    from erl_gaussian_process_tpu.kernels.reduced_rank import (
        rr_features_with_grad,
    )

    phi, dphi = rr_features_with_grad(x, freq, sqrt_s, origin, half,
                                      inv_sqrt_vol)
    A, b = rr_joint_train_system(
        phi, dphi, y, grad, var_x + var_y, var_grad, sample_mask, grad_mask)
    L, a = cholesky_fit(A, b, robust=False)
    return NoisyInputGPState(x, sample_mask, grad_mask, L, a)


@jax.jit
@f32_matmul
def nigp_rr_fit_nograd(x, y, var_x, var_y, sample_mask, freq, sqrt_s,
                       origin, half, inv_sqrt_vol) -> NoisyInputGPState:
    """Reduced-rank train without gradient observations: plain RR system
    with the NIGP value-noise placement var = var_x + var_y
    (src/noisy_input_gp.cpp:821-829)."""
    phi = rr_features(x, sample_mask, freq, sqrt_s, origin, half,
                      inv_sqrt_vol)
    A, b = rr_train_system(phi, jnp.where(sample_mask[:, None], y, 0.0),
                           var_x + var_y, sample_mask)
    L, a = cholesky_fit(A, b, robust=False)
    return NoisyInputGPState(x, sample_mask, jnp.zeros_like(sample_mask),
                             L, a)


@partial(jax.jit, static_argnames=("kernel", "with_test_grad", "with_train_grad"))
def nigp_ktest(state: NoisyInputGPState, xq, scale, *, kernel: str,
               with_test_grad: bool, with_train_grad: bool):
    return cross_gram_with_gradient(
        kernel, state.x, xq, scale, state.sample_mask, state.grad_mask,
        with_test_grad=with_test_grad, with_train_grad=with_train_grad)


@partial(jax.jit, static_argnames=("num_test",))
@f32_matmul
def nigp_mean(state: NoisyInputGPState, ktest, num_test: int):
    """Means from the first num_test columns. Returns (m, q)."""
    return ktest[:, :num_test].T @ state.alpha


@partial(jax.jit, static_argnames=("num_test", "d"))
@f32_matmul
def nigp_gradient(state: NoisyInputGPState, ktest, num_test: int, d: int):
    """Gradients from dim-major columns m..m(1+d). Returns (m, d, q)."""
    gcols = ktest[:, num_test:num_test * (1 + d)]
    g = gcols.T @ state.alpha                      # (d*m, q)
    return g.reshape(d, num_test, -1).transpose(1, 0, 2)


def _varcov_from_whitened(at, ktest, scale, d: int, reduced_rank: bool):
    m = ktest.shape[1] // (1 + d)
    cols = at.T.reshape(1 + d, m, -1)              # (1+d, m, N)
    sq = jnp.sum(cols * cols, axis=-1)             # (1+d, m)
    # clamped at 0 like gp_core.variance_from_whitened: X3-class whitening
    # can overshoot the prior by ~1e-5 near training points, and a negative
    # variance NaNs any downstream sqrt
    mean_var = sq[0] if reduced_rank else jnp.maximum(0.0, 1.0 - sq[0])
    gvar_prior = gradient_prior_variance(scale)
    grad_var = (sq[1:].T if reduced_rank
                else jnp.maximum(0.0, gvar_prior - sq[1:].T))
    sign = 1.0 if reduced_rank else -1.0
    covs = []
    for j in range(d):
        covs.append(sign * jnp.sum(cols[1 + j] * cols[0], axis=-1))
        for k in range(j):
            covs.append(sign * jnp.sum(cols[1 + j] * cols[1 + k], axis=-1))
    cov = jnp.stack(covs, axis=1) if covs else jnp.zeros((m, 0), at.dtype)
    return mean_var, grad_var, cov


@partial(jax.jit, static_argnames=("d", "reduced_rank"))
@f32_matmul
def nigp_variance_cov(state: NoisyInputGPState, ktest, scale, *, d: int,
                      reduced_rank: bool = False):
    """(mean_var (m,), grad_var (m, d), cov (m, d(d+1)/2)) from the whitened
    alpha_test = L⁻¹ ktest. cov rows follow the reference's lower-triangle
    order: [cov(g0,f), cov(g1,f), cov(g1,g0), cov(g2,f), ...]."""
    at = whiten(state.L, ktest)                    # (N, m(1+d))
    return _varcov_from_whitened(at, ktest, scale, d, reduced_rank)


@jax.jit
@f32_matmul
def nigp_l_inv(state: NoisyInputGPState):
    """Explicit L^{-1} over the joint system for the repeated-query serving
    path (same amortization as vanilla_l_inv: one inversion, then every
    later query batch whitens with an MXU GEMM instead of a triangular
    solve). The inversion routes through ``whiten``'s GEMM-block
    substitution on TPU (the n-RHS trsm is the widest solve there is)."""
    n = state.L.shape[0]
    return whiten(state.L, jnp.eye(n, dtype=state.L.dtype))


@partial(jax.jit, static_argnames=("d", "reduced_rank"))
@f32_matmul
def nigp_variance_cov_fast(L_inv, ktest, scale, *, d: int,
                           reduced_rank: bool = False):
    return _varcov_from_whitened(L_inv @ ktest, ktest, scale, d,
                                 reduced_rank)


class NigpTrainSet:
    """Mirror of NoisyInputGaussianProcess::TrainSet
    (noisy_input_gp.hpp:166-196): x (d, n), y (n, q), grad (d*q, n)
    output-major row blocks, var_x/var_y/var_grad (n,), grad_flag (n,).
    Held padded so a checkpointed model can rebuild the joint Ktrain and
    be retrained (reference Write/Read round-trips the full TrainSet,
    src/noisy_input_gp.cpp:952-1147)."""

    def __init__(self, xp, yp, gradp, vx, vy, vg, gmask, num_samples):
        self.xp, self.yp, self.gradp = xp, yp, gradp
        self.vx, self.vy, self.vg = vx, vy, vg
        self.gmask = gmask
        self.num_samples = int(num_samples)

    @property
    def x(self):
        return self.xp[:self.num_samples].T

    @property
    def y(self):
        return self.yp[:self.num_samples]

    @property
    def grad(self):
        n = self.num_samples
        _, d, q = self.gradp.shape
        # back to the reference layout: (d*q, n), output-major row blocks
        return self.gradp[:n].transpose(0, 2, 1).reshape(n, q * d).T

    @property
    def var_x(self):
        return self.vx[:self.num_samples]

    @property
    def var_y(self):
        return self.vy[:self.num_samples]

    @property
    def var_grad(self):
        return self.vg[:self.num_samples]

    @property
    def grad_flag(self):
        return self.gmask[:self.num_samples]

    @property
    def x_dim(self):
        return self.xp.shape[1]

    @property
    def y_dim(self):
        return self.yp.shape[1]

    @property
    def sample_mask(self):
        m = np.zeros((self.xp.shape[0],), bool)
        m[:self.num_samples] = True
        return m

    @property
    def num_samples_with_grad(self):
        """Count of samples carrying gradient observations (reference
        TrainSet.num_samples_with_grad, noisy_input_gp.hpp:166-196)."""
        return int(np.asarray(self.gmask).sum())


@dataclasses.dataclass
class NoisyInputGPSetting:
    """Mirror of NoisyInputGaussianProcess::Setting
    (noisy_input_gp.hpp; YAML codec src/noisy_input_gp.cpp:11-36)."""

    kernel_type: str = "rbf"
    kernel: KernelSetting = dataclasses.field(default_factory=KernelSetting)
    max_num_samples: int = 256
    no_gradient_observation: bool = False

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        d = dict(d or {})
        d.pop("kernel_setting_type", None)
        if "kernel" in d:
            rr = parse_reduced_rank_name(str(d.get("kernel_type", "")))
            kcls = ReducedRankSetting if rr is not None else KernelSetting
            d["kernel"] = kcls.from_dict(d["kernel"] or {})
            if rr:  # family named in kernel_type wins
                d["kernel"].base_kernel = rr
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class NigpTestResult:
    """Lazy TestResult mirroring the reference
    (noisy_input_gp.hpp TestResult; lazy whitening in PrepareAlphaTest,
    src/noisy_input_gp.cpp:363-375)."""

    def __init__(self, gp: "NoisyInputGaussianProcess", xq: np.ndarray,
                 will_predict_gradient: bool):
        self._gp = gp
        self._xq = xq
        self._with_grad = will_predict_gradient
        if gp._basis is not None:
            # reduced-rank: "Ktest" rows = #basis, columns in the same
            # query-major-then-dim-major joint layout (the shape contract
            # the reference threads through NIGP, noisy_input_gp.cpp:
            # 58-63 GetMinimumKtestSize with reduced-rank rows)
            b = gp._basis
            self._ktest = rr_ktest_joint(
                jnp.asarray(xq), b._freq, b._sqrt_s, b._origin, b._half,
                b._inv_sqrt_vol, with_test_grad=will_predict_gradient)
        else:
            self._ktest = nigp_ktest(
                gp.state, xq, gp._scale, kernel=gp._kernel,
                with_test_grad=will_predict_gradient,
                with_train_grad=not gp.setting.no_gradient_observation)
        self._varcov = None

    @property
    def num_test(self):
        return self._xq.shape[0]

    @property
    def k_test(self):
        return np.asarray(self._ktest)

    def get_mean(self, y_index: int = 0, parallel: bool = True):
        del parallel
        return np.asarray(
            nigp_mean(self._gp.state, self._ktest, self.num_test)[:, y_index])

    def get_gradient(self, y_index: int = 0, parallel: bool = True):
        del parallel
        assert self._with_grad, "TestResult built without gradient support"
        g = nigp_gradient(self._gp.state, self._ktest, self.num_test,
                          self._gp._x_dim)
        return np.asarray(g[:, :, y_index]).T  # (d, m) as in the reference

    def _prepare(self):
        if self._varcov is None:
            gp = self._gp
            d = gp._x_dim if self._with_grad else 0
            gp._var_queries += 1
            # the GEMM has 2x the flops of the trsm — it only wins while
            # the trsm is latency-bound on a thin RHS (measured v5e,
            # n_sys=7680: trsm 3072 cols beats the GEMM 12.6 vs 14.1 ms;
            # at <=512 cols the trsm chain is pure latency)
            if gp._var_queries >= 2 and self._ktest.shape[1] <= 512:
                # repeated-query serving path: amortized L^{-1} GEMM
                # whitening (see nigp_l_inv)
                if gp._L_inv is None:
                    gp._L_inv = nigp_l_inv(gp.state)
                self._varcov = nigp_variance_cov_fast(
                    gp._L_inv, self._ktest, gp._scale, d=d,
                    reduced_rank=gp.reduced_rank_kernel)
            else:
                self._varcov = nigp_variance_cov(
                    gp.state, self._ktest, gp._scale, d=d,
                    reduced_rank=gp.reduced_rank_kernel)
        return self._varcov

    def get_mean_variance(self, parallel: bool = True):
        del parallel
        return np.asarray(self._prepare()[0])

    def get_gradient_variance(self, parallel: bool = True):
        del parallel
        assert self._with_grad
        return np.asarray(self._prepare()[1]).T  # (d, m)

    def get_covariance(self, parallel: bool = True):
        """Lower-triangle covariances, (d(d+1)/2, m)."""
        del parallel
        assert self._with_grad
        return np.asarray(self._prepare()[2]).T


class NoisyInputGaussianProcess:
    """Stateful wrapper mirroring the reference binding API
    (python/binding/bind_noisy_input_gp.cpp). Reference layout: x (d, n),
    y (n, q), grad (d*q, n), var_* (n,), grad_flag (n,)."""

    Setting = NoisyInputGPSetting
    TestResult = NigpTestResult
    TrainSet = NigpTrainSet

    def __init__(self, setting: Optional[NoisyInputGPSetting] = None,
                 dtype=np.float64):
        self.setting = setting or NoisyInputGPSetting()
        self.dtype = np.dtype(dtype)
        from erl_gaussian_process_tpu.utils.timing import (
            warn_if_x64_disabled,
        )
        warn_if_x64_disabled(self.dtype)
        self.state: Optional[NoisyInputGPState] = None
        self._setup_kernel()
        self._trained = False
        self._x_dim = 0
        self._y_dim = 0
        self._L_inv = None
        self._var_queries = 0
        self._train_set: Optional[NigpTrainSet] = None

    def _setup_kernel(self):
        """Resolve the kernel family; reduced-rank kernel types build the
        stateful basis (the reference's BuildSpectralDensities-after-
        create/load contract, src/noisy_input_gp.cpp:1183-1184 + 1110-1112)."""
        from erl_gaussian_process_tpu.kernels import (
            resolve_kernel_setting,
            validate_kernel_setting,
        )
        self._scale = float(self.setting.kernel.scale)
        self._basis: Optional[ReducedRankBasis] = None
        rr_base = parse_reduced_rank_name(self.setting.kernel_type)
        if rr_base is not None:
            validate_kernel_setting(self.setting.kernel,
                                    "NoisyInputGaussianProcess")
            ks = self.setting.kernel
            if not isinstance(ks, ReducedRankSetting):
                ks = ReducedRankSetting.from_dict(ks.to_dict())
                self.setting.kernel = ks
            if rr_base:
                ks.base_kernel = rr_base
            self._basis = ReducedRankBasis(ks, dtype=self.dtype)
            self._kernel = ks.base_kernel
        else:
            self._kernel = resolve_kernel_setting(
                self.setting.kernel_type, self.setting.kernel,
                "NoisyInputGaussianProcess")
        self.reduced_rank_kernel = self._basis is not None

    # -- reduced-rank kernel surface (reference:
    # UsingReducedRankKernel / Get/SetKernelCoordOrigin,
    # src/noisy_input_gp.cpp:675-695) --------------------------------------
    def using_reduced_rank_kernel(self) -> bool:
        return self.reduced_rank_kernel

    def get_kernel_coord_origin(self):
        assert self._basis is not None, "not a reduced-rank kernel"
        return self._basis.coord_origin

    def set_kernel_coord_origin(self, origin):
        assert self._basis is not None, "not a reduced-rank kernel"
        self._basis.set_coord_origin(origin)

    @property
    def is_trained(self):
        return self._trained

    def get_train_set(self) -> Optional[NigpTrainSet]:
        return self._train_set

    # -- reference binding accessor surface (the pyi's property set,
    # python/erl_gaussian_process/pyerl_gaussian_process.pyi:204-224) ------
    @property
    def train_set(self) -> Optional[NigpTrainSet]:
        return self._train_set

    @property
    def kernel(self):
        """Kernel introspection (reference `kernel` property returns the
        Covariance object; here the setting object carries the same
        hyperparameters and the resolved family name)."""
        return self.setting.kernel

    @property
    def kernel_origin(self):
        """Reduced-rank coordinate origin (reference `kernel_origin`
        attribute, pyerl_gaussian_process.pyi:210)."""
        return self.get_kernel_coord_origin()

    @kernel_origin.setter
    def kernel_origin(self, origin):
        self.set_kernel_coord_origin(origin)

    @property
    def alpha(self):
        """Solved weights over the joint system (reference `alpha`
        property, src/noisy_input_gp.cpp accessor)."""
        return None if self.state is None else np.asarray(self.state.alpha)

    @property
    def cholesky_k_train(self):
        """Lower Cholesky factor of the joint train gram."""
        return None if self.state is None else np.asarray(self.state.L)

    @property
    def k_train(self):
        """The joint train gram that was factored (incl. observation noise
        and identity padding): reconstructed as L L^T from the stored
        factor, so it reflects exactly what the model solved against —
        including any host jitter escalation."""
        if self.state is None:
            return None
        L = np.asarray(self.state.L)
        return L @ L.T

    @property
    def memory_usage(self) -> int:
        return self.get_memory_usage()

    def update_ktrain(self) -> bool:
        """Recompute the joint gram/factor from the stored train set
        (reference UpdateKtrain, called after kernel-origin changes). The
        fused fit recomputes the solve along with the factor."""
        return self._fit_train_set()

    def reset(self, max_num_samples: int, x_dim: int, y_dim: int):
        """Reference Reset(max_num_samples, x_dim, y_dim) parity: size the
        padded buffers and drop the trained state (the stored train set
        survives, as its buffers do in the reference)."""
        self.setting.max_num_samples = int(max_num_samples)
        del x_dim, y_dim  # shapes are taken from the data at train()
        self._trained = False
        self.state = None
        self._L_inv = None
        self._var_queries = 0

    def _fit_train_set(self) -> bool:
        """C++ Train() body: joint gram + LLT from the stored TrainSet
        (src/noisy_input_gp.cpp:807-898), empty-data guarded."""
        import logging
        ts = self._train_set
        if ts is None or ts.num_samples <= 0:
            logging.getLogger("erl_gaussian_process_tpu").warning(
                "num_samples = %d, it should be > 0.",
                0 if ts is None else ts.num_samples)
            return False
        from erl_gaussian_process_tpu.models.gp_core import host_jitter_retry

        self._x_dim, self._y_dim = ts.x_dim, ts.y_dim
        xp, yp, smask = ts.xp, ts.yp, ts.sample_mask
        vx, vy, vg = ts.vx, ts.vy, ts.vg
        b = self._basis
        if self.setting.no_gradient_observation:
            if b is not None:
                self.state = host_jitter_retry(
                    lambda j: nigp_rr_fit_nograd(
                        jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(vx),
                        jnp.asarray(vy + self.dtype.type(j)),
                        jnp.asarray(smask), b._freq, b._sqrt_s, b._origin,
                        b._half, b._inv_sqrt_vol),
                    lambda st: (st.alpha,))
            else:
                self.state = host_jitter_retry(
                    lambda j: nigp_fit_nograd(
                        xp, yp, vx, vy + self.dtype.type(j), smask,
                        self.dtype.type(self._scale), kernel=self._kernel),
                    lambda st: (st.alpha,))
        elif b is not None:
            self.state = host_jitter_retry(
                lambda j: nigp_rr_fit(
                    jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(ts.gradp),
                    jnp.asarray(vx), jnp.asarray(vy + self.dtype.type(j)),
                    jnp.asarray(vg + self.dtype.type(j)),
                    jnp.asarray(smask), jnp.asarray(ts.gmask),
                    b._freq, b._sqrt_s, b._origin, b._half, b._inv_sqrt_vol),
                lambda st: (st.alpha,))
        else:
            self.state = host_jitter_retry(
                lambda j: nigp_fit(
                    xp, yp, ts.gradp, vx, vy + self.dtype.type(j),
                    vg + self.dtype.type(j), smask, ts.gmask,
                    self.dtype.type(self._scale), kernel=self._kernel),
                lambda st: (st.alpha,))
        self._trained = True
        self._L_inv = None
        self._var_queries = 0
        return True

    def train(self, mat_x=None, mat_y=None, mat_grad=None, var_x=None,
              var_y=None, var_grad=None, grad_flag=None) -> bool:
        """``train()`` with no arguments is the C++ ``Train()``
        (already-trained → warn + False, src/noisy_input_gp.cpp:879-884;
        empty train set → warn + False); ``train(x, y, ...)`` is the
        binding path (reset + store + Train). x: (d, n); y: (n, q) or
        (n,); grad: (d*q, n) per the reference's TrainSet.grad layout
        (output-major row blocks of size d)."""
        if mat_x is None:
            import logging
            if self._trained:
                logging.getLogger("erl_gaussian_process_tpu").warning(
                    "The model has been trained. Please reset the model "
                    "before training.")
                return False
            return self._fit_train_set()

        x = np.asarray(mat_x, self.dtype)
        if x.ndim == 1:
            x = x[None, :]
        d, n = x.shape
        y = np.asarray(mat_y, self.dtype)
        if y.ndim == 1:
            y = y[:, None]
        q = y.shape[1]
        nmax = max(self.setting.max_num_samples, max(n, 1))
        if self.dtype == np.float32 and nmax >= 256:
            # pad the sample budget to a multiple of 128 so the joint system
            # size nmax(1+d) is 128-aligned and the large-fit Pallas solve
            # (ops/pallas_trsv.py) applies; padded rows are masked and the
            # gram gives them identity rows, so posteriors are unchanged
            nmax = -(-nmax // 128) * 128
        self.reset(nmax, d, q)
        self._x_dim, self._y_dim = d, q

        def padv(v, fill=0.0):
            out = np.full((nmax,), fill, self.dtype)
            if v is not None:
                out[:n] = np.broadcast_to(np.asarray(v, self.dtype), (n,))
            return out

        xp = np.zeros((nmax, d), self.dtype)
        xp[:n] = x.T
        yp = np.zeros((nmax, q), self.dtype)
        yp[:n] = y
        vx, vy, vg = padv(var_x), padv(var_y), padv(var_grad)
        gmask = np.zeros((nmax,), bool)
        gp_ = np.zeros((nmax, d, q), self.dtype)
        if not self.setting.no_gradient_observation:
            if grad_flag is None:
                gmask[:n] = True
            else:
                gmask[:n] = np.asarray(grad_flag).astype(bool)[:n]
            if mat_grad is not None:
                g = np.asarray(mat_grad, self.dtype)
                if g.ndim == 1:
                    g = g[None, :]
                # reference grad layout: rows d*q, col per sample
                gp_[:n] = g.T.reshape(n, q, d).transpose(0, 2, 1)
        self._train_set = NigpTrainSet(xp, yp, gp_, vx, vy, vg, gmask, n)
        return self._fit_train_set()

    def test(self, mat_x_test, predict_gradient: bool = False
             ) -> Optional[NigpTestResult]:
        if not self._trained:
            return None
        xq = np.asarray(mat_x_test, self.dtype)
        if xq.ndim == 1:
            xq = xq[None, :]
        return NigpTestResult(self, np.ascontiguousarray(xq.T),
                              predict_gradient)

    # -- checkpoint --------------------------------------------------------
    def get_memory_usage(self) -> int:
        """Bytes held by model arrays (reference GetMemoryUsage
        introspection, SURVEY.md §5.5)."""
        from erl_gaussian_process_tpu.utils.timing import memory_usage
        return memory_usage(self.state)

    def state_dict(self):
        ts = self._train_set
        return {
            "setting": self.setting.to_dict(),
            "trained": self._trained,
            "x_dim": self._x_dim,
            "y_dim": self._y_dim,
            "state": None if self.state is None else self.state._asdict(),
            "train_set": None if ts is None else {
                "x": ts.xp, "y": ts.yp, "grad": ts.gradp,
                "var_x": ts.vx, "var_y": ts.vy, "var_grad": ts.vg,
                "grad_flag": ts.gmask, "num_samples": ts.num_samples},
        }

    def load_state_dict(self, dd):
        self.setting = NoisyInputGPSetting.from_dict(dd["setting"])
        self._setup_kernel()
        self._trained = bool(dd["trained"])
        self._x_dim = int(dd["x_dim"])
        self._y_dim = int(dd["y_dim"])
        s = dd["state"]
        self.state = None if s is None else NoisyInputGPState(
            **{k: jnp.asarray(v) for k, v in s.items()})
        ts = dd.get("train_set")
        self._train_set = None if ts is None else NigpTrainSet(
            np.asarray(ts["x"]), np.asarray(ts["y"]), np.asarray(ts["grad"]),
            np.asarray(ts["var_x"]), np.asarray(ts["var_y"]),
            np.asarray(ts["var_grad"]), np.asarray(ts["grad_flag"]),
            int(ts["num_samples"]))
        self._L_inv = None
        self._var_queries = 0

    def save(self, path):
        save_pytree(path, self.state_dict())

    def load(self, path):
        self.load_state_dict(load_pytree(path))

    def __eq__(self, other):
        if not isinstance(other, NoisyInputGaussianProcess):
            return NotImplemented
        return eq_state(self.state_dict(), other.state_dict())
