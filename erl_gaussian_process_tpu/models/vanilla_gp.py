"""Exact multi-output GP regression (reference: VanillaGaussianProcess,
include/erl_gaussian_process/vanilla_gp.hpp, src/vanilla_gp.cpp).

Functional core: ``vanilla_fit`` / ``vanilla_ktest`` / mean / variance — pure,
jittable, and vmappable (the whole class of "many small GPs" workloads runs
these under ``vmap``, see models/batch_gp.py). The ``VanillaGaussianProcess``
class mirrors the reference's Python API (train/test/TestResult,
python/binding/bind_vanilla_gp.cpp) over padded fixed-shape buffers.
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
    cross_gram,
    resolve_kernel_name,
    train_gram,
)
from erl_gaussian_process_tpu.kernels.reduced_rank import (
    ReducedRankBasis,
    ReducedRankSetting,
    parse_reduced_rank_name,
    rr_features,
    rr_train_system,
)
from erl_gaussian_process_tpu.models.gp_core import (
    cholesky_fit,
    f32_matmul,
    mean_from_ktest,
    variance_from_whitened,
    whiten,
)
from erl_gaussian_process_tpu.utils.serialization import (
    eq_state,
    load_pytree,
    save_pytree,
)


class VanillaGPState(NamedTuple):
    """Trained-GP pytree. Shapes are static (padded to max_num_samples):
    x (n, d), mask (n,) bool, L (n, n), alpha (n, y_dim)."""

    x: jnp.ndarray
    mask: jnp.ndarray
    L: jnp.ndarray
    alpha: jnp.ndarray


@partial(jax.jit, static_argnames=("kernel",))
@f32_matmul
def vanilla_fit(x, y, var, mask, scale, *, kernel: str) -> VanillaGPState:
    """Train: gram + noise diag (identity-padded) -> Cholesky -> alpha.

    x: (n, d); y: (n, y_dim); var: (n,); mask: (n,) bool.
    Mirrors Train() = UpdateKtrain + Solve (src/vanilla_gp.cpp:478-519).
    """
    from erl_gaussian_process_tpu.models.gp_core import solve_with_L
    from erl_gaussian_process_tpu.ops.pallas_chol import (
        chol_blocked_gram,
        pallas_chol_gram_enabled,
    )

    y = jnp.where(mask[:, None], y, 0.0)
    if pallas_chol_gram_enabled(x.dtype, x.shape[0], kernel, x.shape[1]):
        # gram-fused streaming factorization: the (n, n) train gram is
        # built tile-by-tile inside the Cholesky kernel and never
        # round-trips through HBM (ops/pallas_chol.py); the kernel's free
        # diagonal-block inverses spare the solve its batched-trsm prep
        L, dinv = chol_blocked_gram(kernel, x, var, mask, scale,
                                    return_dinv=True)
        alpha = solve_with_L(L, y, chol_dinv=dinv)
        return VanillaGPState(x=x, mask=mask, L=L, alpha=alpha)
    K = train_gram(kernel, x, jnp.where(mask, var, 0.0), scale, mask=mask)
    # robust=False: single big system — NaN retry happens on the host
    # (class train()); in-jit retry costs 2-3x the chol itself (gp_core)
    L, alpha = cholesky_fit(K, y, robust=False)
    return VanillaGPState(x=x, mask=mask, L=L, alpha=alpha)


@partial(jax.jit, static_argnames=("kernel",))
def vanilla_ktest(state: VanillaGPState, xq, scale, *, kernel: str):
    """Cross gram (n, m); masked train rows zeroed
    (ComputeKtest, src/vanilla_gp.cpp:523-552)."""
    return cross_gram(kernel, state.x, xq, scale, mask1=state.mask)


@jax.jit
@f32_matmul
def vanilla_mean(state: VanillaGPState, ktest):
    return mean_from_ktest(ktest, state.alpha)


@partial(jax.jit, static_argnames=("reduced_rank",))
@f32_matmul
def vanilla_variance(state: VanillaGPState, ktest, *, reduced_rank=False):
    return variance_from_whitened(whiten(state.L, ktest), reduced_rank)


@jax.jit
@f32_matmul
def vanilla_l_inv(state: VanillaGPState):
    """Explicit L^{-1} for the repeated-query serving path: computed once
    (lazily, from the second variance query on), every later query batch
    whitens with a GEMM instead of a triangular solve — TPUs run trsm
    several times below matmul throughput. The inversion itself is the
    widest possible solve (n RHS), so it goes through ``whiten``'s
    GEMM-block substitution on TPU."""
    n = state.L.shape[0]
    return whiten(state.L, jnp.eye(n, dtype=state.L.dtype))


@partial(jax.jit, static_argnames=("reduced_rank",))
@f32_matmul
def vanilla_variance_fast(L_inv, ktest, *, reduced_rank=False):
    return variance_from_whitened(L_inv @ ktest, reduced_rank)


@partial(jax.jit, static_argnames=("kernel", "reduced_rank"))
@f32_matmul
def vanilla_predict(state: VanillaGPState, xq, scale, *, kernel: str,
                    reduced_rank: bool = False):
    """Fused mean+variance in one jit for the common full query path."""
    ktest = cross_gram(kernel, state.x, xq, scale, mask1=state.mask)
    mean = mean_from_ktest(ktest, state.alpha)
    var = variance_from_whitened(whiten(state.L, ktest), reduced_rank)
    return mean, var


@jax.jit
@f32_matmul
def rr_fit(x, y, var, mask, freq, sqrt_s, origin, half, inv_sqrt_vol
           ) -> VanillaGPState:
    """Reduced-rank train: features -> (m, m) information matrix -> Cholesky.
    The returned state's L is (m, m) and alpha (m, y_dim) — "Ktrain rows =
    #basis functions" per the reference's reduced-rank shape contract
    (src/vanilla_gp.cpp:804)."""
    phi = rr_features(x, mask, freq, sqrt_s, origin, half, inv_sqrt_vol)
    A, b = rr_train_system(phi, y, var, mask)
    L, alpha = cholesky_fit(A, b, robust=False)
    return VanillaGPState(x=x, mask=mask, L=L, alpha=alpha)


class VanillaTrainSet:
    """Mirror of VanillaGaussianProcess::TrainSet (vanilla_gp.hpp; bound
    fields bind_vanilla_gp.cpp:66-72): ``x`` (x_dim, n) column-major,
    ``y`` (n, y_dim), ``var`` (n,). Held as padded host arrays so the
    model can rebuild Ktrain / be retrained from a checkpoint (the
    reference serializes the full TrainSet, src/vanilla_gp.cpp:606-790)."""

    def __init__(self, xp: np.ndarray, yp: np.ndarray, vp: np.ndarray,
                 num_samples: int):
        self.xp, self.yp, self.vp = xp, yp, vp
        self.num_samples = int(num_samples)

    @property
    def x(self):
        return self.xp[:self.num_samples].T

    @property
    def y(self):
        return self.yp[:self.num_samples]

    @property
    def var(self):
        return self.vp[:self.num_samples]

    @property
    def x_dim(self):
        return self.xp.shape[1]

    @property
    def y_dim(self):
        return self.yp.shape[1]

    @property
    def mask(self):
        m = np.zeros((self.xp.shape[0],), bool)
        m[:self.num_samples] = True
        return m


@dataclasses.dataclass
class VanillaGPSetting:
    """Mirror of VanillaGaussianProcess::Setting (vanilla_gp.hpp:23-37)."""

    kernel_type: str = "rbf"
    kernel: KernelSetting = dataclasses.field(default_factory=KernelSetting)
    max_num_samples: int = 256

    def to_dict(self):
        d = dataclasses.asdict(self)
        return d

    @classmethod
    def from_dict(cls, d):
        d = dict(d or {})
        d.pop("kernel_setting_type", None)  # reference YAML field, implied here
        if "kernel" in d:
            rr = parse_reduced_rank_name(str(d.get("kernel_type", "")))
            raw = d["kernel"] or {}
            kcls = ReducedRankSetting if rr is not None else KernelSetting
            d["kernel"] = kcls.from_dict(raw)
            if rr:  # family named in kernel_type wins
                d["kernel"].base_kernel = rr
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class VanillaTestResult:
    """Lazy test-result wrapper (reference TestResult pattern,
    vanilla_gp.hpp:39-75): ktest computed at construction, the whitening
    solve deferred to the first variance query."""

    def __init__(self, gp: "VanillaGaussianProcess", xq: np.ndarray):
        self._gp = gp
        self._xq = xq
        if gp._basis is not None:
            # reduced-rank: "Ktest" is the whitened feature matrix with
            # rows = #basis functions (reference shape contract,
            # src/vanilla_gp.cpp:804)
            self._ktest = gp._basis.features(jnp.asarray(xq)).T
        else:
            self._ktest = vanilla_ktest(
                gp.state, xq, gp._scale, kernel=gp._kernel
            )
        self._mean = None
        self._var = None

    @property
    def num_test(self):
        return self._xq.shape[0]

    @property
    def k_test(self):
        return np.asarray(self._ktest)

    def get_mean(self, y_index: int = 0, parallel: bool = True):
        del parallel  # XLA parallelizes; kept for API parity
        if self._mean is None:
            self._mean = vanilla_mean(self._gp.state, self._ktest)
        return np.asarray(self._mean[:, y_index])

    def get_variance(self, parallel: bool = True):
        del parallel
        if self._var is None:
            gp = self._gp
            gp._var_queries += 1
            # GEMM whitening only beats the trsm while the RHS is thin
            # (2x flops; see NigpTestResult._prepare for measurements)
            if gp._var_queries >= 2 and self._ktest.shape[1] <= 512:
                # repeated-query serving path: amortized L^{-1} GEMM
                if gp._L_inv is None:
                    gp._L_inv = vanilla_l_inv(gp.state)
                self._var = vanilla_variance_fast(
                    gp._L_inv, self._ktest,
                    reduced_rank=gp.reduced_rank_kernel)
            else:
                self._var = vanilla_variance(
                    gp.state, self._ktest,
                    reduced_rank=gp.reduced_rank_kernel,
                )
        return np.asarray(self._var)


class VanillaGaussianProcess:
    """Stateful convenience wrapper mirroring the reference class/binding API.

    Inputs follow the reference layout: ``x`` is (x_dim, n) column-major,
    ``y`` is (n, y_dim), ``var`` is (n,).
    """

    Setting = VanillaGPSetting
    TestResult = VanillaTestResult
    TrainSet = VanillaTrainSet

    def __init__(self, setting: Optional[VanillaGPSetting] = None,
                 dtype=np.float64):
        self.setting = setting or VanillaGPSetting()
        self.dtype = np.dtype(dtype)
        from erl_gaussian_process_tpu.utils.timing import (
            warn_if_x64_disabled,
        )
        warn_if_x64_disabled(self.dtype)
        self.state: Optional[VanillaGPState] = None
        self._setup_kernel()
        self._trained = False
        self._n = 0
        self._x_dim = 0
        self._y_dim = 0
        self._L_inv = None
        self._var_queries = 0
        self._train_set: Optional[VanillaTrainSet] = None

    def _setup_kernel(self):
        """Resolve the kernel family; for reduced-rank kernel types build the
        stateful basis, like the reference's BuildSpectralDensities after
        create/load (src/vanilla_gp.cpp:828, :757)."""
        from erl_gaussian_process_tpu.kernels import (
            resolve_kernel_setting,
            validate_kernel_setting,
        )
        self._scale = float(self.setting.kernel.scale)
        self._basis: Optional[ReducedRankBasis] = None
        rr_base = parse_reduced_rank_name(self.setting.kernel_type)
        if rr_base is not None:
            validate_kernel_setting(self.setting.kernel,
                                    "VanillaGaussianProcess")
            ks = self.setting.kernel
            if not isinstance(ks, ReducedRankSetting):
                ks = ReducedRankSetting.from_dict(ks.to_dict())
                self.setting.kernel = ks
            if rr_base:  # family named in kernel_type wins over the default
                ks.base_kernel = rr_base
            self._basis = ReducedRankBasis(ks, dtype=self.dtype)
            self._kernel = ks.base_kernel
        else:
            self._kernel = resolve_kernel_setting(
                self.setting.kernel_type, self.setting.kernel,
                "VanillaGaussianProcess")
        self.reduced_rank_kernel = self._basis is not None

    # -- reduced-rank coord origin (reference: vanilla_gp.cpp:358-374) -----
    def get_coord_origin(self):
        assert self._basis is not None, "not a reduced-rank kernel"
        return self._basis.coord_origin

    def set_coord_origin(self, origin):
        assert self._basis is not None, "not a reduced-rank kernel"
        self._basis.set_coord_origin(origin)

    # -- reference API ---------------------------------------------------
    @property
    def is_trained(self) -> bool:
        return self._trained

    def get_train_set(self) -> Optional[VanillaTrainSet]:
        """Reference GetTrainSet (the binding fills this then calls Train,
        bind_vanilla_gp.cpp:88-96)."""
        return self._train_set

    def reset(self, max_num_samples: int, x_dim: int, y_dim: int):
        """Reference Reset: size buffers and clear the trained flag. The
        stored train set survives (the reference keeps its buffers; Reset
        is what re-arms Train after the already-trained guard)."""
        self.setting.max_num_samples = int(max_num_samples)
        self._x_dim, self._y_dim = int(x_dim), int(y_dim)
        self._n = 0
        self._trained = False
        self.state = None
        self._L_inv = None
        self._var_queries = 0

    def _fit_train_set(self) -> bool:
        """The C++ Train() body: fit from the stored TrainSet
        (UpdateKtrain + Solve, src/vanilla_gp.cpp:478-519), with the
        empty-data guard (:481-484)."""
        import logging
        ts = self._train_set
        if ts is None or ts.num_samples <= 0:
            logging.getLogger("erl_gaussian_process_tpu").warning(
                "num_samples = %d, it should be > 0.",
                0 if ts is None else ts.num_samples)
            return False
        from erl_gaussian_process_tpu.models.gp_core import host_jitter_retry

        xp, yp, vp, mask = ts.xp, ts.yp, ts.vp, ts.mask
        if self._basis is not None:
            b = self._basis
            self.state = host_jitter_retry(
                lambda j: rr_fit(
                    jnp.asarray(xp), jnp.asarray(yp),
                    jnp.asarray(vp + self.dtype.type(j)),
                    jnp.asarray(mask), b._freq, b._sqrt_s, b._origin,
                    b._half, b._inv_sqrt_vol),
                lambda st: (st.alpha,))
        else:
            self.state = host_jitter_retry(
                lambda j: vanilla_fit(
                    xp, yp, vp + self.dtype.type(j), mask,
                    self.dtype.type(self._scale), kernel=self._kernel),
                lambda st: (st.alpha,))
        self._n = ts.num_samples
        self._trained = True
        self._L_inv = None
        self._var_queries = 0
        return True

    def train(self, mat_x_train=None, mat_y_train=None, vec_var_y=None
              ) -> bool:
        """Two reference-parity layers in one entry point:

        - ``train()`` with NO arguments is the C++ ``Train()``
          (src/vanilla_gp.cpp:509-519): refuses with a warning when
          already trained (call ``reset`` first) or when the stored
          train set is empty, else fits from the stored train set.
        - ``train(x, y, var)`` is the pybind binding's ``train``
          (bind_vanilla_gp.cpp:80-97): resets, stores the data as the
          train set, then runs Train(). x: (x_dim, n); y: (n, y_dim) or
          (n,); var: (n,) or scalar.
        """
        if mat_x_train is None:
            import logging
            if self._trained:
                logging.getLogger("erl_gaussian_process_tpu").warning(
                    "The model has been trained. Please reset the model "
                    "before training.")
                return False
            return self._fit_train_set()

        x = np.asarray(mat_x_train, dtype=self.dtype)
        if x.ndim == 1:
            x = x[None, :]
        y = np.asarray(mat_y_train, dtype=self.dtype)
        if y.ndim == 1:
            y = y[:, None]
        n = x.shape[1]
        var = np.broadcast_to(
            np.asarray(vec_var_y, dtype=self.dtype), (n,))
        self.reset(max(self.setting.max_num_samples, max(n, 1)),
                   x.shape[0], y.shape[1])
        nmax = self.setting.max_num_samples

        xp = np.zeros((nmax, x.shape[0]), self.dtype)
        xp[:n] = x.T
        yp = np.zeros((nmax, y.shape[1]), self.dtype)
        yp[:n] = y
        vp = np.zeros((nmax,), self.dtype)
        vp[:n] = var
        self._train_set = VanillaTrainSet(xp, yp, vp, n)
        return self._fit_train_set()

    def test(self, mat_x_test) -> Optional[VanillaTestResult]:
        """x: (x_dim, m) column-major (or (m,) for 1-D inputs)."""
        if not self._trained:
            return None
        xq = np.asarray(mat_x_test, dtype=self.dtype)
        if xq.ndim == 1:
            xq = xq[None, :]
        return VanillaTestResult(self, np.ascontiguousarray(xq.T))

    def get_memory_usage(self) -> int:
        """Bytes held by model arrays (reference GetMemoryUsage,
        src/vanilla_gp.cpp:463-474)."""
        from erl_gaussian_process_tpu.utils.timing import memory_usage
        return memory_usage(self.state)

    # -- checkpoint (reference Write/Read, src/vanilla_gp.cpp:606-790;
    # the reference round-trips the FULL TrainSet so a loaded model can
    # rebuild Ktrain / be retrained, :640-668) -----------------------------
    def state_dict(self) -> dict:
        ts = self._train_set
        return {
            "setting": self.setting.to_dict(),
            "trained": self._trained,
            "n": self._n,
            "x_dim": self._x_dim,
            "y_dim": self._y_dim,
            "state": None if self.state is None else self.state._asdict(),
            "train_set": None if ts is None else {
                "x": ts.xp, "y": ts.yp, "var": ts.vp,
                "num_samples": ts.num_samples},
        }

    def load_state_dict(self, d: dict):
        self.setting = VanillaGPSetting.from_dict(d["setting"])
        self._setup_kernel()
        self._L_inv = None
        self._var_queries = 0
        self._trained = bool(d["trained"])
        self._n = int(d["n"])
        self._x_dim = int(d["x_dim"])
        self._y_dim = int(d["y_dim"])
        s = d["state"]
        self.state = None if s is None else VanillaGPState(
            x=jnp.asarray(s["x"]), mask=jnp.asarray(s["mask"]),
            L=jnp.asarray(s["L"]), alpha=jnp.asarray(s["alpha"]))
        ts = d.get("train_set")
        self._train_set = None if ts is None else VanillaTrainSet(
            np.asarray(ts["x"]), np.asarray(ts["y"]), np.asarray(ts["var"]),
            int(ts["num_samples"]))

    def save(self, path: str):
        save_pytree(path, self.state_dict())

    def load(self, path: str):
        self.load_state_dict(load_pytree(path))

    def __eq__(self, other):
        if not isinstance(other, VanillaGaussianProcess):
            return NotImplemented
        return eq_state(self.state_dict(), other.state_dict())
