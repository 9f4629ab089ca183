"""Batched bank of small exact GPs — the central TPU-native design.

Replaces BOTH of the reference's parallel paths with one vmapped batch:
- the OpenMP loops over sensor partitions (src/lidar_gp_2d.cpp:366-392,
  src/range_sensor_gp_3d.cpp:334-360), and
- the libtorch batched-CUDA Cholesky (BatchGaussianProcessUpdateTorch,
  src/batch_gp_update_torch.cpp:44-98).

Each bank member is a padded fixed-size GP; padding uses the identity-diagonal
trick (gram diag 1 / alpha 0 outside the mask) carried over from the
reference's GPU batch path (src/batch_gp_update_torch.cpp:60-67), so one
batched Cholesky over (B, n, n) on the MXU trains the whole bank.

For multi-chip scale-out, shard the leading B axis over a mesh
(see parallel/mesh.py) — members are independent, so no collectives are
needed for fit/predict.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from erl_gaussian_process_tpu.kernels import cross_gram, train_gram
from erl_gaussian_process_tpu.models.gp_core import cholesky_fit, f32_matmul, whiten
from erl_gaussian_process_tpu.ops.pallas_bank import (
    bank_cholesky_solve_fused,
    bank_fit_fused,
    pallas_bank_enabled,
)


class BankState(NamedTuple):
    """x (B, n, d); mask (B, n) bool; L (B, n, n); alpha (B, n, q);
    trained (B,) bool (bank member has >= 1 sample); L_inv (B, n, n) when
    the bank was fit by the fused Pallas kernel (ops/pallas_bank.py), which
    emits L^{-1} as a by-product — predicts then whiten with a GEMM instead
    of a batched triangular solve."""

    x: jnp.ndarray
    mask: jnp.ndarray
    L: jnp.ndarray
    alpha: jnp.ndarray
    trained: jnp.ndarray
    L_inv: Optional[jnp.ndarray] = None


def _fit_one(x, y, var, mask, scale, kernel):
    y = jnp.where(mask[:, None], y, 0.0)
    K = train_gram(kernel, x, jnp.where(mask, var, 0.0), scale, mask=mask)
    L, alpha = cholesky_fit(K, y)
    return L, alpha


@partial(jax.jit, static_argnames=("kernel",))
@f32_matmul
def _bank_fit_xla(x, y, var, mask, scale, *, kernel: str) -> BankState:
    L, alpha = jax.vmap(_fit_one, in_axes=(0, 0, 0, 0, None, None))(
        x, y, var, mask, scale, kernel)
    return BankState(x=x, mask=mask, L=L, alpha=alpha,
                     trained=jnp.any(mask, axis=1))


def bank_fit(x, y, var, mask, scale, *, kernel: str) -> BankState:
    """Train B GPs at once. x (B, n, d); y (B, n, q); var/mask (B, n).

    On TPU/float32 with n > 96 this runs the single fused Pallas kernel
    (gram + batched Cholesky + L^{-1}, ops/pallas_bank.py — measured 5.6x
    over the XLA chain at B=1024 n=128 on v5e) and the returned state
    carries ``L_inv``; otherwise the vmapped jnp path (small n stays there:
    below ~n=96 the kernel's pad-to-128 waste exceeds XLA's latency)."""
    n, d = x.shape[1], x.shape[2]
    if n > 96 and pallas_bank_enabled(x.dtype, -(-n // 128) * 128, d):
        L, L_inv, alpha = bank_fit_fused(kernel, x, y, var, mask, scale)
        return BankState(x=x, mask=mask, L=L, alpha=alpha,
                         trained=jnp.any(mask, axis=1), L_inv=L_inv)
    return _bank_fit_xla(x, y, var, mask, scale, kernel=kernel)


@partial(jax.jit, static_argnames=("kernel", "reduced_rank"))
@f32_matmul
def bank_predict(state: BankState, xq, scale, *, kernel: str,
                 reduced_rank: bool = False):
    """Each bank member predicts its own queries. xq (B, m, d).
    Returns mean (B, m, q), var (B, m)."""

    def one(x, mask, W, alpha, q):
        kt = cross_gram(kernel, x, q, scale, mask1=mask)
        mean = kt.T @ alpha
        # W is L^{-1} (GEMM whitening) when the fused fit provided it,
        # else L (triangular solve)
        at = W @ kt if state.L_inv is not None else whiten(W, kt)
        s = jnp.sum(at * at, axis=0)
        return mean, (s if reduced_rank else 1.0 - s)

    W = state.L_inv if state.L_inv is not None else state.L
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
        state.x, state.mask, W, state.alpha, xq)


@partial(jax.jit, static_argnames=("kernel", "reduced_rank"))
@f32_matmul
def bank_predict_assigned(state: BankState, q, idx, scale, *, kernel: str,
                          reduced_rank: bool = False):
    """Per-query routed prediction: query j is answered by bank member
    idx[j] (the partition-search pattern of the reference's lidar/3D test
    paths, src/lidar_gp_2d.cpp:68-87). q (m, d); idx (m,) int32 (may be -1
    for unresolved queries — result flagged invalid).

    Returns (mean (m, q_dim), var (m,), valid (m,) bool).
    """
    safe = jnp.clip(idx, 0, state.x.shape[0] - 1)
    xs = state.x[safe]            # (m, n, d)
    ms = state.mask[safe]         # (m, n)
    fused = state.L_inv is not None
    Ls = (state.L_inv if fused else state.L)[safe]   # (m, n, n)
    als = state.alpha[safe]       # (m, n, q_dim)

    def one(x, mask, W, alpha, qj):
        kt = cross_gram(kernel, x, qj[None, :], scale, mask1=mask)  # (n, 1)
        mean = (kt.T @ alpha)[0]
        at = W @ kt if fused else whiten(W, kt)
        s = jnp.sum(at * at)
        var = s if reduced_rank else 1.0 - s
        return mean, var

    mean, var = jax.vmap(one)(xs, ms, Ls, als, q)
    valid = (idx >= 0) & state.trained[safe]
    return mean, var, valid


class BatchGPBank:
    """API-parity replacement for the reference's
    BatchGaussianProcessUpdateTorch (batch_gp_update_torch.hpp:15-80):
    collect B (gram, alpha) problems, solve them in one batched device
    Cholesky, and read back per-GP (L, alpha). Here the "device" path is one
    jitted batched call — no explicit host↔device staging is needed.
    """

    def __init__(self, batch_size: int, max_num_samples: int, y_dim: int = 1,
                 dtype=np.float32):
        self.B = batch_size
        self.n = max_num_samples
        self.q = y_dim
        self.dtype = np.dtype(dtype)
        self.prepare_memory()

    def prepare_memory(self):
        eye = np.eye(self.n, dtype=self.dtype)
        self._K = np.tile(eye, (self.B, 1, 1))
        self._alpha = np.zeros((self.B, self.n, self.q), self.dtype)
        self._L = None

    def load_gp_data(self, i: int, size: int, ktrain, alpha):
        """Pad GP i's (size, size) gram into slot i (identity beyond size,
        matching src/batch_gp_update_torch.cpp:44-70)."""
        self._K[i] = np.eye(self.n, dtype=self.dtype)
        self._K[i, :size, :size] = np.asarray(ktrain, self.dtype)[:size, :size]
        self._alpha[i] = 0.0
        a = np.asarray(alpha, self.dtype)
        if a.ndim == 1:
            a = a[:, None]
        self._alpha[i, :size, :a.shape[1]] = a[:size]

    def solve(self):
        if pallas_bank_enabled(self.dtype, -(-self.n // 128) * 128):
            L, _, alpha = bank_cholesky_solve_fused(
                jnp.asarray(self._K), jnp.asarray(self._alpha))
        else:
            L, alpha = _batched_cholesky_solve(
                jnp.asarray(self._K), jnp.asarray(self._alpha))
        self._L = np.asarray(L)
        self._alpha = np.asarray(alpha)

    def get_gp_result(self, i: int):
        """Returns (L_i, alpha_i). (The reference's GetGpResult copies in the
        wrong direction — memcpy into the tensor, batch_gp_update_torch.cpp:
        84-98; we return the solved values, which is the intended behavior.)"""
        return self._L[i], self._alpha[i]


@jax.jit
@f32_matmul
def _batched_cholesky_solve(K, alpha):
    return jax.vmap(cholesky_fit)(K, alpha)
