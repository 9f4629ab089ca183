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

import time
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
    pallas_bank_applies,
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


def bank_fit_core(x, y, var, mask, scale, *, kernel: str,
                  use_pallas: bool) -> BankState:
    """Traced (jit-inlineable) bank-fit core — the ONE implementation of
    the Pallas-vs-XLA dispatch, shared by :func:`bank_fit` and the fused
    scan trains (models/lidar_gp_2d, models/range_sensor_gp_3d) so the
    two can never drift. ``use_pallas`` is resolved by the caller via
    :func:`ops.pallas_bank.pallas_bank_applies` (it consults the runtime
    backend, which must not be read under a trace)."""
    if use_pallas:
        L, L_inv, alpha = bank_fit_fused(kernel, x, y, var, mask, scale)
        return BankState(x=x, mask=mask, L=L, alpha=alpha,
                         trained=jnp.any(mask, axis=1), L_inv=L_inv)
    return _bank_fit_xla(x, y, var, mask, scale, kernel=kernel)


def bank_fit(x, y, var, mask, scale, *, kernel: str) -> BankState:
    """Train B GPs at once. x (B, n, d); y (B, n, q); var/mask (B, n).

    On TPU/float32 with n > 96 this runs the single fused Pallas kernel
    (gram + batched Cholesky + L^{-1}, ops/pallas_bank.py — measured 5.6x
    over the XLA chain at B=1024 n=128 on v5e) and the returned state
    carries ``L_inv``; otherwise the vmapped jnp path (small n stays there:
    below ~n=96 the kernel's pad-to-128 waste exceeds XLA's latency)."""
    n, d = x.shape[1], x.shape[2]
    return bank_fit_core(x, y, var, mask, scale, kernel=kernel,
                         use_pallas=pallas_bank_applies(x.dtype, n, d))


def bank_fit_rr_core(x, y, var, mask, freq, sqrt_s, origin, half,
                     inv_sqrt_vol) -> BankState:
    """Traced RR bank-fit core (per-partition Hilbert-basis information
    systems; f32_matmul applied inside) — the ONE implementation shared by
    :func:`bank_fit_rr` and the fused scan trains, so a numerical change
    here reaches every path."""
    from erl_gaussian_process_tpu.kernels.reduced_rank import (
        rr_features,
        rr_train_system,
    )

    @f32_matmul
    def fit(x, y, var, mask):
        def fit_one(xb, yb, vb, mb):
            phi = rr_features(xb, mb, freq, sqrt_s, origin, half,
                              inv_sqrt_vol)
            A, bv = rr_train_system(phi, jnp.where(mb[:, None], yb, 0.0),
                                    vb, mb)
            return cholesky_fit(A, bv)
        return jax.vmap(fit_one)(x, y, var, mask)

    L, alpha = fit(x, y, var, mask)
    return BankState(x=x, mask=mask, L=L, alpha=alpha,
                     trained=jnp.any(mask, axis=1))


_bank_fit_rr_jit = jax.jit(bank_fit_rr_core)


def bank_fit_rr(x, y, var, mask, basis) -> BankState:
    """Reduced-rank bank fit: every member solves its own (m_basis, m_basis)
    information system over a SHARED Hilbert basis — the reference's
    per-partition reduced-rank GPs (each partition GP holds the same
    ReducedRankCovariance setting, src/lidar_gp_2d.cpp:370 +
    lidar_gp_2d.cpp:148-151). x (B, n, d); y (B, n, q); var/mask (B, n);
    ``basis`` a kernels.reduced_rank.ReducedRankBasis.

    The returned state's L/alpha rows = #basis, not n (the reduced-rank
    shape contract, src/vanilla_gp.cpp:804); x/mask are retained for
    routing and checkpoints. All batched GEMMs + one batched Cholesky —
    already the MXU-shaped path, no Pallas variant needed (the features
    GEMM dominates and XLA tiles it)."""
    b = basis
    return _bank_fit_rr_jit(x, y, var, mask, b._freq, b._sqrt_s, b._origin,
                            b._half, b._inv_sqrt_vol)


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
        # clamp: X3-class whitening can overshoot ||at||^2 past 1 by ~1e-5
        # near training points; a negative variance NaNs downstream sqrts
        return mean, (s if reduced_rank else jnp.maximum(0.0, 1.0 - s))

    W = state.L_inv if state.L_inv is not None else state.L
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
        state.x, state.mask, W, state.alpha, xq)


@partial(jax.jit, static_argnames=("kernel", "reduced_rank", "fused"))
@f32_matmul
def _predict_segmented(state: BankState, mids, qs, scale, *, kernel: str,
                       reduced_rank: bool, fused: bool):
    """One active bank member per row of ``mids``: member mids[b'] answers
    its C grouped queries qs[b'] with ONE cross gram + ONE whitening GEMM.
    Factor traffic is O(B'·n²), not O(m·n²) (each member's (n, n) factor
    is read once regardless of how many queries routed to it). The member
    gathers happen INSIDE the jit so the whole routed predict is a single
    dispatch (each extra dispatch costs ~5 ms through the remote tunnel)."""
    xs = state.x[mids]
    ms = state.mask[mids]
    Ws = (state.L_inv if fused else state.L)[mids]
    als = state.alpha[mids]

    def one(x, mask, W, alpha, qrow):
        kt = cross_gram(kernel, x, qrow, scale, mask1=mask)   # (n, C)
        mean = kt.T @ alpha                                    # (C, q)
        at = W @ kt if fused else whiten(W, kt)
        s = jnp.sum(at * at, axis=0)
        return mean, (s if reduced_rank else jnp.maximum(0.0, 1.0 - s))

    return jax.vmap(one)(xs, ms, Ws, als, qs)


def _next_pow2(v: int) -> int:
    return 1 << max(0, int(v - 1).bit_length())


def _next_mult8(v: int) -> int:
    return max(8, -(-int(v) // 8) * 8)


def bank_predict_assigned(state: BankState, q, idx, scale, *, kernel: str,
                          reduced_rank: bool = False, basis=None,
                          profile: dict | None = None):
    """Per-query routed prediction: query j is answered by bank member
    idx[j] (the partition-search pattern of the reference's lidar/3D test
    paths, src/lidar_gp_2d.cpp:68-87). q (m, d); idx (m,) int32 (may be -1
    for unresolved queries — result flagged invalid).

    Returns (mean (m, q_dim), var (m,), valid (m,) bool).

    Implementation: queries are SEGMENTED BY PARTITION on the host
    (idx comes from the host-side partition search anyway), padded to a
    power-of-two capacity per member, and each active member whitens its
    whole query group in one GEMM. The earlier per-query design gathered
    an (m, n, n) stack of factors — ~830 MB of HBM traffic for 10^4
    queries against 144-sample 3D partitions; this reads each factor
    once. Per-member query capacity buckets are powers of two (recompiles
    logarithmic in load); the active-member axis buckets by 8s (padded
    member rows run full discarded GEMMs, so fine buckets cap that waste
    at 7 rows).

    ``basis`` (a ReducedRankBasis): reduced-rank mode — the per-member
    "gram" is the basis information matrix, queries are answered with
    whitened features and the +||.||^2 variance (the sign contract the
    reference threads through the partition classes,
    src/lidar_gp_2d.cpp:148-151). Implies reduced_rank=True.

    ``profile``: pass a dict to record per-phase wall-clock seconds
    (keys ``host_group``, ``h2d``, ``device``, ``d2h_scatter``, plus the
    chosen bucket shape ``bucket``). Profiling inserts synchronization
    between phases, so the phase sum slightly exceeds the unprofiled
    end-to-end time — use it to find the dominant term, not as the
    serving number.
    """
    prof = profile is not None
    if prof:
        t0 = time.perf_counter()
    q = np.asarray(q)
    idx = np.asarray(idx)
    m = q.shape[0]
    B = state.x.shape[0]
    trained = np.asarray(state.trained)
    dtype = np.dtype(state.alpha.dtype)
    q_dim = state.alpha.shape[2]
    mean_out = np.zeros((m, q_dim), dtype)
    var_out = np.full((m,), 1.0, dtype)
    ok = (idx >= 0) & (idx < B)
    ok[ok] = trained[idx[ok]]
    if not ok.any():
        return mean_out, var_out, ok
    # vectorized grouping: stable-sort query indices by member, then pack
    # each member's contiguous run into its row (O(m log m) host work)
    okj = np.flatnonzero(ok)
    order = okj[np.argsort(idx[okj], kind="stable")]
    sorted_members = idx[order]
    active = np.unique(sorted_members)
    counts = np.bincount(sorted_members, minlength=B)[active]
    C = _next_pow2(int(counts.max()))
    # member-axis buckets are multiples of 8, not powers of two: padded
    # rows run COMPLETE cross-gram + whitening GEMMs against member 0
    # whose results are discarded, so pow2 bucketing wasted up to ~2x
    # device compute just past a boundary (33 active -> 64 rows); 8-row
    # buckets cap the waste at 7 rows while keeping recompiles bounded
    # (active counts are stable across scans for a fixed partition map)
    Bp = _next_mult8(int(active.size))
    starts = np.searchsorted(sorted_members, active)
    row = np.searchsorted(active, sorted_members)
    pos = np.arange(order.size) - starts[row]
    slots = np.zeros((Bp, C), np.int64)
    svalid = np.zeros((Bp, C), bool)
    member_ids = np.zeros((Bp,), np.int64)
    slots[row, pos] = order
    svalid[row, pos] = True
    member_ids[: active.size] = active
    if prof:
        t1 = time.perf_counter()
        profile["host_group"] = t1 - t0
        profile["bucket"] = (int(Bp), int(C))
    qs = jnp.asarray(q[slots])                       # (Bp, C, d)
    mids = jnp.asarray(member_ids)
    if prof:
        jax.block_until_ready((qs, mids))
        t2 = time.perf_counter()
        profile["h2d"] = t2 - t1
    fused = state.L_inv is not None
    if basis is not None:
        mean_seg, var_seg = _predict_segmented_rr(
            state, mids, qs,
            basis._freq, basis._sqrt_s, basis._origin, basis._half,
            basis._inv_sqrt_vol)
    else:
        mean_seg, var_seg = _predict_segmented(
            state, mids, qs,
            scale, kernel=kernel, reduced_rank=reduced_rank, fused=fused)
    if prof:
        jax.block_until_ready((mean_seg, var_seg))
        t3 = time.perf_counter()
        profile["device"] = t3 - t2
    mean_seg, var_seg = jax.device_get((mean_seg, var_seg))
    mean_out[slots[svalid]] = mean_seg[svalid]
    var_out[slots[svalid]] = var_seg[svalid]
    if prof:
        profile["d2h_scatter"] = time.perf_counter() - t3
    return mean_out, var_out, ok


@jax.jit
@f32_matmul
def _predict_segmented_rr(state: BankState, mids, qs, freq, sqrt_s, origin,
                          half, inv_sqrt_vol):
    """Reduced-rank segmented routed predict: the query features are
    member-independent (rows = #basis), so kt is built once per query
    group and whitened against each member's information factor."""
    from erl_gaussian_process_tpu.kernels.reduced_rank import rr_features

    Ls = state.L[mids]
    als = state.alpha[mids]

    def one(L, alpha, qrow):
        ones = jnp.ones(qrow.shape[0], bool)
        kt = rr_features(qrow, ones, freq, sqrt_s, origin, half,
                         inv_sqrt_vol).T                      # (m_basis, C)
        mean = kt.T @ alpha
        at = whiten(L, kt)
        return mean, jnp.sum(at * at, axis=0)                  # +||.||^2

    return jax.vmap(one)(Ls, als, qs)


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
        if pallas_bank_applies(self.dtype, self.n):
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
