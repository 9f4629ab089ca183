"""Fused batched-bank Cholesky factorization as a single Pallas kernel.

This is the TPU replacement for the hot half of the reference's two batch
paths — the OpenMP partition loops (src/lidar_gp_2d.cpp:366-392,
src/range_sensor_gp_3d.cpp:334-360) and the libtorch batched CUDA Cholesky
(src/batch_gp_update_torch.cpp:72-82). XLA's batched ``cholesky`` +
``solve_triangular`` on (B, n, n) small systems is latency-bound far below
the VPU roofline (measured v5e, B=1024 n=128 f32: 14.3 ms for the
factorization, 35 ms with the two solves; the full XLA bank fit is 37 ms).
This kernel runs the whole bank fit in 6.6 ms (5.6x) and emits ``L^{-1}``
as a free by-product that turns every later predict-time whitening solve
into a GEMM.

Design: one grid step loads G bank members into VMEM and runs a
batch-vectorized right-looking elimination over the augmented tile

    M = [ A | I ]           A = k(x, x) + diag(var)   (G, R, 2n)

The slab is RECTANGULAR: lanes pad the member size n0 to the 128-lane
grain (n), but rows only to the 8-sublane grain (R) — and the serial
elimination stops at n0, since columns >= n0 are identity rows whose
elimination is an exact no-op on the cropped output. Both cut the
padding tax for off-grid member sizes (a 144-slot member is a
(144, 512) slab eliminated 144 times, not (256, 512) eliminated 256
times — 3.2x less slab work).

For column j (sequential, ``while_loop``):
    d      = A[j, j]                    (lane one-hot reduce)
    u_row  = M[j, :] / sqrt(d)          (row j of [L^T | L^{-1}-in-progress])
    l_col  = A[:, j] / sqrt(d)          (masked lane-reduce of the A part —
                                         the trailing block stays symmetric,
                                         and an exact f32 reduce beats both a
                                         dynamic lane slice, which Mosaic
                                         rejects off 128-boundaries, and an
                                         MXU one-hot extraction, measured 2x
                                         slower)
    M     -= l_col * u_row              (rank-1 update of the full tile)

After n steps M = [L^T | L^{-1}] exactly (all arithmetic is elementwise VPU
f32 — unlike XLA's blocked factorization there are no bf16 matmul passes in
the factorization; measured max |L - chol_f64| ~ 4.6e-7 relative).
``alpha = K^{-1} y`` is two batched GEMMs against ``L^{-1}`` outside the
kernel, on the MXU at XLA's bf16_3x f32 precision.

The gram itself is built in-kernel from per-dim coordinate buffers (same
dual-layout trick as ops/pallas_gram.py), so a bank fit is ONE kernel with
no (B, n, n) HBM round-trip. Masked-out samples are handled with the
far-point trick (see models/sparse_pseudo_input_gp.pad_pseudo_points):
invalid rows sit at pairwise-distant ~1e15 coordinates with var = 0, making
their gram rows exactly e_i — the identity-padding of the reference's GPU
batch path (src/batch_gp_update_torch.cpp:60-67) with zero in-kernel masks.

Constraints: float32, lanes a multiple of 128 / rows of 8 (wrappers pad),
n <= 512 (VMEM), d <= 8. q is unconstrained — alpha is computed OUTSIDE
the kernel as two batched GEMMs against L^{-1}. Opt out with
ERL_GP_NO_PALLAS_BANK=1 (or ERL_GP_NO_PALLAS=1 for all Pallas kernels).
"""

from __future__ import annotations

from erl_gaussian_process_tpu.ops.vma import io_vma

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from erl_gaussian_process_tpu.ops.pallas_gram import _apply_family

from erl_gaussian_process_tpu.models.gp_core import matmul_precision

# index-map/loop constants are explicit int32: under jax_enable_x64 a bare
# Python literal traces as i64 and Mosaic rejects the mixed-width index
# tuple / in-kernel comparisons (observed: func.return (i32, i64) fails to
# legalize; i64 loop indices blow the tracer's promotion recursion)
_Z = np.int32(0)
_ONE = np.int32(1)

_MAX_N = 512
_MAX_D = 8
# Members-per-grid-step budget, in f32 ELEMENTS of the G*R*lane_width
# product (lane_width = 2n slab + 128 per lane-padded coordinate column
# for the fused-gram variant; 3n slab+input for the gram-input variant).
# Calibrated by on-chip A/B + Mosaic OOM boundaries (v5e, 2026-08-19):
# every measured-OK point sits at <= 1.77M elements and every measured
# OOM at >= 1.92M (fit: G48*R104*n128 OOMs "scoped vmem by 0.19M",
# G16*R144*n256 d=2 compiles; G16*R256*n256 d=2 OOMs by 3.89M). Larger G
# was faster at EVERY compilable point (amortizes the serial elimination
# across more VPU work per step), so the picker doubles G until the next
# doubling would cross the budget.
_VMEM_ELEMS_FIT = 1_800_000
_VMEM_ELEMS_GRAM_IN = 1_600_000  # no OOM point measured; <= max known-OK


def pallas_bank_applies(dtype, n: int, d: int = 1) -> bool:
    """Single source of truth for "should this bank take the fused kernel",
    given the caller's UNPADDED member size ``n``: the measured v5e
    crossover (below ~n=96 the pad-to-128 waste exceeds XLA's batched-chain
    latency, so callers keep their jnp path) plus the kernel's own enable
    gate at the padded size. Used by models/batch_gp.bank_fit,
    BatchGPBank.solve and parallel/mesh.sharded_bank_fit so the dispatch
    can never drift between the single-chip and sharded paths."""
    if not all(isinstance(v, int) for v in (n, d)):
        return False  # symbolic dims (jax.export) are not Pallas-eligible
    return n > 96 and pallas_bank_enabled(dtype, -(-n // 128) * 128, d)


def pallas_bank_enabled(dtype, n: int, d: int = 1) -> bool:
    """True when the fused bank kernel applies. ``n`` is the PADDED member
    size (multiple of 128). Below unpadded n~96 the 128-padding waste makes
    XLA's batched path competitive — callers keep their jnp path there.
    The output width q is deliberately NOT a parameter: alpha is two
    batched GEMMs outside the kernel, so any q works."""
    if os.environ.get("ERL_GP_NO_PALLAS_BANK"):
        return False
    if os.environ.get("ERL_GP_NO_PALLAS"):
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n > _MAX_N or d > _MAX_D:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _elimination(m_ref, n: int, stop: int):
    """The augmented right-looking loop shared by both entry points.

    ``stop`` bounds the serial chain at the caller's UNPADDED member size:
    columns >= n0 are identity rows by construction (far-point masking in
    bank_fit_fused, explicit diag padding in bank_cholesky_solve_fused), so
    eliminating them is an exact no-op (d = 1, urow = e_j, lcol = 0) AND
    they never touch rows < n0 (their off-diagonal gram entries are exactly
    0.0 in f32) — and the wrappers crop every output to n0 anyway. Skipping
    them removes the dominant serialized cost of the padding: at the 3D
    sensor bank's n0=144 (padded 256) it is 112 of 256 full-slab
    read-modify-writes."""
    G, _, W = m_ref.shape

    def body(j):
        mrow = m_ref[:, pl.ds(j, 1), :]                        # (G,1,W)
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (G, 1, W), 2)
        dj = jnp.sum(jnp.where(lane_w == j, mrow, 0.0), axis=2,
                     keepdims=True)
        # d <= 0 means numerically non-SPD; rsqrt yields NaN which the
        # host-side retry of the caller sees (same policy as plain chol)
        inv = jax.lax.rsqrt(dj)
        s = dj * inv
        urow = jnp.where((lane_w < n) & (lane_w <= j), 0.0, mrow * inv) \
            + jnp.where(lane_w == j, s, 0.0)
        m_ref[:, pl.ds(j, 1), :] = urow
        apart = m_ref[:, :, :n]                                # (G,R,n)
        R = apart.shape[1]
        lane_a = jax.lax.broadcasted_iota(jnp.int32, (G, R, n), 2)
        lcol = jnp.sum(jnp.where(lane_a == j, apart, 0.0), axis=2,
                       keepdims=True) * inv                    # (G,R,1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (G, R, 1), 1)
        lcol = jnp.where(sub > j, lcol, 0.0)
        m_ref[:] = m_ref[:] - lcol * urow
        return j + np.int32(1)

    # while_loop with an explicit i32 carry, NOT fori_loop: under
    # jax_enable_x64 fori_loop's scan lowering adds a hidden i64 iteration
    # counter whose convert-element-type sends Mosaic's lowering into
    # infinite recursion (RecursionError at compile time)
    jax.lax.while_loop(lambda j: j < np.int32(stop), body, _Z)


def _elimination_r2(m_ref, n: int, stop: int):
    """Rank-2 form of :func:`_elimination`: TWO pivot columns per serial
    iteration (``n`` is always a 128 multiple, so even). Same fusion as
    ops/pallas_chol._elim2d_r2 — the 2x2 pivot block factors in scalar
    lane reduces, both L-columns come from one pre-update read of the A
    panel, and the trailing (G, n, 2n) read-modify-write (the dominant
    serialized cost of the loop) runs once per column PAIR. Identity
    rows from far-point padding pass through unchanged (d = 1, e_j row).
    NOT the default: measured slower than rank-1 here (see _elim);
    opt in with ERL_GP_BANK_ELIM2=1 (trace-time)."""
    G, _, W = m_ref.shape

    def body(j):
        j1 = j + _ONE
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (G, 1, W), 2)
        row0 = m_ref[:, pl.ds(j, 1), :]                        # (G,1,W)
        row1 = m_ref[:, pl.ds(j1, 1), :]
        d0 = jnp.sum(jnp.where(lane_w == j, row0, 0.0), axis=2,
                     keepdims=True)
        inv0 = jax.lax.rsqrt(d0)                    # NaN if not SPD
        s0 = d0 * inv0
        urow0 = jnp.where((lane_w < n) & (lane_w <= j), 0.0, row0 * inv0) \
            + jnp.where(lane_w == j, s0, 0.0)
        l10 = jnp.sum(jnp.where(lane_w == j, row1, 0.0), axis=2,
                      keepdims=True) * inv0
        row1p = row1 - l10 * urow0
        d1 = jnp.sum(jnp.where(lane_w == j1, row1p, 0.0), axis=2,
                     keepdims=True)                 # d11 - l10^2
        inv1 = jax.lax.rsqrt(d1)
        s1 = d1 * inv1
        urow1 = jnp.where((lane_w < n) & (lane_w <= j1), 0.0, row1p * inv1) \
            + jnp.where(lane_w == j1, s1, 0.0)
        m_ref[:, pl.ds(j, 1), :] = urow0
        m_ref[:, pl.ds(j1, 1), :] = urow1
        apart = m_ref[:, :, :n]                                # (G,R,n)
        R = apart.shape[1]
        lane_a = jax.lax.broadcasted_iota(jnp.int32, (G, R, n), 2)
        c0 = jnp.sum(jnp.where(lane_a == j, apart, 0.0), axis=2,
                     keepdims=True)
        c1 = jnp.sum(jnp.where(lane_a == j1, apart, 0.0), axis=2,
                     keepdims=True)
        lcol0 = c0 * inv0
        u01 = jnp.sum(jnp.where(lane_w == j1, row0, 0.0), axis=2,
                      keepdims=True) * inv0                    # = l10
        lcol1 = (c1 - lcol0 * u01) * inv1
        sub = jax.lax.broadcasted_iota(jnp.int32, (G, R, 1), 1)
        keep = sub > j1
        lcol0 = jnp.where(keep, lcol0, 0.0)
        lcol1 = jnp.where(keep, lcol1, 0.0)
        m_ref[:] = m_ref[:] - lcol0 * urow0 - lcol1 * urow1
        return j + np.int32(2)

    jax.lax.while_loop(lambda j: j < np.int32(stop), body, _Z)


def _elim(m_ref, n: int, stop: int = None):
    """Dispatch: rank-1 by default — measured on v5e (2026-08-18 ritual)
    the rank-2 pair form is 62% SLOWER here (B=1024 n=128: 10.9 ms vs
    6.7 ms; B=1000 n=100: 10.8 vs 6.5): unlike the streaming chol's
    elimination (where rank-2 wins by halving trips over an HBM-resident
    panel), this loop is VPU-bound over a VMEM-resident (G, n, 2n) slab
    and the pair form's extra per-iteration reads of the A panel cost
    more than the halved iteration count saves. Rank-2 stays available
    for A/B via ERL_GP_BANK_ELIM2=1 (trace-time, even ``n`` only).

    ``stop`` (static) bounds the serial chain at the caller's unpadded
    member size — see :func:`_elimination`."""
    stop = n if stop is None else min(stop, n)
    if n % 2 == 0 and os.environ.get("ERL_GP_BANK_ELIM2"):
        _elimination_r2(m_ref, n, min(stop + (stop % 2), n))
    else:
        _elimination(m_ref, n, stop)


def _fit_kernel(*refs, name: str, d: int, n0: int):
    # rectangular slab (G, R, 2n): R rows at the 8-sublane grain, n lanes
    # at the 128-lane grain — rows do NOT pay the lane padding (a 144-slot
    # member is a (144, 512) slab, not (256, 512))
    (scale_ref, *xc_refs, xr_ref, var_ref, m_ref) = refs
    G, R, W = m_ref.shape
    n = W // 2
    r2 = jnp.zeros((G, R, n), m_ref.dtype)
    for k in range(d):
        diff = xc_refs[k][:, :, :] - xr_ref[:, k, :][:, None, :]
        r2 = r2 + diff * diff
    kf = _apply_family(name, r2, scale_ref[0, 0])
    lane_a = jax.lax.broadcasted_iota(jnp.int32, (G, R, n), 2)
    sub_a = jax.lax.broadcasted_iota(jnp.int32, (G, R, n), 1)
    diag = lane_a == sub_a
    m_ref[:, :, :n] = kf + jnp.where(diag, var_ref[:, :1, :], 0.0)
    m_ref[:, :, n:] = diag.astype(m_ref.dtype)
    _elim(m_ref, n, n0)


def _chol_kernel(k_ref, m_ref, *, n0: int):
    G, R, W = m_ref.shape
    n = W // 2
    m_ref[:, :, :n] = k_ref[:]
    lane_a = jax.lax.broadcasted_iota(jnp.int32, (G, R, n), 2)
    sub_a = jax.lax.broadcasted_iota(jnp.int32, (G, R, n), 1)
    m_ref[:, :, n:] = (lane_a == sub_a).astype(m_ref.dtype)
    _elim(m_ref, n, n0)


def _cost(B, R, n, n0):
    return pl.CostEstimate(flops=2 * B * R * n * n0,
                           bytes_accessed=B * R * n * 3 * 4,
                           transcendentals=B * R * n + B * n0)


@functools.partial(jax.jit, static_argnames=("name", "d", "G", "n0"))
def _fit_raw(scale, xc, xr, var, *, name: str, d: int, G: int, n0: int):
    # xc rows are the rectangular R (8-grain); xr/var lanes are n (128-grain)
    B, R, _ = xc[0].shape
    n = xr.shape[2]
    spec = lambda shp: pl.BlockSpec((G,) + shp, lambda i: (i, _Z, _Z),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fit_kernel, name=name, d=d, n0=n0),
        out_shape=jax.ShapeDtypeStruct((B, R, 2 * n), xc[0].dtype,
                                       vma=io_vma(scale, *xc, xr, var)),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (_Z, _Z),
                         memory_space=pltpu.SMEM),
            *[spec((R, 1)) for _ in range(d)],
            spec((8, n)),
            spec((8, n)),
        ],
        out_specs=spec((R, 2 * n)),
        cost_estimate=_cost(B, R, n, n0),
    )(scale, *xc, xr, var)


@functools.partial(jax.jit, static_argnames=("G", "n0"))
def _chol_raw(K, *, G: int, n0: int):
    B, R, n = K.shape
    spec = lambda shp: pl.BlockSpec((G,) + shp, lambda i: (i, _Z, _Z),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_chol_kernel, n0=n0),
        out_shape=jax.ShapeDtypeStruct((B, R, 2 * n), K.dtype,
                                       vma=io_vma(K)),
        grid=(B // G,),
        in_specs=[spec((R, n))],
        out_specs=spec((R, 2 * n)),
        cost_estimate=_cost(B, R, n, n0),
    )(K)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _pick_g(R: int, lane_elems: int, budget: int, B: int) -> int:
    """Members per grid step: the largest power of two whose G*R*lane_elems
    footprint stays within the measured VMEM budget (see _VMEM_ELEMS_*).
    Rectangular slabs (R < n rows) and 1-D inputs free VMEM that a larger
    G converts directly into speed (measured: the 3D bank's (144, 512)
    slab runs 8.61 ms at the old square-table G=4 and 6.83 ms at the
    budget's G=16; the reference torch-sweep shape (104, 256) 4.72 ->
    3.98 ms at G=32). Capped at the bank size rounded up to a power of
    two so tiny banks don't pad B several-fold. ERL_GP_BANK_G overrides
    for on-chip A/B (too-large G is a Mosaic scoped-vmem OOM at compile
    time)."""
    cap = 1 << max(0, B - 1).bit_length()
    if os.environ.get("ERL_GP_BANK_G"):
        return min(max(1, int(os.environ["ERL_GP_BANK_G"])), cap)
    g = 1
    while g < 64 and 2 * g * R * lane_elems <= budget:
        g *= 2
    return min(g, cap)


def _split_outputs(M, n, n0):
    """M (B, R, 2n) = [L^T | L^{-1}] -> (L, L_inv) cropped to n0.
    ``n`` is the LANE width (R rows >= n0 at the 8-sublane grain)."""
    L = jnp.swapaxes(M[:, :n0, :n][:, :, :n0], 1, 2)
    L_inv = M[:, :n0, n:][:, :, :n0]
    return L, L_inv


@functools.partial(jax.jit, static_argnames=("name", "d", "n0", "G"))
def _bank_fit_jit(x, y, var, mask, scale, *, name: str, d: int, n0: int,
                  G: int):
    B, n, _ = x.shape
    R = _round_up(n0, 8)
    dt = x.dtype
    # far-point masking: invalid samples sit at pairwise-distant ~1e15
    # coordinates with var 0 -> gram row exactly e_i (identity padding)
    far = (jnp.arange(n, dtype=dt) + 2.0)[None, :, None] * dt.type(1e15)
    x_eff = jnp.where(mask[:, :, None], x, far)
    xc = [x_eff[:, :R, k:k + 1] for k in range(d)]
    xr = jnp.zeros((B, 8, n), dt).at[:, :d, :].set(jnp.swapaxes(x_eff, 1, 2))
    varr = jnp.zeros((B, 8, n), dt).at[:, 0, :].set(jnp.where(mask, var, 0.0))
    M = _fit_raw(scale.reshape(1, 1), xc, xr, varr, name=name, d=d, G=G,
                 n0=n0)
    L, L_inv = _split_outputs(M, n, n0)
    yz = jnp.where(mask[:, :, None], y, 0.0)[:, :n0]
    with matmul_precision():
        w = jnp.einsum("bij,bjq->biq", L_inv, yz)
        alpha = jnp.einsum("bji,bjq->biq", L_inv, w)
    return L, L_inv, alpha


def bank_fit_fused(name: str, x, y, var, mask, scale):
    """Fused bank fit. x (B, n, d); y (B, n, q); var/mask (B, n).
    Returns (L, L_inv, alpha), each (B, n, .) at the CALLER's n.
    Caller must have checked ``pallas_bank_enabled``."""
    B, n0, d = x.shape
    n = _round_up(max(n0, 128), 128)
    if n != n0:
        pad = [(0, 0), (0, n - n0), (0, 0)]
        x = jnp.pad(x, pad)
        y = jnp.pad(y, pad)
        var = jnp.pad(var, pad[:2])
        mask = jnp.pad(mask, pad[:2])  # False => far-point rows
    G = _pick_g(_round_up(n0, 8), 2 * n + 128 * d, _VMEM_ELEMS_FIT, B)
    Bp = _round_up(B, G)
    if Bp != B:
        grow = [(0, Bp - B)] + [(0, 0)] * 2
        x, y = jnp.pad(x, grow), jnp.pad(y, grow)
        var, mask = jnp.pad(var, grow[:2]), jnp.pad(mask, grow[:2])
    L, L_inv, alpha = _bank_fit_jit(x, y, var, mask,
                                    jnp.asarray(scale, x.dtype),
                                    name=name, d=d, n0=n0, G=G)
    return L[:B], L_inv[:B], alpha[:B]


@functools.partial(jax.jit, static_argnames=("n0", "G"))
def _bank_chol_jit(K, y, *, n0: int, G: int):
    n = K.shape[2]                      # lane width (rows may be fewer)
    M = _chol_raw(K, G=G, n0=n0)
    L, L_inv = _split_outputs(M, n, n0)
    with matmul_precision():
        w = jnp.einsum("bij,bjq->biq", L_inv, y[:, :n0])
        alpha = jnp.einsum("bji,bjq->biq", L_inv, w)
    return L, L_inv, alpha


def bank_cholesky_solve_fused(K, y):
    """(L, L_inv, alpha = K^{-1} y) for a precomputed gram batch.
    K (B, n, n) SPD; y (B, n, q). Pads lanes to a multiple of 128 and rows
    to a multiple of 8 with unit-diagonal rows (exact — the elimination
    stops at n0 and never reads them). Caller must have checked
    ``pallas_bank_enabled``."""
    B, n0, _ = K.shape
    n = _round_up(max(n0, 128), 128)
    R = _round_up(n0, 8)
    if n != n0 or R != n0:
        K = jnp.pad(K, [(0, 0), (0, R - n0), (0, n - n0)])
        idx_r, idx_l = jnp.arange(R), jnp.arange(n)
        pad_diag = (idx_r[:, None] == idx_l[None, :]) & (idx_r[:, None] >= n0)
        K = jnp.where(pad_diag[None], 1.0, K)
    G = _pick_g(R, 3 * n, _VMEM_ELEMS_GRAM_IN, B)
    Bp = _round_up(B, G)
    if Bp != B:
        K = jnp.pad(K, [(0, Bp - B), (0, 0), (0, 0)])
        eye_fix = jnp.arange(Bp) >= B
        idx_r, idx_l = jnp.arange(R), jnp.arange(n)
        K = jnp.where(eye_fix[:, None, None]
                      & (idx_r[:, None] == idx_l[None, :])[None], 1.0, K)
        y = jnp.pad(y, [(0, Bp - B), (0, 0), (0, 0)])
    L, L_inv, alpha = _bank_chol_jit(K, y, n0=n0, G=G)
    return L[:B], L_inv[:B], alpha[:B]
