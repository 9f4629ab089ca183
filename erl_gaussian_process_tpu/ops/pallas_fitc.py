"""Fully fused FITC rank-N update kernel.

This is the hot loop of the north-star workload (SPGP occupancy mapping,
reference: SparsePseudoInputGaussianProcess::UpdateDense,
src/sparse_pseudo_input_gp.cpp:751-791). One kernel computes, per N-tile,

    kmn   = k(P, x_tile)                      (M, TK)  gram, VPU
    beta  = L_inv @ kmn                       (M, TK)  MXU
    lam_j = 1 - ||beta_:j||^2                 (TK,)
    w_j   = 1 / (lam_j + var_j)               (inf var encodes masked-out)
    dQ   += (kmn * w) @ kmn^T                 (M, M)   MXU, VMEM-resident
    dA   += (kmn * w) @ y_tile                (M, q)

replacing the XLA chain gram -> trsm -> scale -> 2 GEMMs. Wins over XLA:
the O(M^2 N) triangular solve becomes a GEMM against the precomputed
``L_inv = L_KM^{-1}`` (pseudo points are fixed, so L_inv is amortized over
every update), the (M, N) intermediates (kmn, beta, ksc) never leave VMEM,
and (M, M) HBM traffic is one delta write instead of per-op round trips.

Layout notes (measured on v5e): each pseudo-point feature dim is passed as
its own (M, 1) buffer and each sample dim as one sublane row of an (8, N)
buffer, so the pairwise-difference broadcast is two native splats — passing
P as (M, d_pad) and extracting columns costs a cross-lane gather that alone
doubled kernel time.

Constraints: M (pseudo count) must be a multiple of 128 and small enough
that L_inv + dQ + tiles fit VMEM (budget check in pallas_fitc_enabled;
M=1152 measured OK on v5e); callers pad with the far-point trick (see
sparse_pseudo_input_gp.pad_pseudo_points) which makes padded rows exactly
zero without masks. Sample count N pads to the tile with var = +inf
(w -> 0). dQ accumulates symmetrically: only the lower-triangular L×L
blocks are computed (dQ = K W Kᵀ; see _pick_nb) and mirrored after the
kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# explicit int32 index-map constants: under jax_enable_x64 a bare
# Python literal traces as i64 and Mosaic rejects the mixed-width
# index tuple (func.return (i32, i64) fails to legalize)
_Z = np.int32(0)

from erl_gaussian_process_tpu.ops.pallas_gram import _apply_family

from erl_gaussian_process_tpu.ops.vma import io_vma

_TILE_N = 256


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3x_pre(ah, al, bh, bl, dims=None):
    """bf16x3 matmul from PRE-SPLIT (hi, lo) bf16 operand pairs — lets
    callers amortize a split over several dots (the resident L_inv split
    once per dispatch outside the kernel; kmn split once per tile and its
    transpose taken on the bf16 halves)."""
    # precision pinned to DEFAULT: the callers run under an ambient
    # default_matmul_precision("float32") context, which Mosaic rejects for
    # bf16 operands ("Bad lhs type") — each pass here is a plain bf16 MXU dot
    if dims is None:
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
    else:
        d = lambda x, y: jax.lax.dot_general(
            x, y, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _dot3x(a, b, dims=None):
    """Near-float32 matmul from three single-pass bf16 MXU dots — the
    bf16_3x scheme XLA uses for its "float32" precision, hand-rolled because
    Mosaic dots only offer DEFAULT (1-pass bf16) or HIGHEST (6-pass, measured
    2x slower than this at the same accuracy class). Isolated-GEMM accuracy
    is ~5e-6 relative; end-to-end the fused update's map posterior lands at
    MAE 2.2e-3 vs float64 (XLA chain: 3.5e-4) with 100% sign agreement —
    inside the f32 performance path's accuracy budget for 1.5x speed."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    return _dot3x_pre(ah, al, bh, bl, dims)
# VMEM budget in f32 ELEMENTS for the kernel's resident set
# (L_inv m² + dQ m² + the kmn/beta/ksc tiles 3·m·TILE_N). The production
# 3D shape m=1152 (3.54M elems ≈ 14.2 MB) is measured-OK on v5e; the next
# 128-step (m=1280, 4.26M ≈ 17 MB) is untested against the scoped-VMEM
# limit, so the budget sits just above the known-good point.
_VMEM_ELEMS_FITC = 3_600_000
_MAX_D = 3


def pallas_fitc_enabled(dtype, m: int, d: int = 2) -> bool:
    """Default-on for TPU float32 with MXU-aligned M within the VMEM budget
    (measured on v5e: M=1024, N=2000, matern32: 0.161 ms vs 0.242 ms for
    the XLA chain — 1.5x; M=1152 (the hotel-0 3D shape): 0.297 vs 0.312 ms
    — at sign-identical map posteriors; see the _dot3x docstring for the
    precision story). Opt out with ERL_GP_NO_PALLAS_FITC=1
    (or ERL_GP_NO_PALLAS=1 for all Pallas kernels)."""
    if not all(isinstance(v, int) for v in (m, d)):
        return False  # symbolic dims (jax.export) are not Pallas-eligible

    if os.environ.get("ERL_GP_NO_PALLAS_FITC"):
        return False
    if os.environ.get("ERL_GP_NO_PALLAS"):
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if m % 128 != 0 or d > _MAX_D:
        return False
    if 2 * m * m + 3 * m * _TILE_N > _VMEM_ELEMS_FITC:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _pick_nb(m: int) -> int:
    """Diagonal-block count for the symmetric dQ accumulation: dQ = K W Kᵀ
    is symmetric, so the kernel computes only the lower-triangular L×L
    blocks ((nb²+nb)/2 of nb² GEMM blocks) and the caller mirrors. Blocks
    must be 128-aligned for the MXU; nb=1 falls back to the full GEMM.
    Override with ERL_GP_FITC_NB for A/B."""
    ov = os.environ.get("ERL_GP_FITC_NB")
    if ov:
        return int(ov)
    for nb in (4, 3, 2):
        if m % nb == 0 and (m // nb) % 128 == 0:
            return nb
    return 1


def _fitc_kernel(*refs, name: str, d: int, nb: int):
    (scale_ref, *p_refs, lh_ref, ll_ref, xr_ref, y_ref, var_ref,
     dq_ref, da_ref) = refs
    i = pl.program_id(0)
    m, tk = lh_ref.shape[0], xr_ref.shape[1]
    # gram tile via two native broadcasts per dim: (M, 1) - (1, TK)
    r2 = jnp.zeros((m, tk), dq_ref.dtype)
    for k in range(d):
        diff = p_refs[k][:, :] - xr_ref[k, :][None, :]
        r2 = r2 + diff * diff
    kmn = _apply_family(name, r2, scale_ref[0, 0])           # (M, TK)
    # bf16x3 dots: TPU DEFAULT-precision f32 matmuls are single-pass bf16,
    # whose ~3e-3 relative error on ||beta||^2 is amplified by 1/(lam+var)
    # up to 1/var = 1e4 — measured 5x worse map error (see _dot3x).
    # L_inv arrives PRE-SPLIT (bf16 hi/lo operands): it is fixed per map,
    # so the split is hoisted out of the kernel (and, under a replay scan,
    # out of the scan) instead of re-splitting M² elements per tile.
    kh, kl = _split_bf16(kmn)
    beta = _dot3x_pre(lh_ref[:], ll_ref[:], kh, kl)          # (M, TK)
    # clamp: lambda >= 0 mathematically; f32 roundoff past 1 would let
    # lam + var cross zero -> inf weights (see spgp_update)
    lam = jnp.maximum(1.0 - jnp.sum(beta * beta, axis=0), 0.0)
    w = 1.0 / (lam + var_ref[0, :])                          # inf var -> 0
    ksc = kmn * w[None, :]
    sh, sl = _split_bf16(ksc)

    @pl.when(i == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
        da_ref[:] = jnp.zeros_like(da_ref)

    # Mosaic's bf16 matmul only supports standard contraction dims, so the
    # syrk takes an explicit (M, TK) -> (TK, M) transpose — taken on kmn's
    # bf16 HALVES, reusing the beta dot's split instead of re-splitting the
    # transposed f32 tile.
    if nb <= 1:
        dq_ref[:] += _dot3x_pre(sh, sl, kh.T, kl.T)
    else:
        # dQ = (kmn W) kmnᵀ is symmetric: compute only the lower-triangular
        # L×L blocks ((nb²+nb)/2 of nb²); the caller mirrors them up.
        # Diagonal blocks are computed fully (their upper halves are valid
        # by symmetry and discarded by the mirror).
        L = m // nb
        kmn_t = [(kh[b * L:(b + 1) * L, :].T, kl[b * L:(b + 1) * L, :].T)
                 for b in range(nb)]
        for bi in range(nb):
            sh_b = sh[bi * L:(bi + 1) * L, :]
            sl_b = sl[bi * L:(bi + 1) * L, :]
            for bj in range(bi + 1):
                th, tl = kmn_t[bj]
                dq_ref[bi * L:(bi + 1) * L, bj * L:(bj + 1) * L] += \
                    _dot3x_pre(sh_b, sl_b, th, tl)
    da_ref[:] += _dot3x(ksc, y_ref[:])


@functools.partial(jax.jit, static_argnames=("name", "d", "nb"))
def _fitc_update_padded(scale, p_cols, linv_hi, linv_lo, xr, y, var_row, *,
                        name: str, d: int, nb: int = 1):
    m = linv_hi.shape[0]
    n = xr.shape[1]
    q = y.shape[1]
    dt = xr.dtype
    grid = (n // _TILE_N,)
    const = lambda i: (_Z, _Z)  # noqa: E731 — resident operands/accumulators
    dq_frac = (nb + 1) / (2 * nb) if nb > 1 else 1.0
    dq, da = pl.pallas_call(
        functools.partial(_fitc_kernel, name=name, d=d, nb=nb),
        out_shape=(
            jax.ShapeDtypeStruct((m, m), dt,
                                 vma=io_vma(linv_hi, xr, y)),
            jax.ShapeDtypeStruct((m, q), dt,
                                 vma=io_vma(linv_hi, xr, y)),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
            *[pl.BlockSpec((m, 1), const, memory_space=pltpu.VMEM)
              for _ in range(d)],
            pl.BlockSpec((m, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TILE_N), lambda i: (_Z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, q), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TILE_N), lambda i: (_Z, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, q), const, memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int((2 + 2 * dq_frac) * m * m * n) + 3 * m * n * d,
            bytes_accessed=(m * m * 2 + m * n + n * q) * 4,
            transcendentals=m * n,
        ),
    )(scale, *p_cols, linv_hi, linv_lo, xr, y, var_row)
    if nb > 1:
        # mirror the lower-triangular blocks up (the strict upper blocks
        # were never written and are zero); one m² elementwise pass,
        # ~13 µs of HBM traffic at m=1152 vs the ~50 µs of MXU work the
        # symmetric accumulation saves per 2048-sample update
        dq = jnp.tril(dq) + jnp.tril(dq, -1).T
    return dq, da


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def pallas_fitc_update(name: str, pseudo, linv, x, y, var, mask, scale):
    """(dQ_M, dalpha) for one rank-N FITC update, fully fused.

    pseudo: (M, d) with M % 128 == 0 (far-point padded); linv: (M, M)
    = L_KM^{-1}; x: (n, d); y: (n, q); var/mask: (n,).
    """
    m, d = pseudo.shape
    n = x.shape[0]
    q = y.shape[1]
    q_pad = _round_up(max(q, 1), 128)
    n_pad = _round_up(n, _TILE_N)
    dt = pseudo.dtype
    p_cols = [pseudo[:, k:k + 1] for k in range(d)]
    xr = jnp.zeros((8, n_pad), dt).at[:d, :n].set(x.T)
    yp = jnp.zeros((n_pad, q_pad), dt).at[:n, :q].set(y)
    inf = jnp.asarray(jnp.inf, dt)
    var_eff = jnp.where(mask, var.astype(dt), inf)
    var_row = jnp.full((8, n_pad), inf, dt).at[0, :n].set(var_eff)
    scale_arr = jnp.asarray(scale, dt).reshape(1, 1)
    # pre-split L_inv into bf16 (hi, lo) OUTSIDE the kernel: it is fixed per
    # map, so XLA computes the split once per dispatch and hoists it out of
    # replay scans (L_inv rides the carry unchanged) — the kernel was
    # re-splitting M² elements every 256-sample tile
    lh, ll = _split_bf16(linv)
    dq, da = _fitc_update_padded(scale_arr, p_cols, lh, ll, xr, yp, var_row,
                                 name=name, d=d, nb=_pick_nb(m))
    return dq, da[:, :q]
