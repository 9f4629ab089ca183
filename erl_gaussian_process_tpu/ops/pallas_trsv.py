"""Blocked triangular solves with few right-hand sides, as single Pallas
kernels.

Motivation (measured, v5e, honest harness): after the Cholesky, the exact-GP
fit spends ~2/3 of its time in the two (n, y_dim) triangular solves — XLA
lowers trsm to a sequential chain of ~n/128 small inverted-block matmuls
dispatched as one long HLO chain, which for a near-vector RHS is
latency-bound (n=8192: ~15 ms per solve vs a ~0.3 ms HBM-read bound for the
128 MB triangle). Here the whole substitution runs inside ONE kernel: the
solution stays VMEM-resident, each grid step streams one (B, n) block-row
of L, does one MXU dot against the already-solved prefix, and applies the
PRE-INVERTED diagonal block (a single batched-trsm on the host side of the
jit, amortized across both solves) with another MXU dot.

API: ``solve_lower(L, b)`` solves L x = b; ``solve_lower_t(L, b)`` solves
L^T x = b; ``cho_solve_vec(L, b)`` chains both (one diag inversion). L is
(n, n) lower-triangular, b (n, q); n must be a multiple of 128 and q <= 128
(padded to 128 lanes internally).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.linalg import solve_triangular

from erl_gaussian_process_tpu.models.gp_core import matmul_precision
from erl_gaussian_process_tpu.ops.pallas_fitc import _dot3x

from erl_gaussian_process_tpu.ops.vma import io_vma

_B = 128  # row-block: (B, n) stream = 4 MB at n=8192 f32
# explicit int32 for index-map constants: under jax_enable_x64 a bare
# Python literal traces as i64 and Mosaic rejects the mixed (i32, i64)
# index tuple (func.return fails to legalize)
_Z = np.int32(0)


def pallas_trsv_enabled(dtype, n: int, q: int) -> bool:
    if not all(isinstance(v, int) for v in (n, q)):
        return False  # symbolic dims (jax.export) are not Pallas-eligible
    if os.environ.get("ERL_GP_NO_PALLAS"):
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n % _B != 0 or n < 2 * _B or q > 128:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _diag_block_inverses(L):
    """(n, B) stack of per-block inverses: inv(L[kB:(k+1)B, kB:(k+1)B]).
    One batched triangular solve, amortized over both directions."""
    n = L.shape[0]
    nb = n // _B
    blocks = L.reshape(nb, _B, nb, _B)
    diags = jnp.stack([blocks[k, :, k, :] for k in range(nb)])   # (nb, B, B)
    eye = jnp.eye(_B, dtype=L.dtype)
    with matmul_precision():
        inv = jax.vmap(lambda d: solve_triangular(d, eye, lower=True))(diags)
    return inv.reshape(nb * _B, _B)


def inverses_from_chol_dinv(dinv, n: int, *, tile: int = 512, b: int = _B):
    """The (n, B) substitution-block inverses, sliced for free from the
    streaming Cholesky's diagonal-block-inverse output
    (ops/pallas_chol: block row j of ``dinv`` is inv(L[jT:(j+1)T,
    jT:(j+1)T]), T = ``tile``, padded blocks identity).

    Uses the structure of triangular inverses: the inverse of a lower-
    triangular matrix is lower-triangular with its diagonal ``b``-blocks
    equal to the inverses of the original's diagonal ``b``-blocks — so
    the (T/b)² sub-blocks of each stored T-block inverse already CONTAIN
    every b-block inverse the substitution kernels need, and the batched
    trsm of :func:`_diag_block_inverses` is replaced by pure slicing.
    Valid for any b-aligned ``n`` (padded T-blocks are [L 0; 0 I]-shaped;
    their inverse's diagonal sub-blocks are still the sub-inverses)."""
    assert tile % b == 0 and n % b == 0
    r = tile // b
    nb = n // b                     # b-blocks needed
    nt = -(-nb // r)                # covering T-blocks
    assert dinv.shape[0] >= nt * tile and dinv.shape[1] == tile
    d4 = dinv[:nt * tile].reshape(nt, r, b, r, b)
    sub = jnp.arange(r)
    # advanced indexing over axes (1, 3) puts the paired dim first:
    # (r, nt, b, b) -> (nt, r, b, b) -> (nt*r*b, b)
    diag = jnp.transpose(d4[:, sub, :, sub, :], (1, 0, 2, 3))
    return diag.reshape(nt * tile, b)[:n]


def _fwd_kernel(l_row_ref, inv_ref, b_ref, x_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        x_ref[:] = jnp.zeros_like(x_ref)

    # prefix contribution: columns >= i*B of this block-row are the diagonal
    # block (masked out below) and exact zeros above the diagonal; x rows
    # >= i*B are still zero, so a full-width masked dot equals the prefix dot
    col = jax.lax.broadcasted_iota(jnp.int32, l_row_ref.shape, 1)
    l_pre = jnp.where(col < i * _B, l_row_ref[:], 0.0)
    # bf16x3 dots (the X3 class): Mosaic's DEFAULT single-pass bf16 is not
    # enough for the 1 - ||.||^2 cancellations these solves feed (measured
    # 3e-3 rel); HIGHEST (6-pass) measured ~2x the kernel time of the
    # hand-rolled 3-pass at no observable posterior difference
    acc = b_ref[:] - _dot3x(l_pre, x_ref[:],
                            dims=(((1,), (0,)), ((), ())))
    x_blk = _dot3x(inv_ref[:], acc, dims=(((1,), (0,)), ((), ())))
    x_ref[pl.ds(i * _B, _B), :] = x_blk


def _bwd_kernel(l_col_ref, inv_ref, b_ref, x_ref):
    # solves L^T x = b; grid step i handles block ib counted from the BOTTOM
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    ib = nb - 1 - i

    @pl.when(i == 0)
    def _():
        x_ref[:] = jnp.zeros_like(x_ref)

    # (L^T x)_{block ib} needs rows > this block of the column panel
    row = jax.lax.broadcasted_iota(jnp.int32, l_col_ref.shape, 0)
    l_suf = jnp.where(row >= (ib + 1) * _B, l_col_ref[:], 0.0)   # (n, B)
    acc = b_ref[:] - _dot3x(
        l_suf, x_ref[:], dims=(((0,), (0,)), ((), ())))           # (B, q)
    # x_blk = inv(L_d)^T acc — contract the first axis of the stored inverse
    x_blk = _dot3x(inv_ref[:], acc, dims=(((0,), (0,)), ((), ())))
    x_ref[pl.ds(ib * _B, _B), :] = x_blk


def _call(kernel, L, inv, b, reverse: bool):
    n = L.shape[0]
    q = b.shape[1]
    nb = n // _B
    if reverse:
        l_spec = pl.BlockSpec((n, _B), lambda i: (_Z, nb - 1 - i),
                              memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((_B, _B), lambda i: (nb - 1 - i, _Z),
                              memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((_B, q), lambda i: (nb - 1 - i, _Z),
                              memory_space=pltpu.VMEM)
    else:
        l_spec = pl.BlockSpec((_B, n), lambda i: (i, _Z),
                              memory_space=pltpu.VMEM)
        i_spec = pl.BlockSpec((_B, _B), lambda i: (i, _Z),
                              memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((_B, q), lambda i: (i, _Z),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, q), L.dtype,
                                       vma=io_vma(L, inv, b)),
        grid=(nb,),
        in_specs=[l_spec, i_spec, b_spec],
        out_specs=pl.BlockSpec((n, q), lambda i: (_Z, _Z),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            # the bf16x3 splits of the (B, n) row panel and the (n, q)
            # solution need ~20 MB of scoped VMEM at n=8192 — above the
            # 16 MB default limit, well under the 128 MB physical VMEM
            vmem_limit_bytes=48 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=n * n * q, bytes_accessed=n * n * 2 + 2 * n * q * 4,
            transcendentals=0),
    )(L, inv, b)


@jax.jit
def _solve_lower(L, inv, b):
    return _call(_fwd_kernel, L, inv, b, reverse=False)


@jax.jit
def _solve_lower_t(L, inv, b):
    return _call(_bwd_kernel, L, inv, b, reverse=True)


def _pad_rhs(b):
    n, q = b.shape
    return jnp.zeros((n, 128), b.dtype).at[:, :q].set(b), q


def solve_lower(L, b, inv=None):
    """x with L x = b; L (n, n) lower-triangular, b (n, q), q <= 128."""
    bp, q = _pad_rhs(b)
    inv = _diag_block_inverses(L) if inv is None else inv
    return _solve_lower(L, inv, bp)[:, :q]


def solve_lower_t(L, b, inv=None):
    """x with L^T x = b (the second half of a Cholesky solve)."""
    bp, q = _pad_rhs(b)
    inv = _diag_block_inverses(L) if inv is None else inv
    return _solve_lower_t(L, inv, bp)[:, :q]


def cho_solve_vec(L, b, chol_dinv=None):
    """K^{-1} b via the two blocked solves, sharing one diagonal inversion.
    ``chol_dinv``: the streaming Cholesky's free diagonal-block-inverse
    output — when given, the inversion is pure slicing
    (:func:`inverses_from_chol_dinv`) instead of a batched trsm."""
    if chol_dinv is not None:
        inv = inverses_from_chol_dinv(chol_dinv, L.shape[0])
    else:
        inv = _diag_block_inverses(L)
    return solve_lower_t(L, solve_lower(L, b, inv), inv)
