"""Wide-RHS lower-triangular solve as pure-XLA block forward substitution.

The predict-time whitening ``L^{-1} K_test`` at large n and wide m is the
last trsm-bound op in the library: XLA's `triangular_solve` does NOT honor
the ambient dot algorithm (measured v5e, n=8192 m=4096 f32: trsm 17.6 ms
under both the 6-pass and 3-pass settings, while a same-shape GEMM runs
18.3 -> 9 ms switching 6-pass -> 3-pass). Rewriting the solve as 512-block
forward substitution turns all the work into ordinary MXU GEMMs that DO
run at the ambient precision:

    X_k = Dinv_k @ (B_k - L[k, :k] @ X[:k])        k = 0..nb-1 (unrolled)

with the (nb, 512, 512) diagonal-block inverses assembled from batched
128-block inverses + a blocked triangular-inverse recurrence (the same
formula as ops/pallas_chol._factor_tile, here vectorized over blocks).
Flops are identical to the trsm (sum_k 512*(k*512)*m MACs = n^2 m / 2);
the win is purely that GEMMs run on the fast path.

f32-only (the f64 path keeps the exact trsm; Dinv-based substitution is
X3-accuracy class, ~1e-5 rel). Opt out with ERL_GP_NO_BLOCKED_SOLVE=1.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

_BLOCK = 512
_SUB = 128


def blocked_whiten_enabled(dtype, n: int, m: int) -> bool:
    """Wide-RHS dispatch test for ``whiten``. n = system size, m = RHS
    columns. Thin RHS stays on the Pallas substitution (ops/pallas_trsv);
    small systems and f64 keep the exact trsm."""
    if not all(isinstance(v, int) for v in (n, m)):
        return False  # symbolic dims (jax.export) are not Pallas-eligible
    if os.environ.get("ERL_GP_NO_BLOCKED_SOLVE"):
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n < 2048 or n % _SUB != 0 or m < 512:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _pick_block(n: int) -> int:
    for b in (_BLOCK, 256, _SUB):
        if n % b == 0:
            return b
    raise ValueError(n)


def _diag_inverses(L, block: int):
    """(nb, block, block) inverses of L's diagonal blocks: batched
    ``_SUB``-inverses + blocked triangular-inverse assembly (GEMM-only)."""
    n = L.shape[0]
    nb = n // block
    nsb = block // _SUB
    diag = jnp.stack([L[k * block:(k + 1) * block,
                        k * block:(k + 1) * block] for k in range(nb)])
    subs = diag.reshape(nb, nsb, _SUB, nsb, _SUB)
    d128 = jnp.stack([subs[:, r, :, r, :] for r in range(nsb)],
                     axis=1).reshape(nb * nsb, _SUB, _SUB)
    eye = jnp.eye(_SUB, dtype=L.dtype)
    i128 = jax.vmap(
        lambda d: solve_triangular(d, eye, lower=True))(d128)
    i128 = i128.reshape(nb, nsb, _SUB, _SUB)
    if nsb == 1:
        return i128[:, 0]
    # Inv[r, s] = -Irr (sum_{s<=p<r} L[r, p] Inv[p, s]), batched over nb
    inv = [[None] * nsb for _ in range(nsb)]
    for r in range(nsb):
        inv[r][r] = i128[:, r]
    for s in range(nsb):
        for r in range(s + 1, nsb):
            acc = sum(jnp.einsum("bij,bjk->bik", subs[:, r, :, p, :],
                                 inv[p][s]) for p in range(s, r))
            inv[r][s] = -jnp.einsum("bij,bjk->bik", i128[:, r], acc)
    zero = jnp.zeros((nb, _SUB, _SUB), L.dtype)
    rows = [jnp.concatenate([inv[r][s] if s <= r else zero
                             for s in range(nsb)], axis=2)
            for r in range(nsb)]
    return jnp.concatenate(rows, axis=1)


def blocked_solve_lower(L, B):
    """X = L^{-1} B, unrolled block forward substitution. L (n, n) lower
    triangular, B (n, m); n a multiple of 128 (caller checks via
    ``blocked_whiten_enabled``)."""
    n = L.shape[0]
    block = _pick_block(n)
    nb = n // block
    dinv = _diag_inverses(L, block)
    xs = []
    for k in range(nb):
        rhs = B[k * block:(k + 1) * block]
        if k:
            prefix = jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]
            rhs = rhs - L[k * block:(k + 1) * block, :k * block] @ prefix
        xs.append(dinv[k] @ rhs)
    return jnp.concatenate(xs, axis=0)
