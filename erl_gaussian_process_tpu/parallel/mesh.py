"""Mesh-sharded variants of the hot steps.

Design (SURVEY.md §5.8): bank members are independent -> pure data-parallel
sharding of the B axis; the SPGP update is a sample-sharded local gram +
solve + GEMM with one ``psum`` over the mesh for the rank-N (Q_M, alpha)
accumulation. Both are written with ``shard_map`` so the collective placement
is explicit and rides ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P

from erl_gaussian_process_tpu.kernels import cross_gram, train_gram
from erl_gaussian_process_tpu.models.batch_gp import BankState
from erl_gaussian_process_tpu.models.gp_core import cholesky_fit, f32_matmul
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import SpGpState

BANK_AXIS = "b"


def make_mesh(n_devices: int | None = None, axis_name: str = BANK_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def sharded_bank_fit(mesh: Mesh, x, y, var, mask, scale, *, kernel: str
                     ) -> BankState:
    """bank_fit with the bank axis sharded over the mesh. B must be divisible
    by the mesh size. No collectives — members are independent."""

    @f32_matmul
    def local(xl, yl, vl, ml):
        def one(xi, yi, vi, mi):
            yv = jnp.where(mi[:, None], yi, 0.0)
            K = train_gram(kernel, xi, jnp.where(mi, vi, 0.0), scale, mask=mi)
            L, alpha = cholesky_fit(K, yv)
            return L, alpha

        L, alpha = jax.vmap(one)(xl, yl, vl, ml)
        return L, alpha, jnp.any(ml, axis=1)

    spec = P(BANK_AXIS)
    L, alpha, trained = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec)))(x, y, var, mask)
    return BankState(x=x, mask=mask, L=L, alpha=alpha, trained=trained)


def sharded_spgp_update(mesh: Mesh, state: SpGpState, x, y, var, mask, scale,
                        *, kernel: str) -> SpGpState:
    """FITC rank-N update with the N sample axis sharded over the mesh.

    Each chip computes its local K_MN / lambda / scaled columns and local
    (dQ_M, dalpha) GEMMs; the accumulation is one ``psum`` pair over ICI.
    Pseudo-point state (L_KM, Q_M, alpha) is replicated.
    """

    @f32_matmul
    def local(pseudo, L_km, qm, alpha, xl, yl, vl, ml):
        kmn = cross_gram(kernel, pseudo, xl, scale)
        beta = solve_triangular(L_km, kmn, lower=True)
        lam = 1.0 - jnp.sum(beta * beta, axis=0)
        inv = jnp.where(ml, 1.0 / (lam + vl), 0.0)
        ksc = kmn * inv[None, :]
        dqm = jax.lax.psum(ksc @ kmn.T, BANK_AXIS)
        yv = jnp.where(ml[:, None], yl, 0.0)
        dalpha = jax.lax.psum(ksc @ yv, BANK_AXIS)
        return qm + dqm, alpha + dalpha

    rep = P()
    shard = P(BANK_AXIS)
    qm, alpha = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(rep, rep, rep, rep, shard, shard, shard, shard),
        out_specs=(rep, rep)))(
        state.pseudo, state.L_km, state.qm, state.alpha, x, y, var, mask)
    return SpGpState(pseudo=state.pseudo, L_km=state.L_km,
                     L_inv=state.L_inv, qm=qm, alpha=alpha)


def sharded_spgp_predict(mesh: Mesh, state: SpGpState, L_qm, alpha_solved,
                         xq, scale, *, kernel: str):
    """Query-sharded SPGP predict: queries are embarrassingly parallel, so
    the m_q axis shards over the mesh with the (small) pseudo-point state
    replicated; no collectives. Returns (mean (m_q, q), var (m_q,)).
    m_q must be divisible by the mesh size."""

    @f32_matmul
    def local(pseudo, L_km, L_inv, L_qm, a, xl):
        kt = cross_gram(kernel, pseudo, xl, scale)
        mean = kt.T @ a
        beta = L_inv @ kt
        gamma = solve_triangular(L_qm, kt, lower=True)
        var = (1.0 - jnp.sum(beta * beta, axis=0)
               + jnp.sum(gamma * gamma, axis=0))
        return mean, var

    rep = P()
    shard = P(BANK_AXIS)
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, shard),
        out_specs=(shard, shard)))(
        state.pseudo, state.L_km, state.L_inv, L_qm, alpha_solved, xq)
