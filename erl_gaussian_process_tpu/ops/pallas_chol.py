"""Streaming blocked Cholesky of ONE large SPD matrix as a single Pallas
kernel (with the diagonal-block inverses as a free second output).

This targets the fits the batched bank kernel cannot touch: the reference's
big single systems — VanillaGP at n = 2k-8k (src/vanilla_gp.cpp:499) and
the NIGP joint value/gradient system, (n(1+d))^2 = 7500^2 at the
reference's 2D test shape (src/noisy_input_gp.cpp:888). XLA's
`jnp.linalg.cholesky` on these shapes is a long chain of small kernels
(panel factor + trsm + syrk per 128-panel) that runs 2-3x off the
compute/HBM roofline on v5e (measured: 12.6 ms at n=8192 f32, vs ~2.8 ms
of bf16x3 MXU work + ~3.5 GB of streamed HBM traffic).

Design — left-looking tile algorithm, grid = one step per lower tile
(column-major), all operands in HBM (`memory_space=ANY`) with manual
double-buffered DMA:

    for column j, row i >= j:                (one grid step per (i, j))
      Acc   = A[i,j] - sum_{p<j} L[i,p] @ L[j,p]^T     (bf16x3 MXU dots,
                                              L tiles DMA'd from the output
                                              buffer written by earlier
                                              steps; next-p tiles prefetch
                                              while p multiplies)
      i==j:  L[j,j], Dinv[j] = factor(Acc)   (in-VMEM blocked factorization:
                                              SB=128 augmented eliminations
                                              [D|I] -> [L^T|L^{-1}] + MXU
                                              sub-updates + blocked
                                              triangular inverse)
      i>j :  L[i,j] = Acc @ Dinv[j]^T        (one MXU dot)

The elimination produces exact-f32 factors (VPU rank-1 updates, no bf16
matmul passes — same property as ops/pallas_bank.py); tile-tile dots run
at XLA's own "f32" precision class (hand-rolled bf16x3, see
ops/pallas_fitc._dot3x). The mirrored strict-upper tiles are zero-filled
so the output is a clean lower-triangular matrix.

Constraints: float32, n padded by the wrapper to a multiple of T=512
(identity diagonal on the pad — exact, same convention as the bank).
Opt out with ERL_GP_NO_PALLAS_CHOL=1 (or ERL_GP_NO_PALLAS=1).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from erl_gaussian_process_tpu.ops.pallas_fitc import _dot3x

from erl_gaussian_process_tpu.ops.vma import io_vma

# explicit int32 loop/index constants (see ops/pallas_bank.py: i64 breaks
# Mosaic's lowering under jax_enable_x64)
_Z = np.int32(0)
_ONE = np.int32(1)

_T = 512    # HBM tile: (512, 512) f32 = 1 MB
_SB = 128   # in-VMEM factorization sub-block

_NN_DIMS = (((1,), (1,)), ((), ()))   # A @ B^T


def pallas_chol_enabled(dtype, n: int) -> bool:
    """True when the streaming blocked Cholesky applies. ``n`` is the
    caller's (unpadded) system size; the wrapper pads to a 512 multiple.

    Measured v5e f32 vs XLA's factorization (same matrices, two-point-slope
    harness): n=4096 0.96x (wash), 6144 1.58x (4.18 vs 6.59 ms), 7680 1.30x
    (6.35 vs 8.27 — the NIGP joint-system shape), 8192 1.63x (7.50 vs
    12.26). Below ~6k the serial per-column elimination (~n * 0.3 us of
    VMEM-bound rank-1 updates, the law for any right-looking base case)
    dominates and XLA's chain is equally good, so the kernel stays off."""
    if not isinstance(n, int):
        return False  # symbolic dims (jax.export) are not Pallas-eligible
    if os.environ.get("ERL_GP_NO_PALLAS_CHOL"):
        return False
    if os.environ.get("ERL_GP_NO_PALLAS"):
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    # upper bound: beyond ~16k the O(n^2) HBM L re-reads of the streaming
    # prefix leave no headroom over XLA's chain; untested territory
    if n < 6000 or n > 16384:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _elim2d(aug_ref, sb: int):
    """Augmented elimination [D | I] -> [L^T | L^{-1}] on an (sb, 2*sb)
    VMEM ref — the 2D single-matrix form of pallas_bank._elimination.

    Rejected variants (both measured on v5e, benchmarks/profile_chol.py;
    kept here so they are not re-tried):

    - Quarter-limited updates: restricting the rank-1 update to the
      quarter-panel containing rows > j via four `pl.when` regions of
      different static shapes. Mosaic compiles the predicated multi-shape
      stores inside the serial while_loop into a ~1000x slowdown (n=2048
      chol: <1 ms -> 550 ms device time) — predication does not skip
      work here, it serializes the store pipeline. The full-panel update
      with lcol masked to rows > j is the fast form.
    - Symmetric-pivot-column transpose: the trailing D block stays
      bitwise symmetric under the rank-1 update, so the pivot column is
      the pivot row transposed — but the per-iteration (1, sb) ->
      (sb, 1) relayout (lane -> sublane movement) costs MORE than the
      (sb, sb) masked reduce it replaces: chol n=8192 7.39 -> 9.01 ms,
      n=6144 4.05 -> 5.28 ms (device slope). Cross-lane reduces are
      cheap on the VPU; cross-dimension relayouts are not.
    """
    W = 2 * sb

    def body(j):
        row = aug_ref[pl.ds(j, 1), :]                       # (1, W)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        dj = jnp.sum(jnp.where(lane == j, row, 0.0), axis=1,
                     keepdims=True)
        inv = jax.lax.rsqrt(dj)                             # NaN if not SPD
        s = dj * inv
        urow = jnp.where((lane < sb) & (lane <= j), 0.0, row * inv) \
            + jnp.where(lane == j, s, 0.0)
        aug_ref[pl.ds(j, 1), :] = urow
        apart = aug_ref[:, :sb]                             # (sb, sb)
        lane_a = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 1)
        lcol = jnp.sum(jnp.where(lane_a == j, apart, 0.0), axis=1,
                       keepdims=True) * inv                 # (sb, 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (sb, 1), 0)
        lcol = jnp.where(sub > j, lcol, 0.0)
        aug_ref[:, :] = aug_ref[:, :] - lcol * urow
        return j + np.int32(1)

    jax.lax.while_loop(lambda j: j < sb, body, _Z)


def _elim2d_r2(aug_ref, sb: int):
    """Rank-2 variant of :func:`_elim2d`: eliminate TWO pivot columns per
    serial iteration (``sb`` must be even). Algebraically two fused
    rank-1 steps — the 2x2 pivot block is factored in scalars (masked
    lane reduces), both L-columns are formed from the SAME pre-update
    read of the left panel, and the trailing matrix takes ONE combined
    (sb, 2*sb) read-modify-write instead of two.

    Why this attacks the base-case law (~n * 0.3 us, the serial fraction
    that caps fit MFU at 31%, VERDICT r3 item 4): the per-iteration cost
    is dominated by the serialized full-panel store pipeline (see the
    rejected-variants note above — predication stalls it, masking does
    not), so halving the iteration count halves the stores on the
    critical path while total VPU flops stay identical.

    Opt back into the rank-1 form with ERL_GP_CHOL_ELIM1=1 (read at
    trace time; set it before the first jit of the enclosing kernel).
    """
    W = 2 * sb

    def body(j):
        j1 = j + _ONE
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        row0 = aug_ref[pl.ds(j, 1), :]                      # (1, W)
        row1 = aug_ref[pl.ds(j1, 1), :]
        d0 = jnp.sum(jnp.where(lane == j, row0, 0.0), axis=1,
                     keepdims=True)
        inv0 = jax.lax.rsqrt(d0)                            # NaN if not SPD
        s0 = d0 * inv0
        urow0 = jnp.where((lane < sb) & (lane <= j), 0.0, row0 * inv0) \
            + jnp.where(lane == j, s0, 0.0)
        # step j applied to row j+1: l10 = A[j+1,j]/l00
        l10 = jnp.sum(jnp.where(lane == j, row1, 0.0), axis=1,
                      keepdims=True) * inv0
        row1p = row1 - l10 * urow0
        d1 = jnp.sum(jnp.where(lane == j1, row1p, 0.0), axis=1,
                     keepdims=True)                         # d11 - l10^2
        inv1 = jax.lax.rsqrt(d1)
        s1 = d1 * inv1
        urow1 = jnp.where((lane < sb) & (lane <= j1), 0.0, row1p * inv1) \
            + jnp.where(lane == j1, s1, 0.0)
        aug_ref[pl.ds(j, 1), :] = urow0
        aug_ref[pl.ds(j1, 1), :] = urow1
        # both L-columns from one pre-update read of the left panel
        apart = aug_ref[:, :sb]                             # (sb, sb)
        lane_a = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 1)
        c0 = jnp.sum(jnp.where(lane_a == j, apart, 0.0), axis=1,
                     keepdims=True)
        c1 = jnp.sum(jnp.where(lane_a == j1, apart, 0.0), axis=1,
                     keepdims=True)
        lcol0 = c0 * inv0
        u01 = jnp.sum(jnp.where(lane == j1, row0, 0.0), axis=1,
                      keepdims=True) * inv0                 # = l10 (symm)
        lcol1 = (c1 - lcol0 * u01) * inv1
        sub = jax.lax.broadcasted_iota(jnp.int32, (sb, 1), 0)
        keep = sub > j1
        lcol0 = jnp.where(keep, lcol0, 0.0)
        lcol1 = jnp.where(keep, lcol1, 0.0)
        # rows j, j+1 have lcol == 0, so the stored urows pass through
        aug_ref[:, :] = aug_ref[:, :] - lcol0 * urow0 - lcol1 * urow1
        return j + np.int32(2)

    jax.lax.while_loop(lambda j: j < sb, body, _Z)


def _elim(aug_ref, sb: int):
    """Dispatch the elimination base case: rank-2 when ``sb`` is even
    (default), rank-1 otherwise or under ERL_GP_CHOL_ELIM1=1."""
    if sb % 2 == 0 and not os.environ.get("ERL_GP_CHOL_ELIM1"):
        _elim2d_r2(aug_ref, sb)
    else:
        _elim2d(aug_ref, sb)


def _factor_tile(acc_ref, aug_ref, l_buf, i_buf):
    """Blocked in-VMEM factorization of the (T, T) diagonal tile in
    ``acc_ref``: writes L into ``l_buf`` and L^{-1} into ``i_buf``
    (both fully overwritten). Mirrors /tmp-prototype `factor_tile`."""
    T = acc_ref.shape[0]
    nsb = T // _SB
    eye = (jax.lax.broadcasted_iota(jnp.int32, (_SB, _SB), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (_SB, _SB), 1))
    l_buf[:, :] = jnp.zeros((T, T), l_buf.dtype)
    i_buf[:, :] = jnp.zeros((T, T), i_buf.dtype)
    for s in range(nsb):
        lo = s * _SB
        aug_ref[:, :_SB] = acc_ref[lo:lo + _SB, lo:lo + _SB]
        aug_ref[:, _SB:] = eye.astype(aug_ref.dtype)
        _elim(aug_ref, _SB)
        lss = aug_ref[:, :_SB].T                     # left half holds L^T
        iss = aug_ref[:, _SB:]
        l_buf[lo:lo + _SB, lo:lo + _SB] = lss
        i_buf[lo:lo + _SB, lo:lo + _SB] = iss
        if s < nsb - 1:
            hi = lo + _SB
            c = acc_ref[hi:, lo:lo + _SB]            # (T-hi, SB)
            lcol = _dot3x(c, iss, dims=_NN_DIMS)     # C @ Iss^T
            l_buf[hi:, lo:lo + _SB] = lcol
            acc_ref[hi:, hi:] = acc_ref[hi:, hi:] - _dot3x(
                lcol, lcol, dims=_NN_DIMS)
    # strict-lower blocks of L^{-1}: Inv[r,s] = -Irr (sum_p L[r,p] Inv[p,s])
    mm = (((1,), (0,)), ((), ()))
    for s in range(nsb):
        for r in range(s + 1, nsb):
            acc = jnp.zeros((_SB, _SB), i_buf.dtype)
            for p in range(s, r):
                acc = acc + _dot3x(
                    l_buf[r * _SB:(r + 1) * _SB, p * _SB:(p + 1) * _SB],
                    i_buf[p * _SB:(p + 1) * _SB, s * _SB:(s + 1) * _SB],
                    dims=mm)
            i_buf[r * _SB:(r + 1) * _SB, s * _SB:(s + 1) * _SB] = -_dot3x(
                i_buf[r * _SB:(r + 1) * _SB, r * _SB:(r + 1) * _SB],
                acc, dims=mm)
    return


# Semaphore map shared by both kernels:
#   0..7   prefix pairs (2 per window slot, 4-deep window)
#   8,9 / 12,13 (plain) or 8,9 / 16,17 (gram)  deferred writes by parity
#   10,11  A-tile input slots (plain) / 10..15 coordinate slices (gram)
_S_PAIR = 0


def _prestart_pairs(i, j, l_any, bi, bj, sems, T):
    """Start prefix pairs 0..2 (the head of the 4-deep window). The
    static range must stay inside the array: prefix index p < j <= nb-1,
    so p <= nb-2 — a concrete p beyond that fails trace-time bounds
    validation even under pl.when."""
    nb = l_any.shape[0] // T
    for q in range(min(3, max(nb - 1, 0))):
        @pl.when(np.int32(q) < j)
        def _(q=np.int32(q)):
            # np.int32: a raw python int lowers as an i64 memref_slice
            # index under jax_enable_x64, which Mosaic's verifier
            # rejects (caught by tests/test_tpu_aot_compile.py)
            pltpu.make_async_copy(
                l_any.at[pl.ds(i * T, T), pl.ds(q * T, T)],
                bi.at[q], sems.at[np.int32(2 * q)]).start()
            pltpu.make_async_copy(
                l_any.at[pl.ds(j * T, T), pl.ds(q * T, T)],
                bj.at[q], sems.at[np.int32(2 * q + 1)]).start()


def _tile_step(i, j, l_any, dinv_any, acc, bi, bj, lb, i_buf, aug,
               zbuf, sems, wait_input, wl, wa):
    """Shared per-tile work. The caller must have ALREADY called
    ``_prestart_pairs`` (ordering differs between diag and offdiag steps
    — see _deferral_waits' hazard table) and ``wait_input()`` must
    finish materializing A[i, j] into ``acc`` (DMA wait or in-kernel
    gram build). Then subtract the prefix products, factor (diag) or
    solve (off-diag), and start the output writes on sems ``wl``/``wa``
    (this step's parity) WITHOUT waiting — the two-step deferral gives
    each ~2 MB store a full grid step to drain. ``lb`` is this parity's
    l_buf slot.

    Per-offdiag-tile fixed cost is the kernel's bound (measured v5e,
    benchmarks/profile_chol.py: 49.8 us/tile at depth-2 pairs, 37.6 us
    after one-step write deferral, ~39 us at this 4-deep pair window +
    two-step deferral, against ~6 us of solve MXU work + ~2.5 us of
    tile DMA at n=8192). Dinv[j] for the solve is read directly from
    ``i_buf``, which STILL HOLDS the factorization output of this
    column's diagonal step (column-major order; offdiag steps never
    write i_buf) instead of round-tripping through HBM.

    Rejected redesigns (measured on v5e; kept so they are not re-tried):

    - Tile=1024: 8.10 vs 7.32 ms at n=8192 — bigger tiles lengthen the
      serial factor/solve critical path more than they save in step
      overhead.
    - Resident-panel + (T, 4T) slab prefix (round 3, commit 2e02240):
      keep the whole prefix row L[j, 0:j] in a persistent VMEM panel
      filled once per column at the diagonal step, stream row i as
      4-tile slabs with one MXU dot per slab — offdiag steps issue ~1/4
      the DMA descriptors and never re-read the shared operand. The
      descriptor-issue-count theory predicted ~25 us/offdiag; silicon
      measured the OPPOSITE: 50.3 us/offdiag, n=8192 9.10 ms vs 7.08 for
      this pair-streaming form (A/B benchmarks/ab_chol.py, 2026-08-18;
      +29% at n=4096 and n=6144 too). With descriptor issue off the
      critical path, the coarser wait granularity (4 MB slab + panel
      fills serialized behind the diag factorization) dominates instead.
      The per-pair stream below double-buffers 1 MB transfers 4 deep —
      one DMA stream sustains only ~120 GB/s on v5e, so depth, not
      descriptor count, is what saturates the ~819 GB/s HBM interface.
    """
    T = acc.shape[0]

    # prefetched p-loop: Acc -= L[i,p] @ L[j,p]^T, 4-pair-deep window
    def start_pair(p, slot):
        pltpu.make_async_copy(
            l_any.at[pl.ds(i * T, T), pl.ds(p * T, T)],
            bi.at[slot], sems.at[2 * slot]).start()
        pltpu.make_async_copy(
            l_any.at[pl.ds(j * T, T), pl.ds(p * T, T)],
            bj.at[slot], sems.at[2 * slot + 1]).start()

    def wait_pair(p, slot):
        pltpu.make_async_copy(
            l_any.at[pl.ds(i * T, T), pl.ds(p * T, T)],
            bi.at[slot], sems.at[2 * slot]).wait()
        pltpu.make_async_copy(
            l_any.at[pl.ds(j * T, T), pl.ds(p * T, T)],
            bj.at[slot], sems.at[2 * slot + 1]).wait()

    wait_input()

    @pl.when(j > 0)
    def _():
        def body(p):
            slot = jax.lax.rem(p, np.int32(4))

            @pl.when(p + 3 < j)
            def _():
                start_pair(p + np.int32(3),
                           jax.lax.rem(p + np.int32(3), np.int32(4)))

            wait_pair(p, slot)
            acc[:, :] = acc[:, :] - _dot3x(bi[slot], bj[slot],
                                           dims=_NN_DIMS)
            return p + np.int32(1)

        jax.lax.while_loop(lambda p: p < j, body, _Z)

    @pl.when(i == j)
    def _():
        _factor_tile(acc, aug, lb, i_buf)

    @pl.when(i != j)
    def _():
        # Dinv[j] still lives in i_buf from this column's diagonal step
        lb[:, :] = _dot3x(acc[:, :], i_buf[:, :], dims=_NN_DIMS)

    _start_or_wait_writes(i, j, l_any, dinv_any, lb, i_buf, zbuf, sems,
                          T, wl, wa, wait=False)


def _start_or_wait_writes(i, j, l_any, dinv_any, lb, i_buf, zbuf, sems,
                          T, wl, wa, *, wait: bool):
    """Start (or wait) one step's two output DMAs: the L tile from this
    parity's l_buf slot on sem ``wl``, plus on sem ``wa`` either Dinv[j]
    (diag steps) or the zero mirror tile (offdiag steps). Descriptors are
    reconstructible from (i, j, parity) alone, which is how a LATER grid
    step (reading the tile tables at t-1 / t-2) can wait them."""
    c = pltpu.make_async_copy(
        lb, l_any.at[pl.ds(i * T, T), pl.ds(j * T, T)], sems.at[wl])
    c.wait() if wait else c.start()

    @pl.when(i == j)
    def _():
        c = pltpu.make_async_copy(
            i_buf, dinv_any.at[pl.ds(j * T, T), :], sems.at[wa])
        c.wait() if wait else c.start()

    @pl.when(i != j)
    def _():
        c = pltpu.make_async_copy(
            zbuf, l_any.at[pl.ds(j * T, T), pl.ds(i * T, T)],
            sems.at[wa])
        c.wait() if wait else c.start()


def _deferral_waits(t, i, j, ti_ref, tj_ref, l_any, dinv_any, l_buf,
                    i_buf, zbuf, sems, T, slot, wl, wa, pwl, pwa,
                    prestart):
    """Two-step write-deferral schedule, shared by both kernels.

    Each step starts its ~2 MB of output stores without waiting; the
    wait happens up to TWO steps later so the store has a full grid step
    to drain (the one-step scheme exposed the store's ~17 us latency on
    every step: the wait was the very next thing executed). l_buf is
    double-buffered by step parity to keep the DMA source alive.

    Exactly-once wait schedule (write at step w is waited at):
      - w+1, iff step w+1 is a diagonal step        (cond_b here)
      - w+2, iff step w+1 is an off-diagonal step   (cond_a here)
    Both precede the next same-parity store start (end of step w+2).

    Hazard table for starting the prefix pairs BEFORE the waits
    (offdiag steps only — this overlaps pair-0 DMA latency with the
    write waits): an offdiag step (i, j) prefix-reads rows {i, j} of
    columns p < j. Writes still in flight at that moment are from t-1
    and t-2, which both target column j (first offdiag of a column:
    t-1 = (j, j) and t-2 was already drained by the diag's cond_b;
    later offdiags: both in column j) or the never-read strict-upper
    mirror — never a read tile. Diagonal steps DO read column j-1
    (tile (j, j-1), written at t-1 when j = nb-1, at t-2 when
    j = nb-2) and overwrite i_buf whose Dinv DMA may be in flight, so
    they drain BOTH parities before prestarting."""
    is_diag = i == j

    @pl.when(jnp.logical_not(is_diag))
    def _():
        prestart()

    # cond_a: wait t-2 (same parity) — unless t-1 was a diagonal step,
    # whose cond_b already drained it
    @pl.when((t > 1) & (ti_ref[t - 1] != tj_ref[t - 1]))
    def _():
        _start_or_wait_writes(ti_ref[t - 2], tj_ref[t - 2], l_any,
                              dinv_any, l_buf.at[slot], i_buf, zbuf,
                              sems, T, wl, wa, wait=True)

    # cond_b: diagonal steps drain t-1 (other parity)
    @pl.when(is_diag & (t > 0))
    def _():
        _start_or_wait_writes(ti_ref[t - 1], tj_ref[t - 1], l_any,
                              dinv_any, l_buf.at[np.int32(1) - slot],
                              i_buf, zbuf, sems, T, pwl, pwa, wait=True)

    @pl.when(is_diag)
    def _():
        prestart()


def _chol_kernel(ti_ref, tj_ref, a_any, l_any, dinv_any,
                 acc, bi, bj, l_buf, i_buf, aug,
                 zbuf, sems):
    t = pl.program_id(0)
    i = ti_ref[t]
    j = tj_ref[t]
    T = acc.shape[1]
    nt = np.int32(ti_ref.shape[0])
    slot = jax.lax.rem(t, np.int32(2))
    # write sems by parity: 8/9 (even t), 12/13 (odd t)
    wl = np.int32(8) + np.int32(4) * slot
    wa = np.int32(9) + np.int32(4) * slot
    pwl = np.int32(12) - np.int32(4) * slot
    pwa = np.int32(13) - np.int32(4) * slot

    def a_load(ii, jj, sl):
        return pltpu.make_async_copy(
            a_any.at[pl.ds(ii * T, T), pl.ds(jj * T, T)], acc.at[sl],
            sems.at[np.int32(10) + sl])

    @pl.when(t == 0)
    def _():
        # scratch VMEM is NOT zero-initialized; zbuf persists across steps
        zbuf[:, :] = jnp.zeros_like(zbuf)
        a_load(i, j, _Z).start()

    # prefetch the NEXT step's A tile into the other acc slot
    @pl.when(t + 1 < nt)
    def _():
        a_load(ti_ref[t + 1], tj_ref[t + 1],
               np.int32(1) - slot).start()

    _deferral_waits(t, i, j, ti_ref, tj_ref, l_any, dinv_any, l_buf,
                    i_buf, zbuf, sems, T, slot, wl, wa, pwl, pwa,
                    prestart=lambda: _prestart_pairs(i, j, l_any, bi, bj,
                                                     sems, T))

    _tile_step(i, j, l_any, dinv_any, acc.at[slot], bi, bj,
               l_buf.at[slot], i_buf, aug, zbuf, sems,
               wait_input=a_load(i, j, slot).wait, wl=wl, wa=wa)

    # final drain: nothing follows to absorb the last step's writes
    @pl.when(t == nt - 1)
    def _():
        _start_or_wait_writes(i, j, l_any, dinv_any, l_buf.at[slot],
                              i_buf, zbuf, sems, T, wl, wa, wait=True)


def _joint_tile(fam: str, xi, xj, scale, d: int):
    """One (T, T) tile of the JOINT value/gradient train gram from per-row
    metadata (the TPU-native form of the reference's
    ``ComputeKtrainWithGradient`` gram assembly, src/noisy_input_gp.cpp:
    860-868): lane layout of each joint row is
    ``[coords(d) | block type | validity]`` where type 0 is a value row and
    type k is a d/dx_{k-1} row. Using per-row metadata instead of joint
    index arithmetic means rows of different block types can share a tile
    freely — the kernel never needs to know where the value/gradient block
    boundaries fall relative to the 512-tiling.

    Closed forms (diff = x_row - x_col, matching
    kernels/gradient._rbf_blocks/_matern32_blocks and the row-side sign
    flip of kernels/gradient._assemble):
      value/value   k(r)
      value/grad_l  dk/dx2_l          =  D_col * g(r)
      grad_k/value  dk/dx1_k = -dk/dx2_k = -D_row * g(r)
      grad_k/grad_l d2k/dx1_k dx2_l
    with D_row/D_col the diff component selected by the row/col block
    type. Invalid (masked or pad) rows are zeroed here and get their
    identity diagonal in the caller's diag-tile noise add."""
    T = xi.shape[0]
    ta = xi[:, d:d + 1]                       # (T, 1) row block type
    tb = xj[d:d + 1, :]                       # (1, T) col block type
    va = xi[:, d + 1:d + 2] > 0.5             # (T, 1) row validity
    vb = xj[d + 1:d + 2, :] > 0.5             # (1, T) col validity
    diffs = []
    r2 = jnp.zeros((T, T), jnp.float32)
    for k in range(d):
        dk_ = xi[:, k:k + 1] - xj[k:k + 1, :]
        diffs.append(dk_)
        r2 = r2 + dk_ * dk_
    dr = jnp.zeros((T, T), jnp.float32)
    dc = jnp.zeros((T, T), jnp.float32)
    for k in range(d):
        tk = np.float32(k + 1)
        dr = dr + jnp.where(ta == tk, diffs[k], 0.0)
        dc = dc + jnp.where(tb == tk, diffs[k], 0.0)
    arow = ta > 0.5
    bcol = tb > 0.5
    # same grad dim, both grads; astype keeps this f32 under x64 (an
    # all-weak-literal where would materialize f64 and crash Mosaic's
    # 32-bit layout inference)
    eqf = ((ta == tb) & arow).astype(jnp.float32)
    if fam == "rbf":
        inv_s2 = 1.0 / (scale * scale)
        kv = jnp.exp(r2 * (-0.5 * inv_s2))
        # one expression covers all four blocks: u*v is 1 (val/val),
        # +-D/s^2 (single-grad), -D_r D_c/s^4 (grad/grad); eqf adds the
        # delta_kl/s^2 term of d2k
        u = jnp.where(arow, -dr * inv_s2, 1.0)
        v = jnp.where(bcol, dc * inv_s2, 1.0)
        out = kv * (u * v + eqf * inv_s2)
    else:  # matern32
        c = np.float32(np.sqrt(3.0)) / scale
        r = jnp.sqrt(r2)
        e = jnp.exp(-c * r)
        safe_r = jnp.where(r > 0, r, 1.0)
        both = arow & bcol
        single = jnp.logical_xor(arow, bcol)
        cc = c * c
        u = jnp.where(arow, -dr, 1.0)
        v = jnp.where(bcol, dc, 1.0)
        out = e * jnp.where(
            both, cc * (eqf - c * dr * dc / safe_r),
            jnp.where(single, cc * u * v, 1.0 + c * r))
    return jnp.where(va & vb, out, 0.0)


def _chol_gram_kernel(ti_ref, tj_ref, scale_ref, xc_any, xr_any, var_any,
                      l_any, dinv_any, acc, bi, bj,
                      l_buf, i_buf, aug, zbuf, xi_s, xj_s, vj_s, sems,
                      *, fam: str, d: int, joint: bool = False):
    """Gram-fused variant: A[i, j] = k(x_i, x_j) (+ noise diag on i == j)
    is built in-kernel from DMA'd coordinate slices — the (n, n) gram
    never round-trips through HBM. ``joint=True`` builds the NIGP joint
    value/gradient gram instead (see ``_joint_tile``)."""
    from erl_gaussian_process_tpu.ops.pallas_gram import _apply_family

    t = pl.program_id(0)
    i = ti_ref[t]
    j = tj_ref[t]
    T = acc.shape[1]
    nt = np.int32(ti_ref.shape[0])
    slot = jax.lax.rem(t, np.int32(2))
    # write sems by parity: 8/9 (even t), 16/17 (odd t)
    wl = np.int32(8) + np.int32(8) * slot
    wa = np.int32(9) + np.int32(8) * slot
    pwl = np.int32(16) - np.int32(8) * slot
    pwa = np.int32(17) - np.int32(8) * slot

    # coordinate-slice DMAs: double-buffered slots with dedicated sems
    # 10..15 (3 per slot); sems 0..7 = prefix pairs, 8/9 + 16/17 =
    # deferred writes by parity
    def slice_copies(ii, jj, sl):
        base = np.int32(10) + sl * np.int32(3)
        return (
            pltpu.make_async_copy(xc_any.at[pl.ds(ii * T, T), :],
                                  xi_s.at[sl], sems.at[base]),
            pltpu.make_async_copy(xr_any.at[:, pl.ds(jj * T, T)],
                                  xj_s.at[sl], sems.at[base + 1]),
            pltpu.make_async_copy(var_any.at[:, pl.ds(jj * T, T)],
                                  vj_s.at[sl], sems.at[base + 2]),
        )

    @pl.when(t == 0)
    def _():
        zbuf[:, :] = jnp.zeros_like(zbuf)
        for c in slice_copies(i, j, slot):   # slot == 0 at t == 0
            c.start()

    @pl.when(t + 1 < nt)
    def _():
        for c in slice_copies(ti_ref[t + 1], tj_ref[t + 1],
                              np.int32(1) - slot):
            c.start()

    _deferral_waits(t, i, j, ti_ref, tj_ref, l_any, dinv_any, l_buf,
                    i_buf, zbuf, sems, T, slot, wl, wa, pwl, pwa,
                    prestart=lambda: _prestart_pairs(i, j, l_any, bi, bj,
                                                     sems, T))

    def build_gram():
        for c in slice_copies(i, j, slot):
            c.wait()
        xi = xi_s[slot]                      # (T, 128)
        xj = xj_s[slot]                      # (8, T)
        vj = vj_s[slot]                      # (8, T)
        accs = acc.at[slot]
        if joint:
            accs[:, :] = _joint_tile(fam, xi, xj, scale_ref[0, 0], d)
        else:
            r2 = jnp.zeros((T, T), jnp.float32)
            for k in range(d):
                diff = xi[:, k:k + 1] - xj[k:k + 1, :]
                r2 = r2 + diff * diff
            # Far-point rows sit at (i+2)*1e15; once two masked rows are
            # >~18400 apart diff^2 overflows f32 to inf, and matern32's
            # (1+cr)*exp(-cr) would evaluate inf*0 = NaN. Clamp to a finite
            # huge r2 (exp(-sqrt(1e30)/s) underflows to exactly 0 for every
            # family, which is the intended masked-off-diagonal value).
            r2 = jnp.minimum(r2, jnp.float32(1e30))
            accs[:, :] = _apply_family(fam, r2, scale_ref[0, 0])

        @pl.when(i == j)
        def _():
            sub = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
            if joint:
                # masked/pad joint rows are zeroed by _joint_tile; give
                # them their exact identity diagonal here (validity is
                # lane d+1 of the col slice; noise vj is pre-zeroed on
                # masked rows by the wrapper)
                diag_add = vj[:1, :] + (1.0 - xj[d + 1:d + 2, :])
            else:
                diag_add = vj[:1, :]
            accs[:, :] = accs[:, :] + jnp.where(sub == lane, diag_add,
                                                0.0)

    _tile_step(i, j, l_any, dinv_any, acc.at[slot], bi, bj,
               l_buf.at[slot], i_buf, aug, zbuf, sems,
               wait_input=build_gram, wl=wl, wa=wa)

    @pl.when(t == nt - 1)
    def _():
        _start_or_wait_writes(i, j, l_any, dinv_any, l_buf.at[slot],
                              i_buf, zbuf, sems, T, wl, wa, wait=True)


def _chol_scratch(n: int, tile: int, *, slices: bool = False):
    """Scratch layout shared by both kernels (gram adds the coordinate
    slices). All buffers are n-independent: the prefix streams through a
    4-deep (tile, tile) pair window — ~15.6 MB total at tile=512."""
    shapes = [
        pltpu.VMEM((2, tile, tile), jnp.float32),     # acc (2 slots)
        pltpu.VMEM((4, tile, tile), jnp.float32),     # bi (4-deep window)
        pltpu.VMEM((4, tile, tile), jnp.float32),     # bj
        pltpu.VMEM((2, tile, tile), jnp.float32),     # l_buf (by parity)
        pltpu.VMEM((tile, tile), jnp.float32),        # i_buf
        pltpu.VMEM((_SB, 2 * _SB), jnp.float32),      # aug
        pltpu.VMEM((tile, tile), jnp.float32),        # zbuf (zeros)
    ]
    if slices:
        shapes += [
            pltpu.VMEM((2, tile, 128), jnp.float32),  # xi slices
            pltpu.VMEM((2, 8, tile), jnp.float32),    # xj slices
            pltpu.VMEM((2, 8, tile), jnp.float32),    # var slices
        ]
    # plain: 0..7 pairs, 8/9 + 12/13 writes by parity, 10/11 input slots
    # gram:  0..7 pairs, 8/9 + 16/17 writes by parity, 10..15 slices
    shapes.append(pltpu.SemaphoreType.DMA((18,) if slices else (14,)))
    return shapes


def _chol_vmem_limit(n: int, tile: int) -> int:
    # scratch (~15.6 MB at tile=512 with the 4-deep pair window +
    # double-buffered inputs) exceeds the default 16 MB scoped-vmem budget
    return (48 if tile <= 512 else 100) * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("tile",))
def _chol_padded(A, ti, tj, *, tile: int):
    n = A.shape[0]
    nt = ti.shape[0]
    grid = (nt,)
    L, dinv = pl.pallas_call(
        _chol_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), A.dtype, vma=io_vma(A)),
            jax.ShapeDtypeStruct((n, tile), A.dtype, vma=io_vma(A)),
        ),
        grid=grid,
        in_specs=[
            # explicit whole-array blocks with i32 zero index maps: the
            # DEFAULT index map returns bare-int literals, which trace as
            # i64 under jax_enable_x64 and fail Mosaic legalization
            pl.BlockSpec((nt,), lambda t: (_Z,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nt,), lambda t: (_Z,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, n), lambda t: (_Z, _Z),
                         memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((n, n), lambda t: (_Z, _Z),
                         memory_space=pl.ANY),
            pl.BlockSpec((n, tile), lambda t: (_Z, _Z),
                         memory_space=pl.ANY),
        ),
        scratch_shapes=_chol_scratch(n, tile),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_chol_vmem_limit(n, tile)),
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3,
            bytes_accessed=(n * n * n // (3 * tile)) * 4 * 2,
            transcendentals=n,
        ),
    )(ti, tj, A)
    return L, dinv


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _tile_tables(nb: int):
    """Column-major lower-triangle tile order: diag first per column."""
    ti, tj = [], []
    for j in range(nb):
        for i in range(j, nb):
            ti.append(i)
            tj.append(j)
    return (np.asarray(ti, np.int32), np.asarray(tj, np.int32))


def chol_blocked(A, *, tile: int = _T, return_dinv: bool = False):
    """L = chol(A) (clean lower-triangular) for one large SPD f32 matrix.
    Pads to a multiple of ``tile`` with an identity diagonal (exact).
    Returns L at the caller's n. Caller checks ``pallas_chol_enabled``.

    ``return_dinv=True`` additionally returns the kernel's free second
    output: the per-diagonal-block inverses, (n_padded, tile) with block
    row j = inv(L[jT:(j+1)T, jT:(j+1)T]). Downstream thin-RHS solves
    slice their substitution-block inverses straight out of it
    (ops/pallas_trsv.inverses_from_chol_dinv) instead of re-inverting."""
    n0 = A.shape[0]
    n = _round_up(n0, tile)
    # structural minimum: the (T, 4T) slab/panel DMA slices are static
    # shapes, so the padded matrix must hold at least 5 tiles per side
    assert n >= 5 * tile, f"chol_blocked needs n >= {5 * tile}, got {n0}"
    if n != n0:
        A = jnp.pad(A, [(0, n - n0), (0, n - n0)])
        idx = jnp.arange(n)
        pad_diag = (idx[:, None] == idx[None, :]) & (idx[:, None] >= n0)
        A = jnp.where(pad_diag, 1.0, A)
    ti, tj = _tile_tables(n // tile)
    L, dinv = _chol_padded(A, jnp.asarray(ti), jnp.asarray(tj), tile=tile)
    if return_dinv:
        return L[:n0, :n0], dinv
    return L[:n0, :n0]


_GRAM_FAMILIES = ("rbf", "ou", "matern32")


def pallas_chol_gram_enabled(dtype, n: int, fam: str, d: int) -> bool:
    """Gate for the gram-fused factorization (train-gram semantics).
    Lower threshold than the plain-A path: even where the factorization
    is a wash vs XLA (n ~ 4-6k), fusing the gram build into the kernel
    still saves the gram op and the (n, n) HBM round-trip. Scale-mixture
    names over the plain families qualify too — the in-kernel tile
    builder resolves them through pallas_gram._apply_family (the distance
    tile is computed once, each component is one fused scalar map)."""
    if not isinstance(n, int):
        return False  # symbolic dims (jax.export) are not Pallas-eligible
    from erl_gaussian_process_tpu.kernels.base import mixture_params

    mix = mixture_params(fam)
    base = mix[0] if mix is not None else fam
    if base not in _GRAM_FAMILIES or d > 8:
        return False
    if os.environ.get("ERL_GP_NO_PALLAS_CHOL") or             os.environ.get("ERL_GP_NO_PALLAS"):
        return False
    if jnp.dtype(dtype) != jnp.float32 or n < 3584 or n > 16384:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


@functools.partial(jax.jit, static_argnames=("fam", "d", "tile", "joint"))
def _chol_gram_padded(scale, xc, xr, vr, ti, tj, *, fam: str, d: int,
                      tile: int, joint: bool = False):
    n = xc.shape[0]
    nt = ti.shape[0]
    L, dinv = pl.pallas_call(
        functools.partial(_chol_gram_kernel, fam=fam, d=d, joint=joint),
        out_shape=(
            jax.ShapeDtypeStruct((n, n), xc.dtype,
                                 vma=io_vma(scale, xc, xr, vr)),
            jax.ShapeDtypeStruct((n, tile), xc.dtype,
                                 vma=io_vma(scale, xc, xr, vr)),
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((nt,), lambda t: (_Z,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nt,), lambda t: (_Z,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda t: (_Z, _Z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, 128), lambda t: (_Z, _Z),
                         memory_space=pl.ANY),
            pl.BlockSpec((8, n), lambda t: (_Z, _Z),
                         memory_space=pl.ANY),
            pl.BlockSpec((8, n), lambda t: (_Z, _Z),
                         memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((n, n), lambda t: (_Z, _Z),
                         memory_space=pl.ANY),
            pl.BlockSpec((n, tile), lambda t: (_Z, _Z),
                         memory_space=pl.ANY),
        ),
        scratch_shapes=_chol_scratch(n, tile, slices=True),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_chol_vmem_limit(n, tile)),
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3,
            bytes_accessed=(n * n * n // (3 * tile)) * 4 * 2,
            transcendentals=n * n,
        ),
    )(ti, tj, scale, xc, xr, vr)
    return L, dinv


def chol_blocked_gram(fam, x, var, mask, scale, *, tile: int = _T,
                      return_dinv: bool = False):
    """L = chol(k(x, x) + diag(var)) with train-gram semantics (masked
    rows become exact identity rows, the far-point trick of
    ops/pallas_bank.py) — gram construction fused into the streaming
    factorization, so the (n, n) matrix is built tile-by-tile in VMEM and
    never read from HBM. x (n0, d); var/mask (n0,). Returns L (n0, n0)
    (plus the free diagonal-block inverses under ``return_dinv=True`` —
    see :func:`chol_blocked`). Caller checks
    ``pallas_chol_gram_enabled``."""
    n0, d = x.shape
    dt = x.dtype
    n = _round_up(n0, tile)
    assert n >= 5 * tile, \
        f"chol_blocked_gram needs n >= {5 * tile}, got {n0}"
    valid = jnp.zeros((n,), bool).at[:n0].set(mask)
    far = (jnp.arange(n, dtype=dt) + 2.0) * dt.type(1e15)
    # lane dim padded to 128: Mosaic DMA slices must be tile-aligned
    xc = jnp.zeros((n, 128), dt).at[:n0, :d].set(x)
    xc = xc.at[:, 0].set(jnp.where(valid, xc[:, 0], far))
    vr = jnp.zeros((8, n), dt)
    vr = vr.at[0, :n0].set(jnp.where(mask, var, 0.0))
    ti, tj = _tile_tables(n // tile)
    L, dinv = _chol_gram_padded(
        jnp.asarray(scale, dt).reshape(1, 1), xc, xc[:, :8].T, vr,
        jnp.asarray(ti), jnp.asarray(tj), fam=fam, d=d, tile=tile)
    if return_dinv:
        return L[:n0, :n0], dinv
    return L[:n0, :n0]


_JOINT_FAMILIES = ("rbf", "matern32")   # the differentiable gram families
                                        # (kernels/gradient._GRAD_BLOCKS)


def pallas_chol_joint_enabled(dtype, n: int, fam: str, d: int) -> bool:
    """Gate for the JOINT value/gradient gram-fused factorization. ``n``
    is the SAMPLE count; the joint system is (1+d)*n. Same machinery as
    the plain gram path — the win is larger here because the jnp joint
    gram materializes (n, n, d) and (n, n, d, d) derivative-block
    intermediates plus the assembled (N, N) gram in HBM before the
    factorization even starts (the VERDICT r3 item-3 round-trip)."""
    if not isinstance(n, int):
        return False
    if fam not in _JOINT_FAMILIES or d > 6:   # d+2 metadata lanes must
        return False                          # fit the 8-lane col slice
    if os.environ.get("ERL_GP_NO_PALLAS_CHOL") or \
            os.environ.get("ERL_GP_NO_PALLAS"):
        return False
    nj = (1 + d) * n
    if jnp.dtype(dtype) != jnp.float32 or nj < 3584 or nj > 16384:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def chol_blocked_gram_joint(fam, x, var_v, var_g, sample_mask, grad_mask,
                            scale, *, tile: int = _T,
                            return_dinv: bool = False):
    """L = chol(joint value/gradient train gram) with the (N, N) gram
    built tile-by-tile in VMEM (N = (1+d)*n never round-trips HBM).
    Row layout matches kernels/gradient.train_gram_with_gradient —
    ``[values(n); grad-dim0(n); ...]``, masked rows exact identity rows —
    so the factor is interchangeable with the jnp joint-gram path.
    x (n, d); var_v = var_x + var_y per sample; var_g per gradient row;
    masks (n,) bool. Returns L (N, N). Caller checks
    ``pallas_chol_joint_enabled``."""
    n0, d = x.shape
    dt = x.dtype
    nj = (1 + d) * n0
    n = _round_up(nj, tile)
    assert n >= 5 * tile, \
        f"chol_blocked_gram_joint needs N >= {5 * tile}, got {nj}"
    coords = jnp.concatenate([x] * (1 + d), axis=0)             # (nj, d)
    types = jnp.concatenate(
        [jnp.full((n0,), np.float32(b), dt) for b in range(1 + d)])
    valid = jnp.concatenate([sample_mask] + [grad_mask] * d)
    noise = jnp.concatenate(
        [jnp.where(sample_mask, var_v, 0.0)]
        + [jnp.where(grad_mask, var_g, 0.0)] * d).astype(dt)
    xc = jnp.zeros((n, 128), dt)
    xc = xc.at[:nj, :d].set(coords)
    xc = xc.at[:nj, d].set(types)
    xc = xc.at[:nj, d + 1].set(valid.astype(dt))
    vr = jnp.zeros((8, n), dt).at[0, :nj].set(noise)
    ti, tj = _tile_tables(n // tile)
    L, dinv = _chol_gram_padded(
        jnp.asarray(scale, dt).reshape(1, 1), xc, xc[:, :8].T, vr,
        jnp.asarray(ti), jnp.asarray(tj), fam=fam, d=d, tile=tile,
        joint=True)
    if return_dinv:
        return L[:nj, :nj], dinv
    return L[:nj, :nj]
