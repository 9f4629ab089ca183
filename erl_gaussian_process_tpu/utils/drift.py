"""Numerical drift certification for long-horizon FITC replays.

The flagship bench replays ~1e3 rank-N FITC updates at float32 on the
chip. This module provides the independent reference: an exact float64
replay of the IDENTICAL per-pose datasets (collected by
``update_batch(collect_datasets=True)`` — the samples exactly as the f32
replay consumed them), and the posterior comparison metric. Pinning the
datasets isolates the f32 accumulation/solve numerics from borderline
sampler-activation differences between dtypes/backends, which are
legitimate but would confound the gate (the same reasoning as
tests/test_spgp_occupancy_map.py::test_float32_matches_float64_posterior).

The reference would silently NaN in this regime
(src/sparse_pseudo_input_gp.cpp:834-842 factors Q_M with no jitter);
here the drift is measured and gated in the shipping benchmark
(bench.py: ``hotel0_drift_vs_f64``, gate <= 1e-3).
"""

from __future__ import annotations

import numpy as np


def replay_f64(pseudo, scale, kernel, dx, dy, dm, var, grid,
               poses_per_chunk: int = 16):
    """Float64 reference replay on the ambient backend (CPU in practice;
    requires jax_enable_x64). Feeds the collected datasets through the
    same ``spgp_update`` increment math at f64 and returns the posterior
    log-odds on ``grid``.

    pseudo (M, d) UNPADDED pseudo points (far-point MXU padding rows are
    mathematically inert — kernel values against them are exactly 0 — so
    the f32 state's padding does not change the posterior being compared);
    dx (B, n, d) / dy (B, n, 1) / dm (B, n) the collected datasets;
    var the scalar logodd variance; grid (q, d) query points.

    ``poses_per_chunk`` fuses chunks of poses into one increment call for
    BLAS efficiency — exact at f64 up to ~1e-15 reassociation (the FITC
    increment is an order-free sum over sample columns).

    Implementation: kernel-gram evaluation stays in jax (the package's
    own ``cross_gram``/``kernel_fn``, so the reference can never drift
    from the production kernel semantics — including mixture families),
    while the two O(M^2 N) GEMMs, the lambda/weight column math, and the
    accumulation run in numpy/OpenBLAS f64. Measured on the 1-core host:
    XLA:CPU runs these f64 GEMMs at ~12 GFLOP/s (and its f64 trsm
    single-threaded: >30 min for the full 983-pose replay); OpenBLAS
    dgemm at ~27 GFLOP/s. The L_inv GEMM vs the parity trsm differs by
    ~cond(K_M)*eps64 ~ 1e-11 — eight orders below the 1e-3 gate."""
    import jax
    import jax.numpy as jnp
    import scipy.linalg

    from erl_gaussian_process_tpu.kernels import cross_gram, kernel_fn

    if not jax.config.jax_enable_x64:
        raise RuntimeError("replay_f64 requires jax_enable_x64")
    f64 = np.float64
    B, n, d = dx.shape
    p64 = np.asarray(pseudo, f64)
    m = p64.shape[0]
    km = np.asarray(kernel_fn(kernel)(jnp.asarray(p64), jnp.asarray(p64),
                                      f64(scale)))
    L_km = np.linalg.cholesky(km)
    L_inv = scipy.linalg.solve_triangular(L_km, np.eye(m), lower=True)
    qm = km.copy()
    alpha = np.zeros((m, dy.shape[-1]))

    gram = jax.jit(lambda xs: cross_gram(kernel, jnp.asarray(p64), xs,
                                         f64(scale)))
    c = int(poses_per_chunk)
    for i0 in range(0, B, c):
        xs = np.asarray(dx[i0:i0 + c], f64).reshape(-1, d)
        ys = np.asarray(dy[i0:i0 + c], f64).reshape(-1, dy.shape[-1])
        ms = np.asarray(dm[i0:i0 + c], bool).reshape(-1)
        kmn = np.asarray(gram(jnp.asarray(xs)))            # (M, nc)
        beta = L_inv @ kmn
        # identical column math to fitc_delta (incl. the lambda clamp)
        lam = np.maximum(1.0 - np.einsum("mn,mn->n", beta, beta), 0.0)
        w = np.where(ms, 1.0 / (lam + f64(var)), 0.0)
        ksc = kmn * w[None, :]
        qm += ksc @ kmn.T
        alpha += ksc @ np.where(ms[:, None], ys, 0.0)
    L_qm = np.linalg.cholesky(qm)
    a = scipy.linalg.solve_triangular(L_qm, alpha, lower=True)
    a = scipy.linalg.solve_triangular(L_qm.T, a, lower=False)
    kq = np.asarray(gram(jnp.asarray(np.asarray(grid, f64))))  # (M, q)
    return (kq.T @ a)[:, 0]


def drift_metric(lo_test, lo_ref):
    """max |lo_test - lo_ref| / max |lo_ref| — the relative log-odds
    drift of a replayed posterior against its f64 reference."""
    lo_test = np.asarray(lo_test, np.float64)
    lo_ref = np.asarray(lo_ref, np.float64)
    return float(np.abs(lo_test - lo_ref).max() / np.abs(lo_ref).max())
