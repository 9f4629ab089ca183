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

    The per-column solve uses the f64 ``L_inv`` GEMM rather than the f64
    parity path's triangular solve: XLA:CPU's f64 trsm runs
    single-threaded (measured: a 983-pose replay took >30 min through
    trsm vs ~1 min through dgemm), and at f64 the two differ by
    ~cond(K_M)*eps64 ~ 1e-11 — five orders below the 1e-3 gate."""
    import jax
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.models.gp_core import kahan_add
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpState,
        fitc_delta,
        spgp_init,
        spgp_predict,
        spgp_prepare,
    )

    if not jax.config.jax_enable_x64:
        raise RuntimeError("replay_f64 requires jax_enable_x64")
    f64 = np.float64
    B, n, d = dx.shape
    st = spgp_init(jnp.asarray(np.asarray(pseudo, f64)), f64(scale),
                   kernel=kernel)

    @jax.jit
    def step(st, xs, ys, vs, ms):
        dq, da = fitc_delta(st.pseudo, st.L_km, xs, ys, vs, ms,
                            f64(scale), kernel=kernel, L_inv=st.L_inv)
        qm, qm_c = kahan_add(st.qm, st.qm_c, dq)
        alpha, alpha_c = kahan_add(st.alpha, st.alpha_c, da)
        return SpGpState(pseudo=st.pseudo, L_km=st.L_km, L_inv=st.L_inv,
                         qm=qm, alpha=alpha, qm_c=qm_c, alpha_c=alpha_c)

    c = int(poses_per_chunk)
    for i0 in range(0, B, c):
        xs = np.asarray(dx[i0:i0 + c], f64).reshape(-1, d)
        ys = np.asarray(dy[i0:i0 + c], f64).reshape(-1, dy.shape[-1])
        ms = np.asarray(dm[i0:i0 + c], bool).reshape(-1)
        vs = np.full(xs.shape[0], f64(var))
        st = step(st, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                  jnp.asarray(ms))
    L_qm, a = spgp_prepare(st)
    mean, _, _ = spgp_predict(st, L_qm, a,
                              jnp.asarray(np.asarray(grid, f64)),
                              f64(scale), kernel=kernel, with_var=False)
    return np.asarray(mean[:, 0])


def drift_metric(lo_test, lo_ref):
    """max |lo_test - lo_ref| / max |lo_ref| — the relative log-odds
    drift of a replayed posterior against its f64 reference."""
    lo_test = np.asarray(lo_test, np.float64)
    lo_ref = np.asarray(lo_ref, np.float64)
    return float(np.abs(lo_test - lo_ref).max() / np.abs(lo_ref).max())
