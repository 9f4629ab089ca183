"""Plumbing test for the bench's numerical drift gate (bench.py
hotel0_drift_gate + benchmarks/drift_check.py child + utils/drift):
a small hotel-0 replay's f32 posterior must sit within the 1e-3 gate of
the exact f64 child replay, end to end through the subprocess."""

import numpy as np


def test_hotel0_drift_gate_small():
    import bench

    sensors, pts, masks, hits, traj, setting, pseudo, lo, hi = \
        bench.make_hotel0_workload(12)
    dg = bench.hotel0_drift_gate(setting, pseudo, lo, hi,
                                 sensors, pts, masks)
    drift = dg["alg_drift_vs_f64"]
    assert 0.0 <= drift <= bench.DRIFT_GATE_MAX, drift
    assert np.isfinite(drift)
    assert np.isfinite(dg["chip_drift_vs_f64"])
    assert 0.0 <= dg["chip_sign_agreement_confident"] <= 1.0


def test_replay_f64_matches_f64_pipeline_directly():
    """utils/drift.replay_f64 with chunking must equal an unchunked f64
    replay to ~1e-12 (order-free FITC sum)."""
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        spgp_init,
        spgp_predict,
        spgp_prepare,
        spgp_update,
    )
    from erl_gaussian_process_tpu.utils.drift import replay_f64

    rng = np.random.default_rng(0)
    pseudo = rng.uniform(-1, 1, (24, 2))
    B, n = 7, 40
    dx = rng.uniform(-1, 1, (B, n, 2)).astype(np.float32)
    dy = np.where(rng.uniform(size=(B, n, 1)) < 0.5, 1.0, -1.0
                  ).astype(np.float32)
    dm = rng.uniform(size=(B, n)) < 0.8
    grid = rng.uniform(-1, 1, (50, 2)).astype(np.float32)

    lo_chunked = replay_f64(pseudo, 0.4, "matern32", dx, dy, dm, 1e-4,
                            grid, poses_per_chunk=3)

    st = spgp_init(jnp.asarray(pseudo), np.float64(0.4), kernel="matern32")
    for i in range(B):
        st = spgp_update(st, jnp.asarray(dx[i], np.float64),
                         jnp.asarray(dy[i], np.float64),
                         jnp.full((n,), 1e-4), jnp.asarray(dm[i]),
                         np.float64(0.4), kernel="matern32")
    L, a = spgp_prepare(st)
    mean, _, _ = spgp_predict(st, L, a, jnp.asarray(grid, np.float64),
                              np.float64(0.4), kernel="matern32",
                              with_var=False)
    np.testing.assert_allclose(lo_chunked, np.asarray(mean[:, 0]),
                               rtol=1e-9, atol=1e-10)
