"""Long-horizon f32 conditioning gate (VERDICT r4 next #2): the 12-pose
f32-vs-f64 posterior check promoted to 200 poses at the PRODUCTION config
(matern32 scale 0.18, 961 pseudo points, 2000-sample updates at
logodd_variance 1e-4) so conditioning decay is caught in CI, not only in
the bench. Measured while designing: max relative log-odds drift 1.6e-4
at 200 poses (mean 4.1e-6, sign agreement 1.0, cond(Q_M) ~ 8.6e5).

The f64 reference runs through utils.drift.replay_f64 — the same exact
replay the bench's 983-pose drift gate uses (f64 L_inv GEMM: XLA:CPU's
f64 trsm is single-threaded and would triple the test's runtime for a
~1e-11 difference)."""

import numpy as np
import pytest

N_POSES = 200
NMAX = 2048  # production update padding (max_num_samples 2000 -> 256-grain)


def _scan_batches():
    from erl_gaussian_process_tpu.geometry.simulators import (
        Lidar2D,
        reference_space_2d,
        reference_trajectory_2d,
    )

    space = reference_space_2d()
    lidar = Lidar2D(Lidar2D.Setting(min_angle=-2.356, max_angle=2.356,
                                    num_lines=135), space)
    rng = np.random.default_rng(0)
    dx = np.zeros((N_POSES, NMAX, 2), np.float32)
    dy = np.zeros((N_POSES, NMAX, 1), np.float32)
    dm = np.zeros((N_POSES, NMAX), bool)
    for i, pose in enumerate(reference_trajectory_2d(N_POSES)):
        r = lidar.scan(pose[2], pose[:2])
        c, sn = np.cos(pose[2]), np.sin(pose[2])
        dirs = lidar.ray_directions_in_frame() @ np.array([[c, -sn],
                                                           [sn, c]]).T
        hit = np.isfinite(r)
        pts = (pose[:2] + dirs * np.where(hit, r, 0.0)[:, None])[hit]
        t = rng.uniform(0.05, 0.95, (len(pts), 4))
        free = (pose[:2][None, :]
                + (pts - pose[:2][None, :])[:, None, :]
                * t[:, :, None]).reshape(-1, 2)
        X = np.concatenate([pts, free])[:NMAX]
        y = np.concatenate([np.ones(len(pts)),
                            -np.ones(len(free))])[:NMAX, None]
        dx[i, :len(X)] = X
        dy[i, :len(X)] = y
        dm[i, :len(X)] = True
    return dx, dy, dm


def test_200_pose_production_f32_tracks_f64(caplog):
    import logging

    import jax.numpy as jnp

    from erl_gaussian_process_tpu.geometry import GridMapInfo2D
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        spgp_init,
        spgp_predict,
        spgp_prepare,
        spgp_update,
    )
    from erl_gaussian_process_tpu.utils.drift import (
        drift_metric,
        replay_f64,
    )

    dx, dy, dm = _scan_batches()
    pseudo = GridMapInfo2D([-3, -3], [3, 3], [31, 31]) \
        .generate_meter_coordinates()                      # (961, 2)
    grid = GridMapInfo2D([-2.5, -2.5], [2.5, 2.5], [31, 31]) \
        .generate_meter_coordinates().astype(np.float32)
    scale, var = 0.18, 1e-4

    # f32 pipeline: the production update path (spgp_update, L_inv GEMM)
    f32 = np.float32
    st = spgp_init(jnp.asarray(pseudo.astype(f32)), f32(scale),
                   kernel="matern32")
    vv = jnp.full((NMAX,), f32(var))
    for i in range(N_POSES):
        st = spgp_update(st, jnp.asarray(dx[i]), jnp.asarray(dy[i]), vv,
                         jnp.asarray(dm[i]), f32(scale), kernel="matern32")
    with caplog.at_level(logging.INFO, "erl_gaussian_process_tpu"):
        L_qm, a = spgp_prepare(st)
        mean, _, _ = spgp_predict(st, L_qm, a, jnp.asarray(grid),
                                  f32(scale), kernel="matern32",
                                  with_var=False)
    lo32 = np.asarray(mean[:, 0], np.float64)
    assert np.isfinite(lo32).all()

    lo64 = replay_f64(pseudo, scale, "matern32", dx, dy, dm, var, grid)

    drift = drift_metric(lo32, lo64)
    assert drift < 1e-3, drift
    assert np.mean(np.sign(lo32) == np.sign(lo64)) > 0.999
    scale_ref = np.abs(lo64).max()
    assert np.abs(lo32 - lo64).mean() / scale_ref < 1e-4
