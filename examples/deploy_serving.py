"""Deployment-artifact walkthrough: export the fused occupancy-map update
and the prepared-posterior predict as portable StableHLO blobs, then run a
50-pose mapping episode THROUGH THE ARTIFACTS — the way a serving host
would, with no model tracing in the serving loop.

Usage:  JAX_PLATFORMS=cpu python examples/deploy_serving.py
        (artifacts exported here carry tpu+cpu lowerings in one blob; a
        TPU serving fleet loads the same bytes)
"""

import os
import sys

# run from a checkout without installing the package
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

# honor JAX_PLATFORMS=cpu even when a TPU plugin overrides it
# programmatically at interpreter start (this image's remote-TPU
# environment does): force the platform via jax.config before any
# backend initializes.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from erl_gaussian_process_tpu.geometry.simulators import (
    Lidar2D,
    reference_space_2d,
    reference_trajectory_2d,
)
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
    spgp_init,
    spgp_prepare,
)
from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
    SpGpOccupancyMapSetting,
)
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import SpGpSetting
from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.utils.deploy import (
    export_map_predict_step,
    export_map_update_step,
    load_fn,
)

N_RAYS = 135
SLOTS = 8
GRID = 21


def main():
    setting = SpGpOccupancyMapSetting(
        sp_gp=SpGpSetting(kernel_type="matern32",
                          kernel=KernelSetting(x_dim=2, scale=0.25),
                          max_num_samples=1024),
        min_distance=0.0, max_distance=30.0, free_points_per_meter=2.0,
        free_sampling_margin=0.02, logodd_free=-1.0, logodd_occupied=1.0,
        logodd_variance=1e-4)

    # --- build side: export once, ship bytes -----------------------------
    update_blob = export_map_update_step(
        setting, n_pseudo=GRID * GRID, n_rays=N_RAYS, free_slots=SLOTS)
    predict_blob = export_map_predict_step(
        n_pseudo=GRID * GRID, n_queries=None)   # symbolic query batch
    print(f"artifacts: update {len(update_blob)/1e3:.1f} kB, "
          f"predict {len(predict_blob)/1e3:.1f} kB (tpu+cpu lowerings)")

    # --- serving side: load bytes, run the episode ------------------------
    update = load_fn(update_blob)
    predict = load_fn(predict_blob)

    c = np.linspace(-3, 3, GRID, dtype=np.float32)
    pv, qv = np.meshgrid(c, c, indexing="ij")
    state = spgp_init(
        jnp.asarray(np.stack([pv.ravel(), qv.ravel()], axis=-1)),
        np.float32(0.25), kernel="matern32")

    space = reference_space_2d()
    lidar = Lidar2D(Lidar2D.Setting(min_angle=-2.35, max_angle=2.35,
                                    num_lines=N_RAYS), space)
    key = jax.random.PRNGKey(0)
    lo = jnp.asarray([-3.0, -3.0], jnp.float32)
    hi = jnp.asarray([3.0, 3.0], jnp.float32)
    for k, pose in enumerate(reference_trajectory_2d(50)):
        r = lidar.scan(pose[2], pose[:2])
        cth, sth = np.cos(pose[2]), np.sin(pose[2])
        dirs = lidar.ray_directions_in_frame() @ np.array(
            [[cth, -sth], [sth, cth]], np.float32).T
        hit = np.isfinite(r)
        pts = (pose[:2] + dirs * np.where(hit, r, 0.0)[:, None]).astype(
            np.float32)
        state, n_used = update(state, key, jnp.int32(k + 1),
                               jnp.asarray(pose[:2], jnp.float32),
                               jnp.asarray(pts), jnp.asarray(hit), lo, hi,
                               np.float32(0.25))

    L_qm, a = spgp_prepare(state)
    surf = space.surface_points(0.05).astype(np.float32)
    lo_surf, _ = predict(state, L_qm, a, jnp.asarray(surf), np.float32(0.25))
    traj = reference_trajectory_2d(50)[:, :2].astype(np.float32)
    lo_traj, _ = predict(state, L_qm, a, jnp.asarray(traj), np.float32(0.25))
    occ = float((np.asarray(lo_surf)[:, 0] > 0).mean())
    free = float((np.asarray(lo_traj)[:, 0] < 0).mean())
    print(f"map through artifacts: surface occupied {occ:.1%}, "
          f"trajectory free {free:.1%}")
    assert occ > 0.9 and free > 0.95
    print("deploy OK")


if __name__ == "__main__":
    main()
