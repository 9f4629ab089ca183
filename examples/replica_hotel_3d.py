"""Replica hotel-0 trajectory replay: 3D SPGP occupancy mapping at
production scale.

The reference ships the 983-pose hotel-0 trajectory
(data/replica-hotel-0-traj.txt: 983 rows of a row-major 4x4 pose) but its
mesh assets are absent from the snapshot (.MISSING_LARGE_BLOBS), so — as in
the reference's own situation — ranges must come from elsewhere: this demo
raycasts a procedural hotel-room triangle mesh (furnished shell sized to
the trajectory's bounding box; geometry.simulators.replica_hotel_like_mesh)
with the host Moller-Trumbore raycaster — the same ground-truth mechanism
as the reference's Open3D RaycastingScene path
(test_range_sensor_gp_3d.cpp:59-109). The full pipeline is the real thing:
per-pose depth-style scans -> fused dataset-sampling + FITC updates -> 3D
posterior.

Usage:  JAX_PLATFORMS='' python examples/replica_hotel_3d.py [n_poses]
"""

import os
import sys
import time

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

from erl_gaussian_process_tpu.geometry import Aabb, GridMapInfo3D
from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import SpGpSetting
from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
    SpGpOccupancyMap,
    SpGpOccupancyMapSetting,
)

HERE = os.path.dirname(os.path.abspath(__file__))
TRAJ = os.path.join(HERE, os.pardir, "data", "replica-hotel-0-traj.txt")


def load_trajectory(path=TRAJ):
    if not os.path.exists(path):
        # fall back to a synthetic loop if the reference data is absent
        t = np.linspace(0, 2 * np.pi, 983, endpoint=False)
        poses = np.tile(np.eye(4), (983, 1, 1))
        poses[:, 0, 3] = 1.5 * np.cos(t)
        poses[:, 1, 3] = 1.0 * np.sin(t)
        poses[:, 2, 3] = 0.0
        return poses
    raw = np.loadtxt(path)
    return raw.reshape(-1, 4, 4)


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 983
    poses = load_trajectory()[:n_poses]
    pos = poses[:, :3, 3]
    lo = pos.min(axis=0) - 1.5
    hi = pos.max(axis=0) + 1.5

    from erl_gaussian_process_tpu.geometry.simulators import (
        replica_hotel_like_mesh,
    )
    mesh = replica_hotel_like_mesh(lo + 0.2, hi - 0.2)

    setting = SpGpOccupancyMapSetting(
        sp_gp=SpGpSetting(kernel_type="matern32",
                          kernel=KernelSetting(x_dim=3,
                                               scale=float((hi - lo).max())
                                               / 16.0),
                          max_num_samples=2000),
        min_distance=0.05, max_distance=30.0,
        free_points_per_meter=2.0, free_sampling_margin=0.02,
        logodd_free=-1.0, logodd_occupied=1.0, logodd_variance=1e-4)

    pseudo = GridMapInfo3D(lo, hi, [11, 11, 9]) \
        .generate_meter_coordinates().T      # (3, 1089)
    omap = SpGpOccupancyMap(setting, pseudo, Aabb.from_min_max(lo, hi),
                            seed=0, dtype=np.float32, free_slots_per_ray=12)

    # depth-camera-ish ray grid in the sensor frame (forward = +z)
    u = np.linspace(-0.45, 0.45, 24)
    v = np.linspace(-0.3, 0.3, 16)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    d_local = np.stack([uu.ravel(), vv.ravel(), np.ones(uu.size)], axis=-1)
    d_local /= np.linalg.norm(d_local, axis=-1, keepdims=True)

    all_hits = []
    t0 = time.perf_counter()
    for T in poses:
        R, t = T[:3, :3], T[:3, 3]
        dirs = d_local @ R.T
        rng = mesh.cast_rays(t, dirs)
        hit = np.isfinite(rng) & (rng <= setting.max_distance)
        pts = t + dirs * np.where(hit, rng, 0.0)[:, None]
        omap.update(t.astype(np.float32), pts.astype(np.float32), hit)
        all_hits.append(pts[hit])
    # forced scalar fetch = the honest execution barrier on this backend
    float(np.asarray(omap.sp_gp.state.qm[0, 0]))
    dt = time.perf_counter() - t0
    print(f"{len(poses)} pose updates in {dt:.2f}s "
          f"({len(poses) / dt:.1f} updates/s)")

    # quality at OBSERVED surface (the accumulated hit points) vs free space
    rng2 = np.random.default_rng(0)
    hits = np.concatenate(all_hits)
    hits = hits[rng2.choice(len(hits), 2000, replace=False)]
    lo_surf, _ = omap.predict(hits.astype(np.float32))
    lo_traj, _ = omap.predict(pos.astype(np.float32))
    print("observed-surface occupied frac: %.3f   trajectory free frac: %.3f"
          % ((lo_surf > 0).mean(), (lo_traj < 0).mean()))


if __name__ == "__main__":
    main()
