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

from erl_gaussian_process_tpu.geometry import Aabb
from erl_gaussian_process_tpu.models.spgp_occupancy_map import SpGpOccupancyMap
from erl_gaussian_process_tpu.workloads import (
    hotel0_scan,
    hotel0_setup,
    load_hotel0_trajectory,
)


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 983
    poses = load_hotel0_trajectory(n_poses=n_poses)
    pos = poses[:, :3, 3]
    # the workload definition (bbox, mesh, setting, pseudo grid, ray grid)
    # is shared verbatim with bench.py's headline measurement
    setting, pseudo, lo, hi, mesh, d_local = hotel0_setup(poses)
    omap = SpGpOccupancyMap(setting, pseudo, Aabb.from_min_max(lo, hi),
                            seed=0, dtype=np.float32, free_slots_per_ray=12)

    all_hits = []
    t0 = time.perf_counter()
    for T in poses:
        t, pts, hit = hotel0_scan(mesh, T, d_local, setting.max_distance)
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
