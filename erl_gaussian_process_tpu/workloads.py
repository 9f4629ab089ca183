"""Canonical benchmark/demo workload definitions.

The replica-hotel-0 trajectory replay is the project's north-star
workload (BASELINE.json: the reference's own headline is SPGP occupancy
mapping over this trajectory, reference src/spgp_occupancy_map.cpp:80-121
driven by data/replica-hotel-0-traj.txt). Its configuration — bounding
box margins, mesh, kernel scale, pseudo grid, depth-ray grid — must be
identical wherever the workload is run, or the bench and the example
silently measure different problems. This module is the single source of
truth; bench.py and examples/replica_hotel_3d.py both consume it.
"""

import os

import numpy as np

from .geometry import GridMapInfo3D
from .geometry.simulators import replica_hotel_like_mesh
from .kernels import KernelSetting
from .models.sparse_pseudo_input_gp import SpGpSetting
from .models.spgp_occupancy_map import SpGpOccupancyMapSetting

_REPO_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          os.pardir)
HOTEL0_TRAJ = os.path.join(_REPO_ROOT, "data", "replica-hotel-0-traj.txt")


def load_hotel0_trajectory(path=HOTEL0_TRAJ, n_poses=None):
    """983 rows of a row-major 4x4 pose -> (n, 4, 4). Falls back to a
    synthetic loop when the vendored trajectory is absent."""
    if os.path.exists(path):
        poses = np.loadtxt(path).reshape(-1, 4, 4)
    else:
        t = np.linspace(0, 2 * np.pi, 983, endpoint=False)
        poses = np.tile(np.eye(4), (983, 1, 1))
        poses[:, 0, 3] = 1.5 * np.cos(t)
        poses[:, 1, 3] = 1.0 * np.sin(t)
    return poses[:n_poses] if n_poses is not None else poses


def hotel0_setup(poses):
    """The fixed workload configuration for a pose set: bounding box,
    procedural mesh (the reference snapshot ships the trajectory but not
    the mesh assets), SPGP map setting, pseudo-point grid, and the
    depth-camera-style ray grid (sensor frame, forward = +z).

    Returns (setting, pseudo, lo, hi, mesh, d_local)."""
    pos = poses[:, :3, 3]
    lo = pos.min(axis=0) - 1.5
    hi = pos.max(axis=0) + 1.5
    mesh = replica_hotel_like_mesh(lo + 0.2, hi - 0.2)

    setting = SpGpOccupancyMapSetting(
        sp_gp=SpGpSetting(
            kernel_type="matern32",
            kernel=KernelSetting(x_dim=3, scale=float((hi - lo).max()) / 16.0),
            max_num_samples=2000),
        min_distance=0.05, max_distance=30.0,
        free_points_per_meter=2.0, free_sampling_margin=0.02,
        logodd_free=-1.0, logodd_occupied=1.0, logodd_variance=1e-4)

    pseudo = GridMapInfo3D(lo, hi, [11, 11, 9]).generate_meter_coordinates().T

    u = np.linspace(-0.45, 0.45, 24)
    v = np.linspace(-0.3, 0.3, 16)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    d_local = np.stack([uu.ravel(), vv.ravel(), np.ones(uu.size)], axis=-1)
    d_local /= np.linalg.norm(d_local, axis=-1, keepdims=True)

    return setting, pseudo, lo, hi, mesh, d_local


def hotel0_query_grid(lo, hi, shape=(16, 16, 8), margin=0.3):
    """The drift gate's FIXED posterior query grid: a deterministic
    lattice inset ``margin`` from the workload bounding box, (prod(shape),
    3) float32. Both the f32 chip posterior and the f64 CPU reference are
    evaluated here (bench.py / benchmarks/drift_check.py)."""
    axes = [np.linspace(lo[i] + margin, hi[i] - margin, shape[i])
            for i in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    return g.astype(np.float32)


def hotel0_scan(mesh, pose, d_local, max_distance):
    """Raycast one pose's depth-style scan. Returns (sensor, points, hit):
    world-frame endpoints with misses collapsed onto the sensor origin
    (masked out by ``hit``)."""
    R, t = pose[:3, :3], pose[:3, 3]
    dirs = d_local @ R.T
    rng = mesh.cast_rays(t, dirs)
    hit = np.isfinite(rng) & (rng <= max_distance)
    pts = t + dirs * np.where(hit, rng, 0.0)[:, None]
    return t, pts, hit
