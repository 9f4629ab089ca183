"""2D online occupancy mapping demo — the reference's
test_spgp_occupancy_map_2d.cpp scenario end to end, with a headless
matplotlib artifact instead of the reference's OpenCV windows.

Usage:  JAX_PLATFORMS=cpu python examples/occupancy_mapping_2d.py
        (or JAX_PLATFORMS='' on a TPU host)
Writes occupancy_map_2d.png next to this script.
"""

import os
import time

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

from erl_gaussian_process_tpu.geometry import Aabb, GridMapInfo2D
from erl_gaussian_process_tpu.geometry.simulators import (
    Lidar2D,
    reference_space_2d,
    reference_trajectory_2d,
)
from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
    SpGpOccupancyMap,
    SpGpOccupancyMapSetting,
)
from erl_gaussian_process_tpu.utils import from_yaml_file

HERE = os.path.dirname(os.path.abspath(__file__))


def _cli():
    # mirrors the reference test's boost::program_options CLI
    # (test_spgp_occupancy_map_2d.cpp:385-401: --hinged-grid-size,
    # --test-grid-size, --config-file)
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hinged-grid-size", type=int, default=31,
                    help="pseudo-point grid side length")
    ap.add_argument("--test-grid-size", type=int, default=240,
                    help="posterior raster side length")
    ap.add_argument("--config-file",
                    default=os.path.join(HERE, "..", "config",
                                         "spgp_occupancy_map_2d.yaml"),
                    help="SpGpOccupancyMapSetting YAML (reference schema)")
    ap.add_argument("--n-poses", type=int, default=50)
    return ap.parse_args()


def main():
    args = _cli()
    setting = from_yaml_file(SpGpOccupancyMapSetting, args.config_file)
    m = args.hinged_grid_size
    pseudo = GridMapInfo2D([-3, -3], [3, 3], [m, m]) \
        .generate_meter_coordinates().T
    omap = SpGpOccupancyMap(setting, pseudo,
                            Aabb.from_min_max([-3, -3], [3, 3]),
                            seed=0, dtype=np.float32)

    space = reference_space_2d()
    lidar = Lidar2D(Lidar2D.Setting(min_angle=-2.356, max_angle=2.356,
                                    num_lines=135), space)
    traj = reference_trajectory_2d(args.n_poses)

    def scan_of(pose):
        r = lidar.scan(pose[2], pose[:2])
        c, s = np.cos(pose[2]), np.sin(pose[2])
        dirs = lidar.ray_directions_in_frame() @ np.array([[c, -s], [s, c]]).T
        hit = np.isfinite(r)
        pts = pose[:2] + dirs * np.where(hit, r, 0.0)[:, None]
        return pose[:2].astype(np.float32), pts.astype(np.float32), hit

    def sync():
        # forced scalar fetch — the honest execution barrier on this backend
        return float(np.asarray(omap.sp_gp.state.qm[0, 0]))

    omap.update(*scan_of(traj[0]))   # warm-up: compile
    sync()
    t0 = time.perf_counter()
    for pose in traj:
        omap.update(*scan_of(pose))
    sync()
    dt = time.perf_counter() - t0
    print(f"{len(traj)} updates in {dt:.2f}s ({len(traj) / dt:.0f} Hz, "
          "post-compile)")

    # rasterize the posterior
    tg = args.test_grid_size
    g = GridMapInfo2D([-3, -3], [3, 3], [tg, tg])
    q = g.generate_meter_coordinates().astype(np.float32)
    logodd, _ = omap.predict(q)
    img = logodd.reshape(tg, tg)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plot")
        return
    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.imshow(img.T, origin="lower", extent=[-3, 3, -3, 3],
                   cmap="RdBu_r", vmin=-8, vmax=8)
    ax.plot(traj[:, 0], traj[:, 1], "k--", lw=1, label="trajectory")
    sv = space.surface_points(0.05)
    ax.plot(sv[:, 0], sv[:, 1], ".", ms=1, color="lime", label="true surface")
    ax.legend(loc="upper right")
    ax.set_title("SPGP occupancy map (logodds)")
    fig.colorbar(im, ax=ax, shrink=0.8)
    out = os.path.join(HERE, "occupancy_map_2d.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
