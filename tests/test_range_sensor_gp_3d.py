"""RangeSensorGaussianProcess3D tests (the reference's
test_range_sensor_gp_3d.cpp needs a Replica mesh absent from the tree —
.MISSING_LARGE_BLOBS — and is excluded from its default build; we use an
analytic scene: a sphere room around the sensor with range modulation)."""

import numpy as np
import pytest

from erl_gaussian_process_tpu.geometry.frames_3d import (
    DepthFrame3DSetting,
    LidarFrame3DSetting,
)
from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.models import RangeSensorGaussianProcess3D
from erl_gaussian_process_tpu.models.mapping import MappingSetting, MappingType
from erl_gaussian_process_tpu.models.range_sensor_gp_3d import (
    RangeSensorGP3DSetting,
)
from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting


def _wavy_room_ranges(dirs):
    """Smooth analytic range field: a wavy sphere around the origin."""
    az = np.arctan2(dirs[..., 1], dirs[..., 0])
    el = np.arctan2(dirs[..., 2], np.hypot(dirs[..., 0], dirs[..., 1]))
    return 5.0 + 0.5 * np.sin(3 * az) * np.cos(2 * el)


def _lidar_setting(nr=64, nc=33):
    return RangeSensorGP3DSetting(
        row_group_size=12, row_overlap_size=4, row_margin=0,
        col_group_size=12, col_overlap_size=4, col_margin=0,
        min_num_samples_per_group=10,
        sensor_range_var=1e-4, max_valid_range_var=0.1,
        sensor_frame_type="lidar",
        sensor_frame=LidarFrame3DSetting(
            valid_range_min=0.1, valid_range_max=40.0,
            azimuth_min=-np.pi, azimuth_max=np.pi,
            elevation_min=-0.6, elevation_max=0.6,
            num_azimuth_lines=nr, num_elevation_lines=nc),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=2, scale=0.5)),
        mapping=MappingSetting(type=MappingType.IDENTITY))


def test_lidar3d_scan_fit(artifact):
    """Port of the reference's lidar test shape (271x91 rays, OU kernel,
    MSE <= 4.2e-4, test_range_sensor_gp_3d.cpp:150-151) on the analytic
    scene."""
    gp = RangeSensorGaussianProcess3D(_lidar_setting())
    dirs = gp.sensor_frame.ray_directions_in_frame()
    ranges = _wavy_room_ranges(dirs)
    assert gp.train(np.eye(3), np.zeros(3), ranges)

    # query the training directions back (world == local here)
    q = dirs.reshape(-1, 3)
    res = gp.test(q, directions_are_local=True, un_map=True)
    pred, valid = res.get_mean()
    assert valid.mean() > 0.9
    mse = np.mean((pred[valid] - ranges.reshape(-1)[valid]) ** 2)
    assert mse < 4.2e-4, mse
    var, vvalid = res.get_variance()
    assert np.all(np.isfinite(var[vvalid]))

    def draw(ax):
        shp = ranges.shape
        err = np.where(valid, pred - ranges.reshape(-1), np.nan)
        im = ax.imshow(err.reshape(shp).T, origin="lower", cmap="RdBu_r",
                       vmin=-0.06, vmax=0.06, aspect="auto")
        ax.set_xlabel("azimuth index")
        ax.set_ylabel("elevation index")
        ax.set_title(f"RangeSensorGP3D lidar fit error [m] "
                     f"(MSE {mse:.1e})")
        ax.figure.colorbar(im, ax=ax, shrink=0.8)

    artifact("range_sensor_gp_3d_lidar_error", draw)


def test_depth_frame_fit():
    """Depth-camera frame variant (reference: DepthFrame3D path,
    test_range_sensor_gp_3d.cpp:236-342, MSE <= 2.2e-4)."""
    setting = _lidar_setting()
    setting.sensor_frame_type = "depth"
    setting.sensor_frame = DepthFrame3DSetting(
        valid_range_min=0.1, valid_range_max=40.0,
        image_height=48, image_width=64,
        fx=40.0, fy=40.0, cx=32.0, cy=24.0)
    setting.gp.kernel.scale = 8.0  # pixel coordinates
    gp = RangeSensorGaussianProcess3D(setting)
    dirs = gp.sensor_frame.ray_directions_in_frame()
    ranges = _wavy_room_ranges(dirs)
    assert gp.train(np.eye(3), np.zeros(3), ranges)

    q = dirs.reshape(-1, 3)
    pred, valid = gp.test(q, directions_are_local=True, un_map=True).get_mean()
    assert valid.mean() > 0.9
    mse = np.mean((pred[valid] - ranges.reshape(-1)[valid]) ** 2)
    assert mse < 2.2e-4, mse


def test_world_frame_and_compute_occ():
    gp = RangeSensorGaussianProcess3D(_lidar_setting())
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    dirs = gp.sensor_frame.ray_directions_in_frame()
    ranges = _wavy_room_ranges(dirs)
    assert gp.train(R, np.array([1.0, 2.0, 0.5]), ranges)

    # world-frame queries
    world_dirs = dirs.reshape(-1, 3)[::37] @ R.T
    pred, valid = gp.test(world_dirs, directions_are_local=False,
                          un_map=True).get_mean()
    truth = ranges.reshape(-1)[::37]
    assert np.abs(pred[valid] - truth[valid]).mean() < 0.05

    # occupancy in the local frame: in front of / behind the surface
    d_loc = dirs.reshape(-1, 3)[::53]
    r_loc = ranges.reshape(-1)[::53]
    near = d_loc * (0.6 * r_loc)[:, None]
    far = d_loc * (1.3 * r_loc)[:, None]
    v1, _, _, occ_near = gp.compute_occ(near)
    v2, _, _, occ_far = gp.compute_occ(far)
    assert v1.any() and v2.any()
    assert occ_near[v1].max() < -0.9
    assert occ_far[v2].min() > 0.9


# ---- reference-comparable mesh-raycast ground truth ------------------------
# Protocol ported from test/gtest/test_range_sensor_gp_3d.cpp:33-151: scan a
# triangle mesh from its center with a random orientation, train, then test
# 10000 uniform random sphere directions against raycast ground truth. The
# Replica .ply meshes are absent from the snapshot (.MISSING_LARGE_BLOBS);
# geometry.simulators.reference_room_mesh_3d stands in. MSE gates are the
# reference's own: <= 4.2e-4 (lidar), <= 2.2e-4 (depth).

def _euler(r, p, y):
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), \
        np.cos(y), np.sin(y)
    return (np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
            @ np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
            @ np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]]))


def _random_pose_and_queries(seed=0, n_test=10000):
    rng = np.random.default_rng(seed)
    rpy = rng.uniform(-1, 1, 3) * np.array([np.pi / 4, np.pi / 4, np.pi])
    R = _euler(*rpy)
    az = rng.uniform(-np.pi, np.pi, n_test)
    el = rng.uniform(-np.pi / 2, np.pi / 2, n_test)
    dirs = np.stack([np.cos(az) * np.cos(el), np.sin(az) * np.cos(el),
                     np.sin(el)], axis=-1)
    return R, dirs


def test_lidar3d_mesh_reference_protocol():
    """Reference lidar protocol: 271x91 scan (az +-3pi/4, el +-pi/2), OU
    kernel, group 10, inverse-sqrt mapping; MSE gate 4.2e-4 (reference
    observed 4.14e-4 on Replica office-1,
    test_range_sensor_gp_3d.cpp:150-151). Measured here: ~1.4e-4."""
    from erl_gaussian_process_tpu.geometry.simulators import (
        reference_room_mesh_3d,
    )

    mesh = reference_room_mesh_3d()
    R, dirs_test = _random_pose_and_queries()
    t = mesh.center()
    setting = RangeSensorGP3DSetting(
        row_group_size=10, row_overlap_size=4, row_margin=0,
        col_group_size=10, col_overlap_size=4, col_margin=0,
        min_num_samples_per_group=10, sensor_range_var=0.01,
        max_valid_range_var=0.1, sensor_frame_type="lidar",
        sensor_frame=LidarFrame3DSetting(
            azimuth_min=-np.pi * 3 / 4, azimuth_max=np.pi * 3 / 4,
            elevation_min=-np.pi / 2, elevation_max=np.pi / 2,
            num_azimuth_lines=271, num_elevation_lines=91),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=2, scale=0.3)),
        mapping=MappingSetting(type=MappingType.INVERSE_SQRT))
    gp = RangeSensorGaussianProcess3D(setting)
    dirs_f = gp.sensor_frame.ray_directions_in_frame()
    ranges = mesh.cast_rays(t, dirs_f.reshape(-1, 3) @ R.T)
    assert np.isfinite(ranges).all()
    assert gp.train(R, t, ranges.reshape(dirs_f.shape[:2]))

    gt = mesh.cast_rays(t, dirs_test)
    pred, valid = gp.test(dirs_test, directions_are_local=False,
                          un_map=True).get_mean()
    assert valid.any()
    mse = np.mean((pred[valid] - gt[valid]) ** 2)
    assert mse <= 4.2e-4, mse


def test_depth3d_mesh_reference_protocol():
    """Reference depth-camera protocol (test_range_sensor_gp_3d.cpp:156-342):
    pinhole scan of the mesh, 10000 random sphere queries (out-of-FOV ones
    invalid), MSE gate 2.2e-4 (reference observed 2.10e-4)."""
    from erl_gaussian_process_tpu.geometry.simulators import (
        reference_room_mesh_3d,
    )

    mesh = reference_room_mesh_3d()
    R, dirs_test = _random_pose_and_queries(seed=1)
    t = mesh.center()
    setting = RangeSensorGP3DSetting(
        row_group_size=10, row_overlap_size=4, row_margin=0,
        col_group_size=10, col_overlap_size=4, col_margin=0,
        min_num_samples_per_group=10, sensor_range_var=0.01,
        max_valid_range_var=0.1, sensor_frame_type="depth",
        sensor_frame=DepthFrame3DSetting(
            valid_range_min=0.1, valid_range_max=40.0,
            image_height=120, image_width=160,
            fx=110.0, fy=110.0, cx=80.0, cy=60.0),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=2, scale=8.0)),
        mapping=MappingSetting(type=MappingType.INVERSE_SQRT))
    gp = RangeSensorGaussianProcess3D(setting)
    dirs_f = gp.sensor_frame.ray_directions_in_frame()
    ranges = mesh.cast_rays(t, dirs_f.reshape(-1, 3) @ R.T)
    assert np.isfinite(ranges).all()
    assert gp.train(R, t, ranges.reshape(dirs_f.shape[:2]))

    gt = mesh.cast_rays(t, dirs_test)
    pred, valid = gp.test(dirs_test, directions_are_local=False,
                          un_map=True).get_mean()
    assert valid.any()  # only in-FOV queries resolve
    mse = np.mean((pred[valid] - gt[valid]) ** 2)
    assert mse <= 2.2e-4, mse


def test_reduced_rank_kernel_3d_bank():
    """RR gp.kernel_type threads through the 3D partition grid (reference:
    m_reduced_rank_kernel_ on this class's TestResult,
    src/range_sensor_gp_3d.cpp:71,160): 2-D basis per partition, +||.||^2
    variances, accuracy in the same class as the exact kernel."""
    from erl_gaussian_process_tpu.kernels import ReducedRankSetting

    setting = _lidar_setting()
    setting.gp = VanillaGPSetting(
        kernel_type="reduced_rank_rbf",
        # boundary = domain extent + ~3*scale: the Hilbert basis needs
        # breathing room past the data or the box truncation biases the
        # posterior (measured: boundary [3.8, 0.75] -> MSE 3.4e-2;
        # [4.8, 2.1] -> 3.0e-6, at par with the exact RBF's 2.7e-6)
        kernel=ReducedRankSetting(x_dim=2, scale=0.5, num_basis=[24, 12],
                                  boundary=[4.8, 2.1],
                                  coord_origin=[0.0, 0.0]))
    gp = RangeSensorGaussianProcess3D(setting)
    assert gp.using_reduced_rank_kernel()
    dirs = gp.sensor_frame.ray_directions_in_frame()
    ranges = _wavy_room_ranges(dirs)
    assert gp.train(np.eye(3), np.zeros(3), ranges)
    assert gp.bank.L.shape[1] == 24 * 12  # rows = #basis
    q = dirs.reshape(-1, 3)
    res = gp.test(q, directions_are_local=True, un_map=True)
    pred, valid = res.get_mean()
    assert valid.mean() > 0.9
    mse = np.mean((pred[valid] - ranges.reshape(-1)[valid]) ** 2)
    assert mse < 1e-5, mse
    var, vvalid = res.get_variance()
    assert np.all(var[vvalid] > 0)  # +||.||^2 sign contract


def test_partition_grid_covers_frame():
    gp = RangeSensorGaussianProcess3D(_lidar_setting())
    fc = gp.sensor_frame.frame_coords().reshape(-1, 2)
    idx = gp.search_partition(fc)
    # margin rows/cols may fall outside the first/last partition coords
    assert (idx >= 0).mean() > 0.95


def test_serialization_round_trip_3d(tmp_path):
    """Write -> read -> deep-equality, the reference's checkpoint pattern
    (test_range_sensor_gp_3d.cpp serialization round-trip)."""
    import numpy as np
    from erl_gaussian_process_tpu.models.range_sensor_gp_3d import (
        RangeSensorGaussianProcess3D,
        RangeSensorGP3DSetting,
    )
    from erl_gaussian_process_tpu.geometry.frames_3d import LidarFrame3DSetting

    setting = RangeSensorGP3DSetting(
        sensor_frame_type="lidar",
        sensor_frame=LidarFrame3DSetting(
            azimuth_min=-np.pi / 2, azimuth_max=np.pi / 2,
            elevation_min=-np.pi / 6, elevation_max=np.pi / 6,
            num_azimuth_lines=40, num_elevation_lines=16),
    )
    gp = RangeSensorGaussianProcess3D(setting)
    az = np.linspace(-np.pi / 2, np.pi / 2, 40)
    el = np.linspace(-np.pi / 6, np.pi / 6, 16)
    ranges = 2.0 + 0.3 * np.sin(3 * az)[:, None] + 0.1 * np.cos(2 * el)[None, :]
    assert gp.train(np.eye(3), np.zeros(3), ranges)
    p = str(tmp_path / "gp3d.npz")
    gp.save(p)
    gp2 = RangeSensorGaussianProcess3D()
    gp2.load(p)
    assert gp == gp2
    assert gp2.get_memory_usage() > 0
    dirs = np.stack([np.cos(az), np.sin(az), np.zeros(40)], axis=-1)
    r1, v1 = gp.test(dirs, True, True).get_mean()
    r2, v2 = gp2.test(dirs, True, True).get_mean()
    # gp's bank carries the fused fit's L_inv; the loaded gp2's does not
    # (state_dict drops it), so the two predicts compile different (exactly
    # equivalent) whitening programs — 1 ulp apart under TPU f64 emulation
    np.testing.assert_allclose(r1, r2, rtol=1e-12, atol=1e-13)
    np.testing.assert_array_equal(v1, v2)


def test_fused_scan_train_matches_host_assembled_path_3d():
    """The one-dispatch fused 3D scan train (hit mask + mapping +
    grid-partition gather + flattened bank fit in one jit, one range-image
    transfer) must reproduce the host-assembled path slot for slot,
    including whole-group skipping at min_num_samples_per_group. Holes are
    punched in the scan so compaction and group masking both engage."""
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.models.batch_gp import bank_fit

    s = _lidar_setting()
    s.min_num_samples_per_group = 100
    gp = RangeSensorGaussianProcess3D(s, dtype=np.float64)
    dirs = gp.sensor_frame.ray_directions_in_frame()
    ranges = _wavy_room_ranges(dirs)
    rng = np.random.default_rng(1)
    ranges = np.where(rng.uniform(size=ranges.shape) < 0.35, np.inf, ranges)
    assert gp.train(np.eye(3), np.zeros(3), ranges)
    fused = gp.bank
    xs, ys, vs, ms = gp._assemble_bank_arrays()
    ref = bank_fit(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                   jnp.asarray(ms), np.float64(gp._scale), kernel=gp._kernel)
    np.testing.assert_array_equal(np.asarray(fused.mask), ms)
    # bitwise on CPU; 1 ulp of emulated f64 on TPU (device gather vs host)
    np.testing.assert_allclose(np.asarray(fused.x), xs,
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(fused.alpha),
                               np.asarray(ref.alpha), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(fused.L), np.asarray(ref.L),
                               rtol=1e-12, atol=1e-13)
    # group skipping engaged (some partitions below the sample floor)
    assert int((~np.asarray(fused.trained)).sum()) > 0


def test_fused_rr_scan_train_matches_host_assembled_path_3d():
    """3D reduced-rank fused scan train == host-assembled bank_fit_rr."""
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.kernels import ReducedRankSetting
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit_rr

    s3 = _lidar_setting()
    s3.gp = VanillaGPSetting(
        kernel_type="reduced_rank_rbf",
        kernel=ReducedRankSetting(x_dim=2, scale=0.5, num_basis=[16, 16]))
    gp3 = RangeSensorGaussianProcess3D(s3, dtype=np.float64)
    dirs = gp3.sensor_frame.ray_directions_in_frame()
    r3 = _wavy_room_ranges(dirs)
    rng = np.random.default_rng(2)
    r3 = np.where(rng.uniform(size=r3.shape) < 0.2, np.inf, r3)
    assert gp3.train(np.eye(3), np.zeros(3), r3)
    fused = gp3.bank
    xs, ys, vs, ms = gp3._assemble_bank_arrays()
    ref = bank_fit_rr(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                      jnp.asarray(ms), gp3._basis)
    np.testing.assert_array_equal(np.asarray(fused.mask), ms)
    # bitwise on CPU; 1 ulp of emulated f64 on TPU (device gather vs host)
    np.testing.assert_allclose(np.asarray(fused.x), xs,
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(fused.alpha),
                               np.asarray(ref.alpha), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(fused.L), np.asarray(ref.L),
                               rtol=1e-12, atol=1e-13)


def test_train_scan_batch_matches_per_scan_training_3d():
    """Offline 3D replay: S range images in ONE dispatch reproduce the
    per-scan fused training (bitwise on CPU, 1 ulp of emulated f64 on
    TPU); sliced banks drive the routed predict identically."""
    gp = RangeSensorGaussianProcess3D(_lidar_setting())
    dirs = gp.sensor_frame.ray_directions_in_frame()
    az = np.arctan2(dirs[..., 1], dirs[..., 0])
    el = np.arctan2(dirs[..., 2], np.hypot(dirs[..., 0], dirs[..., 1]))
    S = 4
    rb = np.stack([5.0 + 0.5 * np.sin(3 * az + p) * np.cos(2 * el)
                   for p in (0.0, 0.9, 1.7, 2.4)])
    rng = np.random.default_rng(3)
    rb = np.where(rng.uniform(size=rb.shape) < 0.1, np.inf, rb)
    stacked = gp.train_scan_batch(rb)
    R, C = gp.num_partitions
    B = R * C
    assert stacked.x.shape[0] == S * B

    q = dirs.reshape(-1, 3)[::101]
    for s_i in (0, S - 1):
        assert gp.train(np.eye(3), np.zeros(3), rb[s_i])
        per = gp.bank
        sl = slice(s_i * B, (s_i + 1) * B)
        np.testing.assert_array_equal(np.asarray(stacked.mask[sl]),
                                      np.asarray(per.mask))
        np.testing.assert_allclose(np.asarray(stacked.L[sl]),
                                   np.asarray(per.L),
                                   rtol=1e-12, atol=1e-13)
        ref_mean, ref_valid = gp.test(
            q, directions_are_local=True, un_map=False).get_mean()
        gp.use_scan_bank(stacked, s_i)
        got_mean, got_valid = gp.test(
            q, directions_are_local=True, un_map=False).get_mean()
        np.testing.assert_array_equal(got_valid, ref_valid)
        np.testing.assert_allclose(got_mean, ref_mean,
                                   rtol=1e-12, atol=1e-13)

    with pytest.raises(ValueError):
        gp.train_scan_batch(rb[:, :10, :])
