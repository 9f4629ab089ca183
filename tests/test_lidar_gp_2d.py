"""LidarGaussianProcess2D on the real logged scan from the reference's
data/double/train.dat (test ported from test/gtest/test_lidar_gp_2d.cpp:
OU-1d kernel, identity mapping, asymmetric partitions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from erl_gaussian_process_tpu.geometry import LidarFrame2DSetting
from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.models import LidarGaussianProcess2D
from erl_gaussian_process_tpu.models.lidar_gp_2d import LidarGP2DSetting
from erl_gaussian_process_tpu.models.mapping import MappingSetting, MappingType
from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting
from erl_gaussian_process_tpu.utils.loaders import load_lidar_log

import os

_REPO = os.path.join(os.path.dirname(__file__), os.pardir)
DATA = os.path.join(_REPO, "data", "double", "train.dat")
DATA_FLOAT = os.path.join(_REPO, "data", "float", "train.dat")

# test constants from the reference (test_lidar_gp_2d.cpp:117-127)
SCALE = 0.05
NOISE = 0.01
DISCON_NOISE = 100.0
OVERLAP = 6
GROUP = 20
MARGIN = 1


def _make_setting(frame, discontinuity: bool) -> LidarGP2DSetting:
    n = frame.angles.shape[0]
    return LidarGP2DSetting(
        partition_on_hit_rays=False,
        symmetric_partitions=False,
        group_size=GROUP + OVERLAP,
        overlap_size=OVERLAP,
        margin=MARGIN,
        init_variance=1e6,
        sensor_range_var=NOISE,
        discontinuity_var=DISCON_NOISE,
        max_valid_range_var=0.1,
        sensor_frame=LidarFrame2DSetting(
            valid_range_min=0.1, valid_range_max=30.0,
            angle_min=float(frame.angles[0]), angle_max=float(frame.angles[-1]),
            num_rays=n, discontinuity_detection=discontinuity),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=1, scale=SCALE)),
        mapping=MappingSetting(type=MappingType.IDENTITY),
    )


@pytest.fixture(scope="module")
def frame0():
    return load_lidar_log(DATA)[0]


def test_build_without_discontinuity_detection(frame0):
    """Golden parity path: with detection off, the pipeline is fully
    deterministic; the reference observed MAE 0.02135875277600203
    (test_lidar_gp_2d.cpp:260)."""
    gp = LidarGaussianProcess2D(_make_setting(frame0, discontinuity=False))
    assert gp.train(np.eye(2), np.zeros(2), frame0.ranges)
    res = gp.test(frame0.angles, angles_are_local=False, un_map=True)
    pred, valid = res.get_mean()
    assert valid.any()
    mae = np.abs(pred[valid] - frame0.ranges[valid]).mean()
    assert mae < 0.022, mae
    var, vvalid = res.get_variance()
    assert vvalid.any() and np.all(np.isfinite(var[vvalid]))


def test_build_with_discontinuity_detection(tmp_path, frame0):
    """Reference bound with detection on: MAE < 0.08 (observed 0.0793 with
    erl_geometry's continuity test; ours uses a range-jump threshold)."""
    gp = LidarGaussianProcess2D(_make_setting(frame0, discontinuity=True))
    assert gp.train(np.eye(2), np.zeros(2), frame0.ranges)
    res = gp.test(frame0.angles, angles_are_local=False, un_map=True)
    pred, valid = res.get_mean()
    mae = np.abs(pred[valid] - frame0.ranges[valid]).mean()
    assert mae < 0.08, mae

    # serialization round-trip (reference :263-266)
    path = str(tmp_path / "lidar_gp.npz")
    gp.save(path)
    gp2 = LidarGaussianProcess2D(_make_setting(frame0, discontinuity=True))
    gp2.load(path)
    assert gp == gp2


def test_compute_occ(frame0):
    """Occupancy scores: points at ~half the measured range must read free
    (occ near -1... wait occ -> +1 free? see formula), points beyond the
    surface occupied; sign convention follows the reference formula
    occ = 2/(1+exp(a(r_hat - map(d)))) - 1 (src/lidar_gp_2d.cpp:455-457):
    with identity mapping, d < r_hat gives occ < 0 (free side) and
    d > r_hat gives occ > 0 (occupied side)."""
    gp = LidarGaussianProcess2D(_make_setting(frame0, discontinuity=False))
    gp.train(np.eye(2), np.zeros(2), frame0.ranges)
    # pick a few rays with solid returns
    idx = np.arange(20, 250, 40)
    ang = frame0.angles[idx]
    r = frame0.ranges[idx]
    near = np.stack([0.5 * r * np.cos(ang), 0.5 * r * np.sin(ang)], axis=-1)
    far = np.stack([1.2 * r * np.cos(ang), 1.2 * r * np.sin(ang)], axis=-1)
    v1, _, rp1, occ_near = gp.compute_occ(near)
    v2, _, rp2, occ_far = gp.compute_occ(far)
    assert occ_near[v1].max() < -0.9       # free space
    assert occ_far[v2].min() > 0.9         # behind the surface
    # predicted ranges should approximate the measured ones
    assert np.abs(rp1[v1] - r[v1]).mean() < 0.5


def test_world_frame_queries(frame0):
    """Train with a non-identity pose, query with world angles."""
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    gp = LidarGaussianProcess2D(_make_setting(frame0, discontinuity=False))
    gp.train(R, np.array([1.0, -2.0]), frame0.ranges)
    world_angles = frame0.angles + th
    pred, valid = gp.test(world_angles, angles_are_local=False,
                          un_map=True).get_mean()
    mae = np.abs(pred[valid] - frame0.ranges[valid]).mean()
    assert mae < 0.022, mae


def test_se2_so2_transforms():
    """Round-trip world<->frame transform helpers (reference .pyi surface)."""
    from erl_gaussian_process_tpu.geometry.lidar_frame_2d import (
        LidarFrame2DSetting,
    )

    gp = LidarGaussianProcess2D(LidarGP2DSetting(
        sensor_frame=LidarFrame2DSetting(num_rays=64)))
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    t = np.array([1.5, -0.3])
    n = gp.setting.sensor_frame.num_rays
    gp.train(R, t, np.full(n, 2.0))
    rng = np.random.default_rng(0)
    d = rng.normal(size=(7, 2))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    np.testing.assert_allclose(
        gp.local_to_global_so2(gp.global_to_local_so2(d)), d, atol=1e-12)
    p = rng.uniform(-2, 2, (7, 2))
    np.testing.assert_allclose(
        gp.local_to_global_se2(gp.global_to_local_se2(p)), p, atol=1e-12)
    # a point straight ahead in the frame maps to t + R @ [r, 0]
    np.testing.assert_allclose(
        gp.local_to_global_se2(np.array([[2.0, 0.0]])),
        (t + R @ [2.0, 0.0])[None], atol=1e-12)


def test_reduced_rank_kernel_through_the_bank(tmp_path, frame0):
    """Reduced-rank gp.kernel_type threads through the whole class
    (reference: lidar_gp_2d.cpp:148-151 routes m_reduced_rank_kernel_ into
    the TestResult variance): the bank trains per-partition basis
    information systems and the routed predict uses +||.||^2 variances.
    Accuracy is checked on a smooth synthetic scan (the real log's
    discontinuities are a kernel-scale stress test, not an RR target)."""
    from erl_gaussian_process_tpu.kernels import ReducedRankSetting

    n = 270
    angles = np.linspace(-2.2, 2.2, n)
    ranges = 3.0 + 0.8 * np.sin(2.0 * angles)      # smooth star-shaped room
    s = LidarGP2DSetting(
        group_size=GROUP + OVERLAP, overlap_size=OVERLAP, margin=MARGIN,
        sensor_range_var=1e-4, max_valid_range_var=0.5,
        sensor_frame=LidarFrame2DSetting(
            valid_range_min=0.1, valid_range_max=30.0,
            angle_min=float(angles[0]), angle_max=float(angles[-1]),
            num_rays=n, discontinuity_detection=False),
        gp=VanillaGPSetting(
            kernel_type="reduced_rank_rbf",
            kernel=ReducedRankSetting(x_dim=1, scale=0.25, num_basis=[96],
                                      boundary=[3.0], coord_origin=[0.0])),
        mapping=MappingSetting(type=MappingType.IDENTITY),
    )
    gp = LidarGaussianProcess2D(s)
    assert gp.using_reduced_rank_kernel()
    assert gp.train(np.eye(2), np.zeros(2), ranges)
    # bank state follows the RR shape contract: L rows = #basis
    assert gp.bank.L.shape[1] == 96
    res = gp.test(angles, angles_are_local=True, un_map=True)
    pred, valid = res.get_mean()
    assert valid.sum() > 0.9 * n
    mae = np.abs(pred[valid] - ranges[valid]).mean()
    assert mae < 0.02, mae
    var, vvalid = res.get_variance()
    assert np.all(var[vvalid] > 0)  # RR variances are +||.||^2 > 0

    # exact-kernel twin for comparison: RR must be in the same accuracy class
    gp2 = LidarGaussianProcess2D(_make_setting_like(s, "rbf", 0.25))
    gp2.train(np.eye(2), np.zeros(2), ranges)
    pred2, valid2 = gp2.test(angles, True, True).get_mean()
    mae2 = np.abs(pred2[valid2] - ranges[valid2]).mean()
    assert mae < mae2 + 0.01, (mae, mae2)

    # checkpoint round-trip restores the RR configuration
    p = str(tmp_path / "lidar_rr.npz")
    gp.save(p)
    gp3 = LidarGaussianProcess2D(LidarGP2DSetting(
        sensor_frame=LidarFrame2DSetting(num_rays=n)))
    gp3.load(p)
    assert gp3.using_reduced_rank_kernel()
    assert gp == gp3
    p3, v3 = gp3.test(angles, True, True).get_mean()
    np.testing.assert_array_equal(pred, p3)


def _make_setting_like(s, kernel_type, scale):
    d = s.to_dict()
    d["gp"] = {"kernel_type": kernel_type,
               "kernel": {"x_dim": 1, "scale": scale}}
    return LidarGP2DSetting.from_dict(d)


def test_real_scan_float32(frame0, artifact):
    """Float32 path (reference F-suffixed instantiation) on the real scan:
    accuracy must stay within ~2x of the float64 golden bound."""
    gp = LidarGaussianProcess2D(_make_setting(frame0, discontinuity=False),
                                dtype=np.float32)
    assert gp.train(np.eye(2), np.zeros(2), frame0.ranges)
    res = gp.test(frame0.angles, angles_are_local=False, un_map=True)
    pred, valid = res.get_mean()
    assert pred.dtype == np.float32 and valid.any()
    mae = np.abs(pred[valid] - frame0.ranges[valid].astype(np.float32)).mean()
    assert mae < 0.04, mae

    def draw(ax):
        ax.plot(frame0.angles, frame0.ranges, ".k", ms=2, label="ranges")
        ax.plot(frame0.angles[valid], pred[valid], "-r", lw=0.8,
                label="GP mean")
        ax.set_xlabel("angle [rad]")
        ax.set_ylabel("range [m]")
        ax.set_title(f"LidarGP2D real scan fit (MAE {mae:.3f})")
        ax.legend(fontsize=8)

    artifact("lidar_gp_2d_real_scan", draw)


def test_float_variant_log_golden():
    """The reference ships a float32 copy of the scan log
    (data/float/train.dat) that its own tests never parse; run the same
    golden pipeline on it end-to-end at float32 (the reference's F-suffixed
    instantiation, src/lidar_gp_2d.cpp:638-639). The log must parse, agree
    with the double log, and hit the float32 accuracy bound."""
    frames = load_lidar_log(DATA_FLOAT, dtype=np.float32)
    f0 = frames[0]
    assert f0.angles.dtype == np.float32
    d0 = load_lidar_log(DATA)[0]
    np.testing.assert_allclose(f0.angles, d0.angles, rtol=2e-7, atol=1e-6)
    gp = LidarGaussianProcess2D(_make_setting(f0, discontinuity=False),
                                dtype=np.float32)
    assert gp.train(np.eye(2), np.zeros(2), f0.ranges)
    res = gp.test(f0.angles, angles_are_local=False, un_map=True)
    pred, valid = res.get_mean()
    assert pred.dtype == np.float32 and valid.any()
    mae = np.abs(pred[valid] - f0.ranges[valid]).mean()
    assert mae < 0.04, mae


def test_reduced_rank_boundary_defaults_independently_of_num_basis():
    """A shorthand RR config that sets only num_basis (boundary left at the
    dataclass default [1.0]) must still get the frame-derived Hilbert box:
    on a ±2.2 rad scan, a 1-rad box would clip every ray past ±1 rad to the
    box edge (phi~0, var~0) and produce silently wrong predictions that
    pass the variance gate (ADVICE r2). Mirrors the 3D class's per-field
    defaulting."""
    from erl_gaussian_process_tpu.kernels import ReducedRankSetting

    n = 270
    angles = np.linspace(-2.2, 2.2, n)
    ranges = 3.0 + 0.8 * np.sin(2.0 * angles)
    s = LidarGP2DSetting(
        group_size=GROUP + OVERLAP, overlap_size=OVERLAP, margin=MARGIN,
        sensor_range_var=1e-4, max_valid_range_var=0.5,
        sensor_frame=LidarFrame2DSetting(
            valid_range_min=0.1, valid_range_max=30.0,
            angle_min=float(angles[0]), angle_max=float(angles[-1]),
            num_rays=n, discontinuity_detection=False),
        gp=VanillaGPSetting(
            kernel_type="reduced_rank_rbf",
            kernel=ReducedRankSetting(x_dim=1, scale=0.25,
                                      num_basis=[96])),  # boundary omitted
        mapping=MappingSetting(type=MappingType.IDENTITY),
    )
    gp = LidarGaussianProcess2D(s)
    # boundary was defaulted from the frame: angular halfspan + 3*scale
    assert gp.setting.gp.kernel.boundary[0] >= 2.2 + 3 * 0.25 - 1e-9
    assert gp.train(np.eye(2), np.zeros(2), ranges)
    res = gp.test(angles, angles_are_local=True, un_map=True)
    pred, valid = res.get_mean()
    assert valid.sum() > 0.9 * n
    # rays beyond ±1 rad must predict correctly, not clip to the box edge
    outer = valid & (np.abs(angles) > 1.2)
    assert outer.sum() > 0
    mae_outer = np.abs(pred[outer] - ranges[outer]).mean()
    assert mae_outer < 0.02, mae_outer


def test_reduced_rank_explicit_unit_boundary_survives():
    """An EXPLICIT boundary=[1.0] is a real user choice, not the unset
    sentinel (that is now None) — the frame-derived defaulting must leave
    it alone (round-3 review: the old [1.0] dataclass default was
    indistinguishable from an explicit 1.0-rad Hilbert box)."""
    from erl_gaussian_process_tpu.kernels import ReducedRankSetting

    n = 90
    angles = np.linspace(-0.7, 0.7, n)  # data fits inside the 1-rad box
    s = LidarGP2DSetting(
        group_size=GROUP + OVERLAP, overlap_size=OVERLAP, margin=MARGIN,
        sensor_range_var=1e-4, max_valid_range_var=0.5,
        sensor_frame=LidarFrame2DSetting(
            valid_range_min=0.1, valid_range_max=30.0,
            angle_min=float(angles[0]), angle_max=float(angles[-1]),
            num_rays=n, discontinuity_detection=False),
        gp=VanillaGPSetting(
            kernel_type="reduced_rank_rbf",
            kernel=ReducedRankSetting(x_dim=1, scale=0.25, num_basis=[64],
                                      boundary=[1.0])),  # explicit
        mapping=MappingSetting(type=MappingType.IDENTITY),
    )
    gp = LidarGaussianProcess2D(s)
    assert list(gp.setting.gp.kernel.boundary) == [1.0]


def test_fused_scan_train_matches_host_assembled_path():
    """The one-dispatch fused scan train (mask + mapping + partition
    gather + bank fit in a single jit, one (num_rays,) transfer) must
    reproduce the host-assembled path (_assemble_bank_arrays + bank_fit)
    slot for slot: same compacted x/mask, same factors. Real logged scans,
    discontinuity detection on, both mapping flavors."""
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit
    from erl_gaussian_process_tpu.utils.loaders import load_lidar_log

    frames = load_lidar_log(DATA)
    f0 = frames[0]
    for mt in (MappingType.IDENTITY, MappingType.INVERSE_SQRT):
        s = LidarGP2DSetting(
            partition_on_hit_rays=False, symmetric_partitions=False,
            group_size=26, overlap_size=6, margin=1, init_variance=1e6,
            sensor_range_var=0.01, discontinuity_var=100.0,
            max_valid_range_var=0.1,
            sensor_frame=LidarFrame2DSetting(
                valid_range_min=0.1, valid_range_max=30.0,
                angle_min=float(f0.angles[0]), angle_max=float(f0.angles[-1]),
                num_rays=f0.angles.shape[0], discontinuity_detection=True),
            gp=VanillaGPSetting(kernel_type="ou",
                                kernel=KernelSetting(x_dim=1, scale=0.05)),
            mapping=MappingSetting(type=mt))
        gp = LidarGaussianProcess2D(s, dtype=np.float64)
        eye, zero = np.eye(2), np.zeros(2)
        for f in frames[:4]:
            assert gp.train(eye, zero, f.ranges)
            fused = gp.bank
            xs, ys, vs, ms = gp._assemble_bank_arrays()
            ref = bank_fit(jnp.asarray(xs), jnp.asarray(ys),
                           jnp.asarray(vs), jnp.asarray(ms),
                           np.float64(gp._scale), kernel=gp._kernel)
            np.testing.assert_array_equal(np.asarray(fused.mask), ms)
            # bitwise on CPU; on TPU the f64 coordinate arithmetic is
            # emulated (f32-pair) and the device gather differs from host
            # numpy by 1 ulp (observed max 2.7e-15 on v5e) — tight
            # allclose instead of array_equal
            np.testing.assert_allclose(np.asarray(fused.x), xs,
                                       rtol=1e-13, atol=1e-13)
            np.testing.assert_allclose(np.asarray(fused.alpha),
                                       np.asarray(ref.alpha),
                                       rtol=1e-12, atol=1e-13)
            np.testing.assert_allclose(np.asarray(fused.L),
                                       np.asarray(ref.L),
                                       rtol=1e-12, atol=1e-13)


def test_fused_rr_scan_train_matches_host_assembled_path():
    """The reduced-rank fused scan train (shared gather + per-partition
    Hilbert information systems in one jit) must match the host-assembled
    bank_fit_rr path slot for slot."""
    from erl_gaussian_process_tpu.kernels import ReducedRankSetting
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit_rr

    n = 270
    angles = np.linspace(-2.2, 2.2, n)
    ranges = 3.0 + 0.8 * np.sin(2.0 * angles)
    ranges[40:60] = np.inf  # holes so compaction engages
    s = LidarGP2DSetting(
        group_size=32, overlap_size=6, margin=1,
        sensor_range_var=1e-4, max_valid_range_var=0.5,
        sensor_frame=LidarFrame2DSetting(
            valid_range_min=0.1, valid_range_max=30.0,
            angle_min=float(angles[0]), angle_max=float(angles[-1]),
            num_rays=n, discontinuity_detection=True),
        gp=VanillaGPSetting(
            kernel_type="reduced_rank_rbf",
            kernel=ReducedRankSetting(x_dim=1, scale=0.25, num_basis=[48])),
        mapping=MappingSetting(type=MappingType.IDENTITY))
    gp = LidarGaussianProcess2D(s, dtype=np.float64)
    assert gp.train(np.eye(2), np.zeros(2), ranges)
    fused = gp.bank
    xs, ys, vs, ms = gp._assemble_bank_arrays()
    ref = bank_fit_rr(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                      jnp.asarray(ms), gp._basis)
    np.testing.assert_array_equal(np.asarray(fused.mask), ms)
    # bitwise on CPU; on TPU the emulated-f64 device gather differs from
    # host numpy by 1 ulp (same as the plain fused-train test above)
    np.testing.assert_allclose(np.asarray(fused.x), xs,
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(fused.alpha),
                               np.asarray(ref.alpha), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(fused.L), np.asarray(ref.L),
                               rtol=1e-12, atol=1e-13)


def _mk_gp(n, span=2.2, **kw):
    angles = np.linspace(-span, span, n)
    s = LidarGP2DSetting(
        group_size=26, overlap_size=6, margin=1,
        sensor_range_var=0.01, discontinuity_var=100.0,
        max_valid_range_var=0.5,
        sensor_frame=LidarFrame2DSetting(
            valid_range_min=0.1, valid_range_max=30.0,
            angle_min=float(angles[0]), angle_max=float(angles[-1]),
            num_rays=n, discontinuity_detection=True),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=1, scale=0.05)),
        mapping=MappingSetting(type=MappingType.IDENTITY), **kw)
    return LidarGaussianProcess2D(s, dtype=np.float64), angles


def test_fused_cache_invalidated_by_load_state_dict():
    """Loading a checkpoint with different frame geometry must not leave
    the fused-train cache pointing at the OLD partition table (round-3
    review: stale 14-partition bank silently built for a 10-partition
    checkpoint)."""
    gp_a, ang_a = _mk_gp(270)
    assert gp_a.train(np.eye(2), np.zeros(2), 3.0 + 0.1 * np.sin(ang_a))
    gp_b, ang_b = _mk_gp(180)
    assert gp_b.train(np.eye(2), np.zeros(2), 4.0 + 0.1 * np.cos(ang_b))
    B_b = len(gp_b.partitions)

    gp_a.load_state_dict(gp_b.state_dict())
    assert gp_a.train(np.eye(2), np.zeros(2), 4.0 + 0.1 * np.cos(ang_b))
    assert gp_a.bank.x.shape[0] == B_b == len(gp_a.partitions)
    # and the bank matches a freshly-built instance bit for bit
    gp_c, _ = _mk_gp(180)
    assert gp_c.train(np.eye(2), np.zeros(2), 4.0 + 0.1 * np.cos(ang_b))
    np.testing.assert_array_equal(np.asarray(gp_a.bank.L),
                                  np.asarray(gp_c.bank.L))


def test_fused_train_sees_live_setting_scalars():
    """Setting scalars mutated between scans must take effect on the next
    fused train, exactly as the host-assembled path read them live."""
    gp, ang = _mk_gp(270)
    r = 3.0 + 0.1 * np.sin(ang)
    assert gp.train(np.eye(2), np.zeros(2), r)
    before = np.asarray(gp.bank.L).copy()
    gp.setting.sensor_range_var = 0.5  # mutate between scans
    assert gp.train(np.eye(2), np.zeros(2), r)
    after = np.asarray(gp.bank.L)
    assert np.abs(after - before).max() > 1e-6
    # equivalence with the host gather under the NEW value
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit
    xs, ys, vs, ms = gp._assemble_bank_arrays()
    ref = bank_fit(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                   jnp.asarray(ms), np.float64(gp._scale), kernel=gp._kernel)
    np.testing.assert_allclose(after, np.asarray(ref.L),
                               rtol=1e-12, atol=1e-13)


def test_fused_cache_invalidated_by_partition_mode_toggle():
    """Train angle-partitioned, switch to hit-ray partitioning and train,
    switch back: the fused path must rebuild its index table for the
    restored angle partitions instead of fusing against the hit-ray
    table."""
    gp, ang = _mk_gp(270)
    r = 3.0 + 0.1 * np.sin(ang)
    r[::7] = np.inf  # misses so hit-ray partitions differ from angle ones
    assert gp.train(np.eye(2), np.zeros(2), r)
    L_angle = np.asarray(gp.bank.L).copy()

    gp.setting.partition_on_hit_rays = True
    assert gp.train(np.eye(2), np.zeros(2), r)

    gp.setting.partition_on_hit_rays = False
    gp.partition_on_angles()  # restore the angle table
    assert gp.train(np.eye(2), np.zeros(2), r)
    np.testing.assert_array_equal(np.asarray(gp.bank.L), L_angle)


def test_train_scan_batch_matches_per_scan_training():
    """Offline replay: S scans trained in ONE dispatch must reproduce the
    per-scan fused training (bitwise on CPU, to 1 ulp of emulated f64 on
    TPU), and a sliced scan bank must drive the
    routed predict identically."""
    frames = load_lidar_log(DATA)
    S = 6
    gp, _ = None, None
    f0 = frames[0]
    gp = _mk_gp(f0.angles.shape[0],
                span=float(abs(f0.angles[0])))[0]
    # match the log's actual angle domain
    rb = np.stack([f.ranges for f in frames[:S]])
    stacked = gp.train_scan_batch(rb)
    B = len(gp.partitions)
    assert stacked.x.shape[0] == S * B

    eye, zero = np.eye(2), np.zeros(2)
    for s_i in (0, 3, S - 1):
        assert gp.train(eye, zero, rb[s_i])
        per = gp.bank
        sl = slice(s_i * B, (s_i + 1) * B)
        np.testing.assert_array_equal(np.asarray(stacked.mask[sl]),
                                      np.asarray(per.mask))
        # bitwise on CPU; on TPU the vmapped batch program's emulated-f64
        # arithmetic differs from the single-scan program by ulps
        np.testing.assert_allclose(np.asarray(stacked.L[sl]),
                                   np.asarray(per.L),
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.asarray(stacked.alpha[sl]),
                                   np.asarray(per.alpha),
                                   rtol=1e-12, atol=1e-13)
        # routed predict off the sliced bank == off the per-scan bank
        q = np.linspace(-1.5, 1.5, 64)
        ref_res = gp.test(q, angles_are_local=True, un_map=False)
        ref_mean, ref_valid = ref_res.get_mean()
        gp.use_scan_bank(stacked, s_i)
        got_res = gp.test(q, angles_are_local=True, un_map=False)
        got_mean, got_valid = got_res.get_mean()
        np.testing.assert_array_equal(got_valid, ref_valid)
        np.testing.assert_allclose(got_mean, ref_mean,
                                   rtol=1e-12, atol=1e-13)

    with pytest.raises(ValueError):
        gp.train_scan_batch(rb[:, :100])
