"""TPU AOT compile gate for every Pallas kernel — no chip required.

Round 2's headline risk was Mosaic-vs-interpret divergence: interpret-mode
tests pass while the real Mosaic lowering rejects the kernel (the x64/i64
traps) or compiles it to something pathological (the pl.when ~1000x store
serialization). jax's topology-based AOT (`jax.experimental.topologies`)
compiles the REAL v5e Mosaic/XLA pipeline against a device-less topology
descriptor, so lowering/compile regressions in every Pallas kernel are
caught offline, in CI, with the tunnel down. (Runtime DMA semantics and
performance still require silicon — benchmarks/onchip_ritual.sh.)

These run the actual production entry points at production shapes: the
streaming Cholesky at its n=8192 headline and 16384 VMEM-cap gate, the
fused FITC update at the production map shape, the fused bank at the
measured sweep shape, the gram/trsv/blocked-solve paths at their
dispatch-threshold shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tpu_sharding():
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:1x1",
            chips_per_host_bounds=(1, 1, 1), num_slices=1)
    except Exception as e:  # PJRT TPU compile plugin not available
        pytest.skip(f"TPU AOT topology unavailable: {e}")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(topo.devices).reshape(1), ("x",))
    return NamedSharding(mesh, P())


def _aot(fn, *args, sharding, **static):
    """Lower + compile fn for the v5e topology; shapes only, no execution."""
    def spec(a):
        if isinstance(a, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding)
        return a
    args = tuple(spec(a) for a in args)
    return jax.jit(lambda *xs: fn(*xs, **static)).lower(*args).compile()


def _f32(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def test_streaming_chol_compiles(tpu_sharding):
    from erl_gaussian_process_tpu.ops.pallas_chol import chol_blocked
    for n in (2560, 8192, 16384):   # min-nb gate, headline, VMEM-cap edge
        _aot(chol_blocked, _f32(n, n), sharding=tpu_sharding)


def test_fused_fitc_update_compiles(tpu_sharding):
    from erl_gaussian_process_tpu.ops.pallas_fitc import (
        pallas_fitc_update,
    )
    M, n, d = 1024, 2000, 2   # production map shape (31x31 grid padded)
    _aot(lambda p, li, x, y, v, m, s: pallas_fitc_update(
             "matern32", p, li, x, y, v, m, s),
         _f32(M, d), _f32(M, M), _f32(n, d), _f32(n, 1), _f32(n),
         jax.ShapeDtypeStruct((n,), jnp.bool_), _f32(),
         sharding=tpu_sharding)


def test_fused_bank_fit_compiles(tpu_sharding):
    from erl_gaussian_process_tpu.ops.pallas_bank import (
        bank_fit_fused,
    )
    B, n, d = 1024, 128, 2    # the measured 5.6x sweep shape
    _aot(lambda x, y, v, m, s: bank_fit_fused("rbf", x, y, v, m, s),
         _f32(B, n, d), _f32(B, n, 1), _f32(B, n),
         jax.ShapeDtypeStruct((B, n), jnp.bool_), _f32(),
         sharding=tpu_sharding)


def test_pallas_gram_compiles(tpu_sharding):
    from erl_gaussian_process_tpu.ops.pallas_gram import (
        pallas_cross_gram,
    )
    n, m, d = 2048, 2048, 2
    for name in ("rbf", "ou", "matern32"):
        _aot(lambda a, b, s, _k=name: pallas_cross_gram(_k, a, b, s),
             _f32(n, d), _f32(m, d), _f32(), sharding=tpu_sharding)


def test_pallas_trsv_compiles(tpu_sharding):
    from erl_gaussian_process_tpu.ops.pallas_trsv import (
        cho_solve_vec,
    )
    n, q = 8192, 1
    _aot(cho_solve_vec, _f32(n, n), _f32(n, q), sharding=tpu_sharding)


def test_blocked_solve_compiles(tpu_sharding):
    from erl_gaussian_process_tpu.ops.blocked_solve import (
        blocked_solve_lower,
    )
    n, m = 8192, 4096
    _aot(blocked_solve_lower, _f32(n, n), _f32(n, m), sharding=tpu_sharding)


def test_flagship_update_step_compiles(tpu_sharding):
    """The full fused occupancy-map update (sampler + label + FITC) — the
    __graft_entry__.entry() workload — compiles for v5e end to end."""
    from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
        update_step,
    )
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpState,
    )
    M, d, n_rays, slots = 1024, 2, 135, 20
    n_pts = n_rays * (1 + slots)
    state = SpGpState(
        pseudo=_f32(M, d), L_km=_f32(M, M), L_inv=_f32(M, M),
        qm=_f32(M, M), alpha=_f32(M, 1), qm_c=_f32(M, M),
        alpha_c=_f32(M, 1))
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    _aot(lambda st, k, step, sp, pts, msk, lo, hi, sc: update_step(
             st, k, step, sp, pts, msk, lo, hi, sc,
             kernel="matern32", diagonal_qm=False, free_slots=slots,
             max_samples=2000, min_distance=0.0, max_distance=30.0,
             free_sampling_margin=0.01, free_points_per_meter=3.0,
             logodd_occupied=1.0, logodd_free=-1.0, logodd_variance=1e-4),
         state, key, jax.ShapeDtypeStruct((), jnp.int32),
         _f32(d), _f32(n_rays, d), jax.ShapeDtypeStruct((n_rays,), jnp.bool_),
         _f32(d), _f32(d), _f32(),
         sharding=tpu_sharding)
    del n_pts


@pytest.fixture(scope="module")
def tpu8_mesh():
    """A REAL 8-chip v5e slice topology (2x4) — compiles actual ICI
    collectives, a strictly stronger multi-chip signal than the virtual
    CPU mesh (which lowers psum to host all-reduce)."""
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4",
            chips_per_host_bounds=(2, 4, 1), num_slices=1)
    except Exception as e:
        pytest.skip(f"TPU AOT topology unavailable: {e}")
    from jax.sharding import Mesh
    from erl_gaussian_process_tpu.parallel.mesh import BANK_AXIS
    return Mesh(np.array(topo.devices).reshape(8), (BANK_AXIS,))


def test_multichip_sharded_update_step_compiles(tpu8_mesh):
    """The full fused sharded map update (replicated sampler + sample-
    sharded FITC + psum pair over ICI) compiles for a real 8-chip v5e
    slice."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpState,
    )
    from erl_gaussian_process_tpu.parallel.mesh import sharded_update_step

    rep = NamedSharding(tpu8_mesh, P())
    M, d, n_rays, slots = 1024, 2, 136, 20

    def S(shape, dt=jnp.float32):
        # vma: explicitly mark the abstract inputs as mesh-invariant —
        # with a live (non-AOT) default backend present, shard_map's
        # check_vma rejects vma=None structs (observed on-chip 2026-08-19;
        # the device-less CPU run never hits the check)
        return jax.ShapeDtypeStruct(shape, dt, sharding=rep,
                                    vma=frozenset())

    state = SpGpState(pseudo=S((M, d)), L_km=S((M, M)), L_inv=S((M, M)),
                      qm=S((M, M)), alpha=S((M, 1)), qm_c=S((M, M)),
                      alpha_c=S((M, 1)))
    fn = functools.partial(
        sharded_update_step, tpu8_mesh,
        kernel="matern32", diagonal_qm=False, free_slots=slots,
        max_samples=2000, min_distance=0.0, max_distance=30.0,
        free_sampling_margin=0.01, free_points_per_meter=3.0,
        logodd_occupied=1.0, logodd_free=-1.0, logodd_variance=1e-4)
    args = (state, S((2,), jnp.uint32), S((), jnp.int32), S((d,)),
            S((n_rays, d)), S((n_rays,), jnp.bool_), S((d,)), S((d,)), S(()))
    jax.jit(lambda *xs: fn(*xs)).lower(*args).compile()


def test_multichip_bank_and_predict_compile(tpu8_mesh):
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpState,
    )
    from erl_gaussian_process_tpu.parallel.mesh import (
        sharded_bank_fit,
        sharded_spgp_predict,
    )

    rep = NamedSharding(tpu8_mesh, P())

    def S(shape, dt=jnp.float32):
        # vma: explicitly mark the abstract inputs as mesh-invariant —
        # with a live (non-AOT) default backend present, shard_map's
        # check_vma rejects vma=None structs (observed on-chip 2026-08-19;
        # the device-less CPU run never hits the check)
        return jax.ShapeDtypeStruct(shape, dt, sharding=rep,
                                    vma=frozenset())

    B, n, d = 64, 32, 1
    fit = functools.partial(sharded_bank_fit, tpu8_mesh, kernel="ou")
    jax.jit(lambda *xs: fit(*xs)).lower(
        S((B, n, d)), S((B, n, 1)), S((B, n)), S((B, n), jnp.bool_),
        S(())).compile()

    M, dq = 1024, 2
    state = SpGpState(pseudo=S((M, dq)), L_km=S((M, M)), L_inv=S((M, M)),
                      qm=S((M, M)), alpha=S((M, 1)), qm_c=S((M, M)),
                      alpha_c=S((M, 1)))
    pred = functools.partial(sharded_spgp_predict, tpu8_mesh,
                             kernel="matern32", with_var=True)
    jax.jit(lambda st, L, a, xq, sc: pred(st, L, a, xq, sc)).lower(
        state, S((M, M)), S((M, 1)), S((128, dq)), S(())).compile()


def test_mixture_kernels_compile_in_fused_ops(tpu_sharding):
    """Scale-mixture names flow through _apply_family inside the fused
    gram AND the fused FITC update — both must Mosaic-compile for v5e."""
    from erl_gaussian_process_tpu.kernels import (
        KernelSetting,
        resolve_kernel_setting,
    )
    from erl_gaussian_process_tpu.ops.pallas_fitc import pallas_fitc_update
    from erl_gaussian_process_tpu.ops.pallas_gram import pallas_cross_gram

    ks = KernelSetting(x_dim=2, scale=0.4, scale_mix=0.5,
                       weights=[0.5, 0.3, 0.2])
    name = resolve_kernel_setting("matern32", ks, "test")
    n, m, d = 2048, 2048, 2
    _aot(lambda a, b, s: pallas_cross_gram(name, a, b, s),
         _f32(n, d), _f32(m, d), _f32(), sharding=tpu_sharding)
    M, nn = 1024, 2000
    _aot(lambda p, li, x, y, v, msk, s: pallas_fitc_update(
             name, p, li, x, y, v, msk, s),
         _f32(M, d), _f32(M, M), _f32(nn, d), _f32(nn, 1), _f32(nn),
         jax.ShapeDtypeStruct((nn,), jnp.bool_), _f32(),
         sharding=tpu_sharding)


def test_gram_fused_chol_compiles(tpu_sharding):
    """The gram-fused streaming Cholesky — the actual exact-GP fit path
    for n >= 3584 (the (n, n) gram never round-trips HBM) — compiles at
    the fit benchmark sizes for all gram families it gates on."""
    from erl_gaussian_process_tpu.ops.pallas_chol import chol_blocked_gram

    for n in (4096, 8192):
        for fam in ("rbf", "matern32"):
            _aot(lambda x, v, m, s, _f=fam: chol_blocked_gram(
                     _f, x, v, m, s),
                 _f32(n, 2), _f32(n), jax.ShapeDtypeStruct((n,), jnp.bool_),
                 _f32(), sharding=tpu_sharding)


def test_joint_gram_fused_chol_compiles(tpu_sharding):
    """The NIGP joint value/gradient gram-fused streaming Cholesky — the
    fit path that removes the (n(1+d))^2 HBM round-trip (VERDICT r3
    item 3) — compiles at the reference's 2D NIGP shape (n=2560, d=2 ->
    joint 7680) and a 1D shape for both differentiable families."""
    from erl_gaussian_process_tpu.ops.pallas_chol import (
        chol_blocked_gram_joint,
    )

    for n, d in ((2560, 2), (3500, 1)):
        for fam in ("rbf", "matern32"):
            _aot(lambda x, vv, vg, sm, gm, s, _f=fam:
                 chol_blocked_gram_joint(_f, x, vv, vg, sm, gm, s),
                 _f32(n, d), _f32(n), _f32(n),
                 jax.ShapeDtypeStruct((n,), jnp.bool_),
                 jax.ShapeDtypeStruct((n,), jnp.bool_),
                 _f32(), sharding=tpu_sharding)


def test_fused_scan_train_compiles(tpu_sharding):
    """The one-dispatch scan-train programs (mask + mapping + partition
    gather + bank fit in one jit) compile for v5e at the production scan
    shapes. The 3D case is the compile-risk one: its 144-slot members
    dispatch to the fused Pallas bank kernel inside the same program."""
    import functools

    from erl_gaussian_process_tpu.geometry.frames_3d import (
        LidarFrame3DSetting,
    )
    from erl_gaussian_process_tpu.geometry.lidar_frame_2d import (
        LidarFrame2DSetting,
    )
    from erl_gaussian_process_tpu.kernels import KernelSetting
    from erl_gaussian_process_tpu.models.lidar_gp_2d import (
        LidarGaussianProcess2D,
        LidarGP2DSetting,
        _scan_train_fused as scan2d,
    )
    from erl_gaussian_process_tpu.models.range_sensor_gp_3d import (
        RangeSensorGaussianProcess3D,
        RangeSensorGP3DSetting,
        _scan_train_fused as scan3d,
    )
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting
    from erl_gaussian_process_tpu.ops.pallas_bank import pallas_bank_applies

    # 2D: the real-scan bench shape (270 rays, 26/6 partitions)
    gp2 = LidarGaussianProcess2D(LidarGP2DSetting(
        group_size=26, overlap_size=6, margin=1,
        sensor_frame=LidarFrame2DSetting(
            valid_range_min=0.1, valid_range_max=30.0,
            angle_min=-2.356, angle_max=2.356, num_rays=270),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=1, scale=0.05)),
    ), dtype=np.float32)
    c2 = gp2._build_scan_fit_cache()
    s2 = gp2.setting
    fn2 = functools.partial(
        scan2d, kernel=gp2._kernel,
        discon_on=s2.sensor_frame.discontinuity_detection,
        map_type=s2.mapping.type, map_scale=s2.mapping.scale,
        use_pallas=c2["use_pallas"])
    _aot(lambda r, a, i, b, *sc: fn2(r, a, i, b, *sc),
         _f32(270), _f32(270),
         jax.ShapeDtypeStruct(c2["idx"].shape, jnp.int32),
         jax.ShapeDtypeStruct(c2["inb"].shape, jnp.bool_),
         _f32(), _f32(), _f32(), _f32(), _f32(), _f32(),
         sharding=tpu_sharding)

    # 3D: the reference's 271x91 lidar scan, 12/4 grid partitions ->
    # 144-slot members -> the fused Pallas bank inside the program
    gp3 = RangeSensorGaussianProcess3D(RangeSensorGP3DSetting(
        row_group_size=12, row_overlap_size=4, col_group_size=12,
        col_overlap_size=4, min_num_samples_per_group=10,
        sensor_frame_type="lidar",
        sensor_frame=LidarFrame3DSetting(
            valid_range_min=0.1, valid_range_max=40.0,
            azimuth_min=-np.pi, azimuth_max=np.pi,
            elevation_min=-0.8, elevation_max=0.8,
            num_azimuth_lines=271, num_elevation_lines=91),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=2, scale=0.5)),
    ), dtype=np.float32)
    c3 = gp3._build_scan_fit_cache()
    width = c3["idx"].shape[1]
    # pallas_bank_applies consults the runtime default backend (False on
    # this CPU host), so assert only the shape side of the dispatch — on a
    # TPU host this exact shape WOULD take the Pallas bank, which is why
    # the program below force-compiles with use_pallas=True
    assert width > 96, width
    del pallas_bank_applies
    s3 = gp3.setting
    fn3 = functools.partial(
        scan3d, kernel=gp3._kernel, map_type=s3.mapping.type,
        map_scale=s3.mapping.scale, use_pallas=True)
    _aot(lambda r, fc, i, b, *sc: fn3(r, fc, i, b, *sc),
         _f32(271, 91), _f32(271 * 91, 2),
         jax.ShapeDtypeStruct(c3["idx"].shape, jnp.int32),
         jax.ShapeDtypeStruct(c3["inb"].shape, jnp.bool_),
         _f32(), _f32(), _f32(), jax.ShapeDtypeStruct((), jnp.int32), _f32(),
         sharding=tpu_sharding)


def test_batch_replay_compiles(tpu_sharding):
    """The S-scan batched trajectory replay (vmapped gather + one
    S*B-member bank fit) compiles for v5e — 2D at the 28-scan reference
    log shape, 3D at 8 scans of the 271x91 grid (1800 Pallas-bank
    members, the VMEM-pressure case)."""
    import functools

    from erl_gaussian_process_tpu.geometry.frames_3d import (
        LidarFrame3DSetting,
    )
    from erl_gaussian_process_tpu.geometry.lidar_frame_2d import (
        LidarFrame2DSetting,
    )
    from erl_gaussian_process_tpu.kernels import KernelSetting
    from erl_gaussian_process_tpu.models.lidar_gp_2d import (
        LidarGaussianProcess2D,
        LidarGP2DSetting,
        _scan_train_batch_fused as batch2d,
    )
    from erl_gaussian_process_tpu.models.range_sensor_gp_3d import (
        RangeSensorGaussianProcess3D,
        RangeSensorGP3DSetting,
        _scan_train_batch_fused as batch3d,
    )
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting

    gp2 = LidarGaussianProcess2D(LidarGP2DSetting(
        group_size=26, overlap_size=6, margin=1,
        sensor_frame=LidarFrame2DSetting(
            valid_range_min=0.1, valid_range_max=30.0,
            angle_min=-2.356, angle_max=2.356, num_rays=270),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=1, scale=0.05)),
    ), dtype=np.float32)
    c2 = gp2._build_scan_fit_cache()
    s2 = gp2.setting
    fn2 = functools.partial(
        batch2d, kernel=gp2._kernel,
        discon_on=s2.sensor_frame.discontinuity_detection,
        map_type=s2.mapping.type, map_scale=s2.mapping.scale,
        use_pallas=c2["use_pallas"])
    _aot(lambda r, a, i, b, *sc: fn2(r, a, i, b, *sc),
         _f32(28, 270), _f32(270),
         jax.ShapeDtypeStruct(c2["idx"].shape, jnp.int32),
         jax.ShapeDtypeStruct(c2["inb"].shape, jnp.bool_),
         _f32(), _f32(), _f32(), _f32(), _f32(), _f32(),
         sharding=tpu_sharding)

    gp3 = RangeSensorGaussianProcess3D(RangeSensorGP3DSetting(
        row_group_size=12, row_overlap_size=4, col_group_size=12,
        col_overlap_size=4, min_num_samples_per_group=10,
        sensor_frame_type="lidar",
        sensor_frame=LidarFrame3DSetting(
            valid_range_min=0.1, valid_range_max=40.0,
            azimuth_min=-np.pi, azimuth_max=np.pi,
            elevation_min=-0.8, elevation_max=0.8,
            num_azimuth_lines=271, num_elevation_lines=91),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=2, scale=0.5)),
    ), dtype=np.float32)
    c3 = gp3._build_scan_fit_cache()
    s3 = gp3.setting
    fn3 = functools.partial(
        batch3d, kernel=gp3._kernel, map_type=s3.mapping.type,
        map_scale=s3.mapping.scale, use_pallas=True)
    _aot(lambda r, fc, i, b, *sc: fn3(r, fc, i, b, *sc),
         _f32(8, 271, 91), _f32(271 * 91, 2),
         jax.ShapeDtypeStruct(c3["idx"].shape, jnp.int32),
         jax.ShapeDtypeStruct(c3["inb"].shape, jnp.bool_),
         _f32(), _f32(), _f32(), jax.ShapeDtypeStruct((), jnp.int32), _f32(),
         sharding=tpu_sharding)
