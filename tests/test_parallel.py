"""Multi-chip sharding equivalence on the virtual 8-device CPU mesh:
sharded results must match the single-device functional cores."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erl_gaussian_process_tpu.models.batch_gp import bank_fit
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
    spgp_init,
    spgp_update,
)
from erl_gaussian_process_tpu.parallel import (
    make_mesh,
    sharded_bank_fit,
    sharded_spgp_update,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sharded_bank_fit_matches_local():
    rng = np.random.default_rng(0)
    B, n = 16, 12
    x = jnp.asarray(rng.uniform(0, 1, (B, n, 1)))
    y = jnp.asarray(rng.uniform(-1, 1, (B, n, 1)))
    var = jnp.full((B, n), 1e-3)
    mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.8)
    mesh = make_mesh(8)
    sharded = sharded_bank_fit(mesh, x, y, var, mask, 0.3, kernel="rbf")
    local = bank_fit(x, y, var, mask, 0.3, kernel="rbf")
    np.testing.assert_allclose(sharded.L, local.L, atol=1e-12)
    np.testing.assert_allclose(sharded.alpha, local.alpha, atol=1e-12)
    np.testing.assert_array_equal(sharded.trained, local.trained)


def test_sharded_spgp_update_matches_local():
    rng = np.random.default_rng(1)
    c = np.linspace(-1, 1, 5)
    pv, qv = np.meshgrid(c, c, indexing="ij")
    pseudo = jnp.asarray(np.stack([pv.ravel(), qv.ravel()], axis=-1))
    state = spgp_init(pseudo, 0.4, kernel="matern32")
    n = 8 * 25
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)))
    var = jnp.full((n,), 1e-3)
    mask = jnp.asarray(rng.uniform(size=(n,)) < 0.9)
    mesh = make_mesh(8)
    sharded = sharded_spgp_update(mesh, state, x, y, var, mask, 0.4,
                                  kernel="matern32")
    local = spgp_update(state, x, y, var, mask, 0.4, kernel="matern32")
    np.testing.assert_allclose(sharded.qm, local.qm, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(sharded.alpha, local.alpha, rtol=1e-10,
                               atol=1e-10)


def test_sharded_spgp_predict_matches_single_device():
    """Query-sharded predict == unsharded predict (no collectives)."""
    import jax.numpy as jnp
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        spgp_init, spgp_prepare, spgp_predict, spgp_update,
    )
    from erl_gaussian_process_tpu.parallel import (
        make_mesh, sharded_spgp_predict,
    )

    rng = np.random.default_rng(0)
    pseudo = jnp.asarray(rng.uniform(-1, 1, (32, 2)))
    st = spgp_init(pseudo, 0.4, kernel="matern32")
    n = 64
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)))
    st = spgp_update(st, x, y, jnp.full((n,), 1e-3), jnp.ones(n, bool),
                     0.4, kernel="matern32")
    L_qm, a = spgp_prepare(st)
    xq = jnp.asarray(rng.uniform(-1, 1, (8 * 5, 2)))

    mesh = make_mesh(8)
    mean_s, var_s = sharded_spgp_predict(mesh, st, L_qm, a, xq, 0.4,
                                         kernel="matern32")
    mean_r, _, var_r = spgp_predict(st, L_qm, a, xq, 0.4, kernel="matern32")
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_r),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_r),
                               rtol=1e-10, atol=1e-12)


def test_sharded_bank_fit_pads_non_divisible_bank():
    """B not divisible by the mesh size: the bank is padded with empty
    members internally and the returned state is sliced back to B."""
    rng = np.random.default_rng(2)
    B, n = 13, 10
    x = jnp.asarray(rng.uniform(0, 1, (B, n, 1)))
    y = jnp.asarray(rng.uniform(-1, 1, (B, n, 1)))
    var = jnp.full((B, n), 1e-3)
    mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.8)
    mesh = make_mesh(8)
    sharded = sharded_bank_fit(mesh, x, y, var, mask, 0.3, kernel="rbf")
    local = bank_fit(x, y, var, mask, 0.3, kernel="rbf")
    assert sharded.L.shape[0] == B
    np.testing.assert_allclose(sharded.L, local.L, atol=1e-12)
    np.testing.assert_allclose(sharded.alpha, local.alpha, atol=1e-12)
    np.testing.assert_array_equal(sharded.trained, local.trained)


def _make_map(mesh, dtype, seed=0):
    from erl_gaussian_process_tpu.geometry import Aabb
    from erl_gaussian_process_tpu.kernels import KernelSetting
    from erl_gaussian_process_tpu.models import SpGpOccupancyMap
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpSetting,
    )
    from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
        SpGpOccupancyMapSetting,
    )

    setting = SpGpOccupancyMapSetting(
        sp_gp=SpGpSetting(kernel_type="matern32",
                          kernel=KernelSetting(x_dim=2, scale=0.18),
                          max_num_samples=2000),
        min_distance=0.0, max_distance=30.0, free_points_per_meter=3.0,
        free_sampling_margin=0.01, logodd_free=-1.0, logodd_occupied=1.0,
        logodd_variance=1e-4)
    c = np.linspace(-3, 3, 21)
    pv, qv = np.meshgrid(c, c, indexing="ij")
    pseudo = np.stack([pv.ravel(), qv.ravel()], axis=0)  # (2, 441)
    return SpGpOccupancyMap(
        setting, pseudo,
        Aabb.from_min_max([-3, -3], [3, 3]),
        seed=seed, dtype=dtype, free_slots_per_ray=20, mesh=mesh)


def _scan_batches(n_scans=4, n_rays=135, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for k in range(n_scans):
        origin = rng.uniform(-0.5, 0.5, 2)
        ang = np.linspace(-2.356, 2.356, n_rays) + 0.1 * k
        r = 2.0 + 0.4 * np.sin(3 * ang + k)
        pts = origin + np.stack([r * np.cos(ang), r * np.sin(ang)], axis=-1)
        out.append((origin, pts))
    return out


def test_spgp_map_class_mesh_matches_single_chip_f64():
    """SpGpOccupancyMap(mesh=): the fully fused sharded update (sampler +
    FITC) must reproduce the single-chip map. The sampler runs replicated
    with the identical per-step fold_in, so the sampled dataset is bitwise
    identical; in f64 the psum reassociation drift is negligible."""
    mesh = make_mesh(8)
    m_sh = _make_map(mesh, np.float64)
    m_ref = _make_map(None, np.float64)
    for origin, pts in _scan_batches():
        u1 = m_sh.update(origin, pts)
        u2 = m_ref.update(origin, pts)
        assert u1 == u2  # same sampler decisions -> same active count
    np.testing.assert_allclose(np.asarray(m_sh.sp_gp.state.qm),
                               np.asarray(m_ref.sp_gp.state.qm),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(m_sh.sp_gp.state.alpha),
                               np.asarray(m_ref.sp_gp.state.alpha),
                               rtol=1e-9, atol=1e-9)
    q = np.asarray(_scan_batches(1)[0][1][::5])
    lo_sh, _ = m_sh.predict(q)       # query-sharded path
    lo_ref, _ = m_ref.predict(q)
    np.testing.assert_allclose(lo_sh, lo_ref, rtol=1e-9, atol=1e-9)


def test_spgp_map_class_mesh_f32_drift_production_shape():
    """The psum-reassociation hazard (SURVEY.md §7 hard part 3), measured:
    a production-shaped f32 update (441 pseudo points, 135-ray scans,
    ~2.8k samples/scan) sharded 8 ways must stay within a few f32 ulps of
    the sequential accumulation, and the posterior logodds must agree in
    sign everywhere that matters."""
    mesh = make_mesh(8)
    m_sh = _make_map(mesh, np.float32)
    m_ref = _make_map(None, np.float32)
    for origin, pts in _scan_batches():
        m_sh.update(origin.astype(np.float32), pts.astype(np.float32))
        m_ref.update(origin.astype(np.float32), pts.astype(np.float32))
    qm_sh = np.asarray(m_sh.sp_gp.state.qm, np.float64)
    qm_ref = np.asarray(m_ref.sp_gp.state.qm, np.float64)
    al_sh = np.asarray(m_sh.sp_gp.state.alpha, np.float64)
    al_ref = np.asarray(m_ref.sp_gp.state.alpha, np.float64)
    # relative Frobenius drift of the accumulated information
    qm_drift = np.linalg.norm(qm_sh - qm_ref) / np.linalg.norm(qm_ref)
    al_drift = np.linalg.norm(al_sh - al_ref) / np.linalg.norm(al_ref)
    assert qm_drift < 5e-6, qm_drift
    assert al_drift < 5e-6, al_drift
    # downstream posterior: sign agreement + small mean drift
    q = np.asarray(_scan_batches(1)[0][1][::3], np.float32)
    lo_sh, _ = m_sh.predict(q)
    lo_ref, _ = m_ref.predict(q)
    scale = np.abs(lo_ref).max()
    assert np.abs(lo_sh - lo_ref).max() / scale < 1e-4
    assert np.mean(np.sign(lo_sh) == np.sign(lo_ref)) > 0.999


def test_lidar_gp_2d_class_mesh_matches_single_chip():
    """LidarGaussianProcess2D(mesh=): bank-sharded scan training must
    reproduce the single-chip class bit-for-bit in f64 (independent
    members, no collectives)."""
    from erl_gaussian_process_tpu.geometry.lidar_frame_2d import (
        LidarFrame2DSetting,
    )
    from erl_gaussian_process_tpu.models.lidar_gp_2d import (
        LidarGaussianProcess2D,
        LidarGP2DSetting,
    )

    def make(mesh):
        s = LidarGP2DSetting(
            sensor_frame=LidarFrame2DSetting(num_rays=180,
                                             angle_min=-2.356,
                                             angle_max=2.356))
        return LidarGaussianProcess2D(s, dtype=np.float64, mesh=mesh)

    lgp_sh = make(make_mesh(8))
    lgp_ref = make(None)
    ang = lgp_ref.sensor_frame.angles_in_frame
    ranges = 2.0 + 0.3 * np.sin(4 * ang)
    rot, tr = np.eye(2), np.zeros(2)
    assert lgp_sh.train(rot, tr, ranges)
    assert lgp_ref.train(rot, tr, ranges)
    # the partition bank (B is NOT typically divisible by 8 -> exercises
    # the pad-and-slice path)
    np.testing.assert_allclose(np.asarray(lgp_sh.bank.L),
                               np.asarray(lgp_ref.bank.L),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lgp_sh.bank.alpha),
                               np.asarray(lgp_ref.bank.alpha),
                               rtol=1e-12, atol=1e-12)
    qa = np.linspace(-2.0, 2.0, 57)
    r_sh = lgp_sh.test(qa, angles_are_local=True, un_map=True)
    r_ref = lgp_ref.test(qa, angles_are_local=True, un_map=True)
    m_sh, v_sh = r_sh.get_mean()
    m_ref, v_ref = r_ref.get_mean()
    np.testing.assert_array_equal(v_sh, v_ref)
    np.testing.assert_allclose(m_sh[v_sh], m_ref[v_ref],
                               rtol=1e-12, atol=1e-12)


def test_spgp_update_weak_scaling_shape():
    """Weak-scaling shape check (VERDICT r2 #7): at FIXED per-device sample
    count, the per-device compiled program must not grow with the mesh —
    XLA's cost analysis of the SPMD module (the per-device program) must
    report identical flops at D = 2, 4, 8, and every mesh size must agree
    with the sequential single-chip accumulation. This pins the structure
    the analytic ICI budget in docs/architecture.md relies on: local
    compute stays N/D while only the (M, M) psum is fixed-cost."""
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        spgp_init,
        spgp_update,
    )
    from erl_gaussian_process_tpu.parallel import sharded_spgp_update

    def build(D, n_per=192):
        mesh = make_mesh(D)
        c = np.linspace(-1, 1, 8)
        pv, qv = np.meshgrid(c, c, indexing="ij")
        pseudo = jnp.asarray(
            np.stack([pv.ravel(), qv.ravel()], -1).astype(np.float32))
        st = spgp_init(pseudo, np.float32(0.3), kernel="matern32")
        n = n_per * D
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(np.float32))
        var = jnp.full((n,), 1e-3, np.float32)
        mask = jnp.ones((n,), bool)
        return mesh, st, x, y, var, mask

    flops = {}
    for D in (2, 4, 8):
        mesh, st, x, y, var, mask = build(D)
        out = sharded_spgp_update(mesh, st, x, y, var, mask,
                                  np.float32(0.3), kernel="matern32")
        ref = spgp_update(st, x, y, var, mask, np.float32(0.3),
                          kernel="matern32")
        drift = float(jnp.linalg.norm(out.qm - ref.qm)
                      / jnp.linalg.norm(ref.qm))
        assert drift < 5e-6, (D, drift)  # psum reassociation only

        f = jax.jit(lambda st, x, y, var, mask: sharded_spgp_update(
            mesh, st, x, y, var, mask, np.float32(0.3), kernel="matern32"))
        ca = f.lower(st, x, y, var, mask).compile().cost_analysis()
        flops[D] = ca.get("flops")

    if all(v is not None for v in flops.values()):
        assert flops[2] == flops[4] == flops[8], flops


def test_sharded_spgp_sparse_semantics_match_single_chip():
    """UpdateSparse/ComputeKtestSparse semantics (zero_threshold > 0,
    diagonal_qm) must produce the SAME posterior sharded as single-chip —
    a sparse-configured map with mesh= used to silently drop the
    threshold (round-3 review finding)."""
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        spgp_predict, spgp_prepare,
    )
    from erl_gaussian_process_tpu.parallel import sharded_spgp_predict

    rng = np.random.default_rng(7)
    pseudo = jnp.asarray(rng.uniform(-1, 1, (16, 2)))
    st0 = spgp_init(pseudo, 0.25, kernel="matern32", diagonal_qm=True)
    n = 8 * 6
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)))
    var = jnp.full((n,), 1e-3)
    mask = jnp.ones(n, bool)
    zt = 0.3  # large enough that thresholding visibly changes the update
    mesh = make_mesh(8)

    def fresh():
        # spgp_update donates its state arg, so each call needs its own
        return spgp_init(pseudo, 0.25, kernel="matern32", diagonal_qm=True)

    sharded = sharded_spgp_update(mesh, st0, x, y, var, mask, 0.25,
                                  kernel="matern32", diagonal_qm=True,
                                  zero_threshold=zt)
    local = spgp_update(fresh(), x, y, var, mask, 0.25, kernel="matern32",
                        diagonal_qm=True, zero_threshold=zt)
    np.testing.assert_allclose(sharded.qm, local.qm, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(sharded.alpha, local.alpha,
                               rtol=1e-10, atol=1e-10)
    # the knob is live: thresholded != dense
    dense = spgp_update(fresh(), x, y, var, mask, 0.25, kernel="matern32",
                        diagonal_qm=True)
    assert np.abs(np.asarray(sharded.alpha) - np.asarray(dense.alpha)).max() \
        > 1e-6

    L_qm, a = spgp_prepare(local, diagonal_qm=True)
    xq = jnp.asarray(rng.uniform(-1, 1, (8 * 4, 2)))
    mean_s, var_s = sharded_spgp_predict(mesh, local, L_qm, a, xq, 0.25,
                                         kernel="matern32",
                                         zero_threshold=zt)
    mean_r, _, var_r = spgp_predict(local, L_qm, a, xq, 0.25,
                                    kernel="matern32", zero_threshold=zt)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_r),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_r),
                               rtol=1e-10, atol=1e-12)
    mean_d, _, _ = spgp_predict(local, L_qm, a, xq, 0.25, kernel="matern32")
    assert np.abs(np.asarray(mean_s) - np.asarray(mean_d)).max() > 1e-6


def test_sharded_update_many_matches_single_chip_chunked():
    """The many-scan fused rank-N update (sharded_update_many) — the
    regime where the mesh's fixed (M, M) psum amortizes — must reproduce
    the single-chip chunked replay (update_batch poses_per_step=c): same
    per-pose sampler decisions (bitwise-identical fold_in), posterior
    equal up to psum reassociation. Covers VERDICT r4 weak #5: the
    winning-regime configuration now has a correctness-at-scale gate."""
    c = 8
    mesh = make_mesh(8)
    m_sh = _make_map(mesh, np.float64)
    m_ref = _make_map(None, np.float64)
    scans = _scan_batches(n_scans=2 * c)
    sensors = np.stack([s for s, _ in scans])
    pts = np.stack([p for _, p in scans])
    masks = np.ones(pts.shape[:2], bool)

    used_sh = m_sh.update_batch(sensors, pts, masks, poses_per_step=c)
    used_ref = np.asarray(m_ref.update_batch(sensors, pts, masks,
                                             poses_per_step=c))
    np.testing.assert_array_equal(used_sh, used_ref)
    assert m_sh.step == m_ref.step == 2 * c
    np.testing.assert_allclose(np.asarray(m_sh.sp_gp.state.qm),
                               np.asarray(m_ref.sp_gp.state.qm),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(m_sh.sp_gp.state.alpha),
                               np.asarray(m_ref.sp_gp.state.alpha),
                               rtol=1e-9, atol=1e-9)
    q = np.asarray(_scan_batches(1)[0][1][::5])
    lo_sh, _ = m_sh.predict(q)
    lo_ref, _ = m_ref.predict(q)
    np.testing.assert_allclose(lo_sh, lo_ref, rtol=1e-8, atol=1e-9)


def test_sharded_update_many_f32_drift_production_shape():
    """f32 psum-reassociation drift of the fused 8-pose sharded update at
    production shape stays at the few-ulp level, like the per-pose path."""
    c = 8
    mesh = make_mesh(8)
    m_sh = _make_map(mesh, np.float32)
    m_ref = _make_map(None, np.float32)
    scans = _scan_batches(n_scans=c)
    sensors = np.stack([s for s, _ in scans]).astype(np.float32)
    pts = np.stack([p for _, p in scans]).astype(np.float32)
    masks = np.ones(pts.shape[:2], bool)
    m_sh.update_batch(sensors, pts, masks, poses_per_step=c)
    m_ref.update_batch(sensors, pts, masks, poses_per_step=c)
    qm_sh = np.asarray(m_sh.sp_gp.state.qm, np.float64)
    qm_ref = np.asarray(m_ref.sp_gp.state.qm, np.float64)
    drift = np.linalg.norm(qm_sh - qm_ref) / np.linalg.norm(qm_ref)
    assert drift < 5e-6, drift
