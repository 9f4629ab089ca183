"""AOT export/deployment artifacts (utils/deploy.py, jax.export).

A serving host loads a bytes blob and runs the fused step with no model
code and no tracing; artifacts are multi-platform (tpu + cpu in one blob)
and shape-checked at call time. These tests round-trip the flagship map
update and predict artifacts through serialize -> deserialize -> execute
on the CPU platform, and pin agreement with the live (traced) functions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erl_gaussian_process_tpu.geometry import Aabb
from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.models import SpGpOccupancyMap
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
    SpGpSetting,
    spgp_init,
    spgp_prepare,
)
from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
    SpGpOccupancyMapSetting,
    predict_prepared_step,
    update_step,
)
from erl_gaussian_process_tpu.utils.deploy import (
    export_fn,
    export_map_predict_step,
    export_map_update_step,
    load_fn,
)

N_PSEUDO_SIDE = 8      # 64 pseudo points
N_RAYS = 32
SLOTS = 4

# Export single-platform artifacts for the backend THIS suite runs on: a
# deserialized artifact refuses to execute on a platform it was not
# lowered for, and the suite runs both on the CPU mesh (default) and on
# the real chip (ERL_GP_TEST_TPU=1; observed on-chip failure 2026-08-19).
_HERE = (jax.default_backend(),)


def _setting():
    return SpGpOccupancyMapSetting(
        sp_gp=SpGpSetting(kernel_type="matern32",
                          kernel=KernelSetting(x_dim=2, scale=0.3),
                          max_num_samples=256),
        min_distance=0.0, max_distance=30.0, free_points_per_meter=2.0,
        free_sampling_margin=0.02, logodd_free=-1.0, logodd_occupied=1.0,
        logodd_variance=1e-4)


def _state(dtype=np.float32):
    c = np.linspace(-1, 1, N_PSEUDO_SIDE, dtype=dtype)
    pv, qv = np.meshgrid(c, c, indexing="ij")
    pseudo = jnp.asarray(np.stack([pv.ravel(), qv.ravel()], axis=-1))
    return spgp_init(pseudo, dtype(0.3), kernel="matern32")


def _scan(dtype=np.float32):
    ang = np.linspace(-2.0, 2.0, N_RAYS, dtype=dtype)
    pts = jnp.asarray(np.stack([2 * np.cos(ang), 2 * np.sin(ang)], axis=-1))
    return pts, jnp.ones(N_RAYS, bool)


def test_map_update_artifact_round_trip():
    s = _setting()
    blob = export_map_update_step(
        s, n_pseudo=N_PSEUDO_SIDE**2, n_rays=N_RAYS, free_slots=SLOTS,
        platforms=_HERE)
    assert isinstance(blob, bytes) and len(blob) > 1000
    step = load_fn(blob)

    st = _state()
    key = jax.random.PRNGKey(0)
    pts, mask = _scan()
    lo = jnp.asarray(np.array([-3.0, -3.0], np.float32))
    hi = jnp.asarray(np.array([3.0, 3.0], np.float32))
    new_state, n_used = step(st, key, jnp.int32(1), jnp.zeros(2, jnp.float32),
                             pts, mask, lo, hi, np.float32(0.3))
    assert int(n_used) > 0
    assert bool(jnp.isfinite(new_state.qm).all())

    # agreement with the live (traced) step — identical program, so
    # identical results
    ref_state, ref_n = update_step(
        st, key, jnp.int32(1), jnp.zeros(2, jnp.float32), pts, mask, lo, hi,
        np.float32(0.3), kernel="matern32", diagonal_qm=False,
        free_slots=SLOTS, max_samples=256, min_distance=0.0,
        max_distance=30.0, free_sampling_margin=0.02,
        free_points_per_meter=2.0, logodd_occupied=1.0, logodd_free=-1.0,
        logodd_variance=1e-4)
    assert int(ref_n) == int(n_used)
    np.testing.assert_array_equal(np.asarray(new_state.qm),
                                  np.asarray(ref_state.qm))


def test_map_predict_artifact_round_trip():
    st = _state()
    # accumulate one update so the posterior is non-trivial
    key = jax.random.PRNGKey(0)
    pts, mask = _scan()
    lo = jnp.asarray(np.array([-3.0, -3.0], np.float32))
    hi = jnp.asarray(np.array([3.0, 3.0], np.float32))
    st, _ = update_step(
        st, key, jnp.int32(1), jnp.zeros(2, jnp.float32), pts, mask, lo, hi,
        np.float32(0.3), kernel="matern32", diagonal_qm=False,
        free_slots=SLOTS, max_samples=256, min_distance=0.0,
        max_distance=30.0, free_sampling_margin=0.02,
        free_points_per_meter=2.0, logodd_occupied=1.0, logodd_free=-1.0,
        logodd_variance=1e-4)
    L_qm, a = spgp_prepare(st)

    nq = 16
    blob = export_map_predict_step(
        n_pseudo=N_PSEUDO_SIDE**2, n_queries=nq, platforms=_HERE)
    predict = load_fn(blob)
    q = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (nq, 2)).astype(np.float32))
    mean, grad = predict(st, L_qm, a, q, np.float32(0.3))
    assert grad is None
    ref_mean, _ = predict_prepared_step(st, L_qm, a, q, np.float32(0.3),
                                        kernel="matern32", with_grad=False)
    np.testing.assert_array_equal(np.asarray(mean), np.asarray(ref_mean))


def test_artifact_rejects_wrong_shapes():
    blob = export_map_predict_step(n_pseudo=N_PSEUDO_SIDE**2, n_queries=16,
                                   platforms=_HERE)
    predict = load_fn(blob)
    st = _state()
    L_qm, a = spgp_prepare(st)
    bad_q = jnp.zeros((7, 2), jnp.float32)   # wrong query-bucket shape
    with pytest.raises(Exception):
        predict(st, L_qm, a, bad_q, np.float32(0.3))


def test_multiplatform_artifact_carries_tpu():
    """One blob lowered for BOTH tpu and cpu: serving fleets and CPU
    fallbacks load the same artifact. (Execution on tpu is covered by the
    on-chip ritual; here we pin that the tpu lowering serializes and that
    the cpu leg of the same artifact executes.)"""
    from jax import export as jexport

    s = _setting()
    blob = export_map_update_step(
        s, n_pseudo=N_PSEUDO_SIDE**2, n_rays=N_RAYS, free_slots=SLOTS,
        platforms=("tpu", "cpu"))
    exp = jexport.deserialize(blob)
    assert set(exp.platforms) == {"tpu", "cpu"}
    st = _state()
    pts, mask = _scan()
    out_state, n_used = exp.call(
        st, jax.random.PRNGKey(0), jnp.int32(1), jnp.zeros(2, jnp.float32),
        pts, mask, jnp.asarray([-3.0, -3.0], jnp.float32),
        jnp.asarray([3.0, 3.0], jnp.float32), np.float32(0.3))
    assert bool(jnp.isfinite(out_state.qm).all())


def test_generic_export_fn_vanilla_predict():
    """export_fn works for arbitrary jitted model functions — here the
    exact-GP predict (the serving half of the regression workload)."""
    from erl_gaussian_process_tpu.models.vanilla_gp import (
        vanilla_fit,
        vanilla_predict,
    )

    n, m, d = 64, 32, 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)).astype(np.float32))
    y = jnp.asarray(np.sin(3 * np.asarray(x))).astype(jnp.float32)
    var = jnp.full((n,), 1e-3, jnp.float32)
    mask = jnp.ones((n,), bool)
    st = vanilla_fit(x, y, var, mask, np.float32(0.4), kernel="rbf")

    S = jax.ShapeDtypeStruct
    blob = export_fn(
        lambda st, xq, s: vanilla_predict(st, xq, s, kernel="rbf"),
        jax.eval_shape(lambda: st), S((m, d), jnp.float32),
        S((), jnp.float32), platforms=_HERE)
    predict = load_fn(blob)
    xq = jnp.asarray(rng.uniform(-1, 1, (m, d)).astype(np.float32))
    mean, varp = predict(st, xq, np.float32(0.4))
    ref_mean, ref_var = vanilla_predict(st, xq, np.float32(0.4), kernel="rbf")
    np.testing.assert_array_equal(np.asarray(mean), np.asarray(ref_mean))
    np.testing.assert_array_equal(np.asarray(varp), np.asarray(ref_var))


def test_polymorphic_predict_artifact_serves_any_batch():
    """n_queries=None exports with a symbolic query dimension: ONE artifact
    serves every batch size (the Pallas gates detect the symbolic dim and
    keep the numerically-identical XLA path)."""
    st = _state()
    L_qm, a = spgp_prepare(st)
    blob = export_map_predict_step(n_pseudo=N_PSEUDO_SIDE**2,
                                   n_queries=None, platforms=("tpu", "cpu"))
    predict = load_fn(blob)
    rng = np.random.default_rng(2)
    for nq in (3, 33, 200):
        q = jnp.asarray(rng.uniform(-1, 1, (nq, 2)).astype(np.float32))
        mean, _ = predict(st, L_qm, a, q, np.float32(0.3))
        assert mean.shape == (nq, 1)
        ref, _ = predict_prepared_step(st, L_qm, a, q, np.float32(0.3),
                                       kernel="matern32", with_grad=False)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref),
                                   rtol=1e-6, atol=1e-7)


def test_map_update_artifact_bakes_mixture_kernel():
    """A scale-mixture-configured map must export an artifact running the
    SAME mixture kernel as the live step — not a plain-base-kernel
    heuristic that silently accumulates a different posterior (round-3
    review finding on export_map_update_step's kernel resolution)."""
    from erl_gaussian_process_tpu.kernels import resolve_kernel_setting

    s = _setting()
    s.sp_gp.kernel = KernelSetting(x_dim=2, scale=0.3, scale_mix=0.5,
                                   weights=[0.7, 0.3])
    blob = export_map_update_step(
        s, n_pseudo=N_PSEUDO_SIDE**2, n_rays=N_RAYS, free_slots=SLOTS,
        platforms=_HERE)
    step = load_fn(blob)

    kernel = resolve_kernel_setting(s.sp_gp.kernel_type, s.sp_gp.kernel)
    st = spgp_init(_state().pseudo, np.float32(0.3), kernel=kernel)
    key = jax.random.PRNGKey(3)
    pts, mask = _scan()
    lo = jnp.asarray(np.array([-3.0, -3.0], np.float32))
    hi = jnp.asarray(np.array([3.0, 3.0], np.float32))
    got, n_used = step(st, key, jnp.int32(1), jnp.zeros(2, jnp.float32),
                       pts, mask, lo, hi, np.float32(0.3))

    ref, _ = update_step(
        spgp_init(_state().pseudo, np.float32(0.3), kernel=kernel),
        key, jnp.int32(1), jnp.zeros(2, jnp.float32), pts, mask, lo, hi,
        np.float32(0.3), kernel=kernel, diagonal_qm=False,
        free_slots=SLOTS, max_samples=256, min_distance=0.0,
        max_distance=30.0, free_sampling_margin=0.02,
        free_points_per_meter=2.0, logodd_occupied=1.0, logodd_free=-1.0,
        logodd_variance=1e-4)
    assert int(n_used) > 0
    np.testing.assert_array_equal(np.asarray(got.qm), np.asarray(ref.qm))

    # and the mixture is live: it differs from the plain-matern32 artifact
    plain, _ = update_step(
        _state(), key, jnp.int32(1), jnp.zeros(2, jnp.float32), pts, mask,
        lo, hi, np.float32(0.3), kernel="matern32", diagonal_qm=False,
        free_slots=SLOTS, max_samples=256, min_distance=0.0,
        max_distance=30.0, free_sampling_margin=0.02,
        free_points_per_meter=2.0, logodd_occupied=1.0, logodd_free=-1.0,
        logodd_variance=1e-4)
    assert np.abs(np.asarray(got.qm) - np.asarray(plain.qm)).max() > 1e-6
