"""Benchmark suite beyond the headline (bench.py stays the single-line
driver metric). Prints one JSON object per line.

Covers the BASELINE.json metric set: exact-GP fit+predict points/sec at
n = 2k-8k, the batched partition-bank fit (the lidar workload), and SPGP
map-update rate at the production shape. Run with JAX_PLATFORMS='' for TPU.
"""

import json
import os
import sys
import time

# runnable as `python benchmarks/suite.py` from the repo root without
# PYTHONPATH (sys.path[0] is benchmarks/, not the repo)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from erl_gaussian_process_tpu.models.batch_gp import bank_fit
from erl_gaussian_process_tpu.models.noisy_input_gp import (
    nigp_fit,
    nigp_gradient,
    nigp_ktest,
    nigp_mean,
    nigp_variance_cov,
)
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
    pad_pseudo_points,
    spgp_init,
    spgp_update,
)
from erl_gaussian_process_tpu.models.vanilla_gp import (
    vanilla_fit,
    vanilla_predict,
)

DTYPE = np.float32


def _time(fn, iters=50, warmup=None):
    """Device-only time per call of ``fn(eps) -> pytree``, measured as the
    slope between an ``iters``-step and a ``3*iters``-step jitted
    ``lax.fori_loop`` whose carry is fn's FULL output pytree.

    Methodology notes (every shortcut here was observed to lie on the
    remote-TPU tunnel):
    - carrying only a scalar derived from the output lets XLA dead-code-
      eliminate the op (only [0,0] of a matmul is consumed -> it times a
      single dot product, 20x past roofline);
    - independent identical dispatches can be deduped/cached by the runtime;
    - per-invocation fixed cost (input staging + dispatch) is tens of ms and
      dominates small iteration counts — the two-point slope cancels it.
    The carry is the whole output (fixed shapes), and the next input is
    perturbed by carry-leaf[0...]*1e-30, forcing sequential execution of the
    full computation each step.
    """
    del warmup

    def eps_of(out):
        # EVERY non-bool leaf contributes to the next input: if any computed
        # quantity (e.g. the Cholesky factor) does not feed the dependency
        # chain, the compiler is free to elide it from all but the last
        # iteration and the slope collapses to zero (observed).
        s = sum(leaf[(0,) * leaf.ndim].astype(DTYPE)
                for leaf in jax.tree_util.tree_leaves(out)
                if leaf.dtype != jnp.bool_)
        return s * DTYPE(1e-30)

    # operands must be jit ARGUMENTS: a closure would embed multi-hundred-MB
    # states as jaxpr constants (the remote compiler rejects the request)
    consts = getattr(fn, "consts", ())

    def make(n):
        @jax.jit
        def loop(out0, consts):
            return jax.lax.fori_loop(
                0, n, lambda i, out: fn(eps_of(out), *consts), out0)
        return loop

    out0 = fn(jnp.zeros((), DTYPE), *consts)
    _fetch(out0)
    # every timed invocation gets a bit-unique argument: the runtime caches
    # repeat executions of (same executable, same buffers) and returns in
    # ~0.1 ms (observed) — fresh inputs defeat the cache
    variants = []
    for k in range(4):
        v = jax.tree_util.tree_map(
            lambda a: a + np.asarray(1e-7 * (k + 1), a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, out0)
        _fetch(v)
        variants.append(v)
    l1, l3 = make(iters), make(3 * iters)
    _fetch(l1(out0, consts))  # compile + warm
    _fetch(l3(out0, consts))
    t1 = min(_wall(l1, variants[0], consts), _wall(l1, variants[1], consts))
    t3 = min(_wall(l3, variants[2], consts), _wall(l3, variants[3], consts))
    _time.last_totals = (iters, t1 * 1e3, 3 * iters, t3 * 1e3)
    return max(t3 - t1, 1e-9) / (2 * iters)


def _fetch(out):
    """Forced device->host scalar fetch — the only reliable execution
    barrier on this backend (block_until_ready has been observed to return
    while 80+ s of work remained queued)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf[(0,) * leaf.ndim]))


def _wall(loop, arg, consts):
    t0 = time.perf_counter()
    _fetch(loop(arg, consts))
    return time.perf_counter() - t0


def emit(**kv):
    print(json.dumps(kv))


# --- roofline anchors --------------------------------------------------------
# Every metric carries its FLOP count and %-of-peak so regressions and
# floor-distance are visible without re-measurement context (VERDICT r2 #6).
# Peaks are for ONE v5e chip:
# - MXU at the compute path's precision: the f32 path runs
#   BF16_BF16_F32_X3 (see models/gp_core._MATMUL_PRECISION) — 62 TFLOP/s
#   MEASURED on this chip (gp_core.py:24-31 records the sweep; theoretical
#   = 197 TFLOP/s bf16 nameplate / 3 passes = 65.7).
# - HBM: 819 GB/s nameplate.
# FLOP conventions (1 FMA = 2 flops): chol(n) = n^3/3; trsm(n,q) = n^2*q;
# GEMM (a,b)x(b,c) = 2abc; distance gram (n,m,d) = 3*d*n*m (sub/mul/acc;
# the transcendental map is VPU-side and uncounted).
PEAK_MXU_X3 = 62e12
PEAK_HBM = 819e9


def _on_tpu():
    return jax.default_backend() == "tpu"


def roof(t_seconds, flops=None, hbm_bytes=None):
    """Roofline fields for one measurement: achieved flops + % of the
    measured X3 MXU peak, and/or achieved bandwidth + % of HBM peak.
    Percentages only on real TPU hardware (meaningless on the CPU mesh)."""
    out = {}
    if flops is not None:
        out["gflops"] = round(flops / t_seconds / 1e9, 1)
        out["flops"] = int(flops)
        if _on_tpu():
            out["pct_peak"] = round(100.0 * flops / t_seconds / PEAK_MXU_X3,
                                    1)
    if hbm_bytes is not None:
        out["gbps"] = round(hbm_bytes / t_seconds / 1e9, 1)
        if _on_tpu():
            out["pct_hbm"] = round(
                100.0 * hbm_bytes / t_seconds / PEAK_HBM, 1)
    return out


def fit_flops(n, d, q=1):
    """vanilla_fit: gram + noise diag, chol, two trsm solves of q cols."""
    return n**3 / 3 + 3 * d * n * n + 2 * n * n * q


def predict_flops(n, m, d, q=1):
    """cross gram + one trsm whiten + mean dot + variance reduce."""
    return n * n * m + 3 * d * n * m + 2 * n * m * q + 2 * n * m


_FIT_ITERS = {2048: 20, 4096: 8, 8192: 3}


def bench_vanilla(n, m_test=4096, d=2):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)).astype(DTYPE))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(DTYPE))
    # var must sit in the float32-FEASIBLE regime: at n >= 4k the dense RBF
    # gram's norm is ~1e3-1e4, so storage rounding alone perturbs it by
    # ~1e-4 — var below that makes the system numerically indefinite for
    # ANY f32 factorization (verified: XLA's 6-pass chol NaNs at var=1e-4,
    # n=4096). The class API recovers via host jitter retry; the raw-fn
    # benchmark must use a feasible noise so it times a REAL factorization.
    var = jnp.full((n,), 1e-2, DTYPE)
    mask = jnp.ones((n,), bool)
    xq = jnp.asarray(rng.uniform(-1, 1, (m_test, d)).astype(DTYPE))
    scale = DTYPE(0.5)

    fit_fn = lambda e, x, y, var, mask: vanilla_fit(  # noqa: E731
        x + e, y, var, mask, scale, kernel="rbf")
    fit_fn.consts = (x, y, var, mask)
    t_fit = _time(fit_fn, iters=_FIT_ITERS.get(n, 10))
    st = vanilla_fit(x, y, var, mask, scale, kernel="rbf")
    assert np.isfinite(np.asarray(st.L)).all(), "fit produced NaN factor"
    assert np.isfinite(np.asarray(st.alpha)).all()
    pred_fn = lambda e, st, xq: vanilla_predict(  # noqa: E731
        st, xq + e, scale, kernel="rbf")
    pred_fn.consts = (st, xq)
    t_pred = _time(pred_fn, iters=20 if n >= 8192 else 50)
    emit(metric=f"vanilla_gp_fit_n{n}", value=round(n / t_fit), unit="pts/s",
         ms=round(t_fit * 1e3, 3), **roof(t_fit, flops=fit_flops(n, d)))
    # predict is HBM-bound at thin q: factor read once + ktest in/out
    pred_bytes = 4 * (n * n + 3 * n * m_test)
    emit(metric=f"vanilla_gp_predict_n{n}_m{m_test}",
         value=round(m_test / t_pred), unit="queries/s",
         ms=round(t_pred * 1e3, 3),
         **roof(t_pred, flops=predict_flops(n, m_test, d),
                hbm_bytes=pred_bytes))


def bench_bank(B=128, n=32, d=1):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, n, d)).astype(DTYPE))
    y = jnp.asarray(rng.uniform(-1, 1, (B, n, 1)).astype(DTYPE))
    var = jnp.full((B, n), 1e-2, DTYPE)
    mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.9)
    fn = lambda e, x, y, var, mask: bank_fit(  # noqa: E731
        x + e, y, var, mask, DTYPE(0.2), kernel="ou")
    fn.consts = (x, y, var, mask)
    t = _time(fn)
    emit(metric=f"bank_fit_B{B}_n{n}", value=round(B / t), unit="gps/s",
         ms=round(t * 1e3, 3), **roof(t, flops=B * fit_flops(n, d)))


def bench_bank_sweep():
    """The reference's batched-GP profiling sweep (test_batch_gp_update_torch
    .cpp:132-141): B in {1, 10, 100, 1000, 10000} GPs of N=100 samples,
    CPU-vs-CUDA there, one vmapped MXU batch here."""
    rng = np.random.default_rng(0)
    for B in (1, 10, 100, 1000, 10000):
        n, d = 100, 2
        x = jnp.asarray(rng.uniform(-1, 1, (B, n, d)).astype(DTYPE))
        y = jnp.asarray(rng.uniform(-1, 1, (B, n, 1)).astype(DTYPE))
        var = jnp.full((B, n), 1e-2, DTYPE)
        mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.9)
        fn = lambda e, x, y, var, mask: bank_fit(  # noqa: E731
            x + e, y, var, mask, DTYPE(0.3), kernel="rbf")
        fn.consts = (x, y, var, mask)
        t = _time(fn, iters=max(3, min(50, 2000 // B)))
        emit(metric=f"bank_sweep_B{B}_n100", value=round(B / t),
             unit="gps/s", ms=round(t * 1e3, 3),
             **roof(t, flops=B * fit_flops(n, d)))


def bench_nigp(n=2500, d=2, m_test=1024):
    """NIGP with gradient observations at the reference's hardest test shape
    (test_noisy_input_gp.cpp 2D cases): the joint value/gradient system is
    (n(1+d))^2 = 7500^2, the largest single Cholesky in the reference.
    n is padded to a 128 multiple like the model layer does (the padded
    joint system takes the Pallas blocked solve)."""
    n = -(-n // 128) * 128
    rng = np.random.default_rng(0)
    scale = DTYPE(0.5)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)).astype(DTYPE))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(DTYPE))
    grad = jnp.asarray(rng.uniform(-1, 1, (n, d, 1)).astype(DTYPE))
    var_x = jnp.full((n,), 1e-6, DTYPE)
    # f32-feasible noise (see bench_vanilla: storage rounding of the joint
    # gram makes smaller var indefinite at this system size)
    var_y = jnp.full((n,), 1e-2, DTYPE)
    var_grad = jnp.full((n,), 1e-2, DTYPE)
    mask = jnp.ones((n,), bool)
    gmask = jnp.ones((n,), bool)
    xq = jnp.asarray(rng.uniform(-1, 1, (m_test, d)).astype(DTYPE))

    fit_fn = lambda e, x, y, g, vx, vy, vg, m, gm: nigp_fit(  # noqa: E731
        x + e, y, g, vx, vy, vg, m, gm, scale, kernel="rbf")
    fit_fn.consts = (x, y, grad, var_x, var_y, var_grad, mask, gmask)
    t_fit = _time(fit_fn, iters=3)
    N = n * (1 + d)   # joint value/gradient system size
    emit(metric=f"nigp_fit_n{n}_d{d}", value=round(n / t_fit),
         unit="pts/s", ms=round(t_fit * 1e3, 3),
         **roof(t_fit, flops=N**3 / 3 + 3 * d * N * N))

    st = nigp_fit(x, y, grad, var_x, var_y, var_grad, mask, gmask, scale,
                  kernel="rbf")
    assert np.isfinite(np.asarray(st.L)).all(), "NIGP fit produced NaN"

    def pred(e, st, xq):
        kt = nigp_ktest(st, xq + e, scale, kernel="rbf",
                        with_test_grad=True, with_train_grad=True)
        mu = nigp_mean(st, kt, m_test)
        g = nigp_gradient(st, kt, m_test, d)
        mv, gv, cov = nigp_variance_cov(st, kt, scale, d=d)
        return (mu, g, mv, gv, cov)

    pred.consts = (st, xq)
    t_pred = _time(pred, iters=10)
    M = m_test * (1 + d)  # joint query columns (means + dim-major grads)
    emit(metric=f"nigp_predict_n{n}_d{d}_m{m_test}",
         value=round(m_test / t_pred), unit="queries/s",
         ms=round(t_pred * 1e3, 3),
         **roof(t_pred, flops=N * N * M + 3 * d * N * M,
                hbm_bytes=4 * (N * N + 3 * N * M)))

    # serving path: small repeated query batches whiten with the amortized
    # explicit L^{-1} GEMM (models/noisy_input_gp.nigp_l_inv) — the class
    # switches to it from the second batch on when the RHS is thin
    # (<=512 whiten columns; at wide batches the trsm wins, measured)
    from erl_gaussian_process_tpu.models.noisy_input_gp import (
        nigp_l_inv,
        nigp_variance_cov_fast,
    )
    L_inv = nigp_l_inv(st)
    m_small = 128
    xq_s = jnp.asarray(rng.uniform(-1, 1, (m_small, d)).astype(DTYPE))

    def serving(fast):
        def pred_s(e, st, L_inv, xq_s):
            kt = nigp_ktest(st, xq_s + e, scale, kernel="rbf",
                            with_test_grad=True, with_train_grad=True)
            mu = nigp_mean(st, kt, m_small)
            g = nigp_gradient(st, kt, m_small, d)
            if fast:
                mv, gv, cov = nigp_variance_cov_fast(L_inv, kt, scale, d=d)
            else:
                mv, gv, cov = nigp_variance_cov(st, kt, scale, d=d)
            return (mu, g, mv, gv, cov)
        pred_s.consts = (st, L_inv, xq_s)
        return _time(pred_s, iters=20)

    t_trsm, t_srv = serving(False), serving(True)
    emit(metric=f"nigp_predict_serving_n{n}_d{d}_m{m_small}",
         value=round(m_small / t_srv), unit="queries/s",
         ms=round(t_srv * 1e3, 3), trsm_ms=round(t_trsm * 1e3, 3))


def bench_lidar_scan_train(rounds=5):
    """End-to-end LidarGaussianProcess2D scan training on the reference's
    real logged scans (data/double/train.dat, 28 scans x 270 rays, the
    test_lidar_gp_2d.cpp workload): host-side frame/partition packing +
    one bank_fit dispatch per scan. Wall-clock includes the host work —
    this is the honest online-sensor number, not a device-only slope."""
    from erl_gaussian_process_tpu.geometry import LidarFrame2DSetting
    from erl_gaussian_process_tpu.kernels import KernelSetting
    from erl_gaussian_process_tpu.models import LidarGaussianProcess2D
    from erl_gaussian_process_tpu.models.lidar_gp_2d import LidarGP2DSetting
    from erl_gaussian_process_tpu.models.mapping import (
        MappingSetting,
        MappingType,
    )
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting
    from erl_gaussian_process_tpu.utils.loaders import load_lidar_log

    frames = load_lidar_log(os.path.join(
        os.path.dirname(__file__), os.pardir, "data", "double", "train.dat"))
    f0 = frames[0]
    setting = LidarGP2DSetting(
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
        mapping=MappingSetting(type=MappingType.IDENTITY))
    gp = LidarGaussianProcess2D(setting, dtype=DTYPE)
    eye, zero = np.eye(2), np.zeros(2)

    def fetch():
        return float(np.asarray(gp.bank.alpha)[(0, 0, 0)])

    for f in frames:   # warm-up: compile + one full pass
        gp.train(eye, zero, f.ranges)
    fetch()
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        for f in frames:
            gp.train(eye, zero, f.ranges)
        fetch()
        best = min(best, (time.perf_counter() - t0) / len(frames))
    emit(metric="lidar_gp_2d_scan_train", value=round(1.0 / best, 1),
         unit="scans/s", ms=round(best * 1e3, 3))

    # offline replay: the whole log in ONE dispatch (train_scan_batch) —
    # the TPU-throughput mode; per-scan dispatch latency amortizes away
    rb = np.stack([f.ranges for f in frames]).astype(DTYPE)
    stacked = gp.train_scan_batch(rb)  # compile
    float(np.asarray(stacked.alpha)[(0, 0, 0)])
    best_b = np.inf
    for i in range(rounds):
        rbi = rb + DTYPE(1e-6) * (i + 1)  # distinct inputs: no dedup
        t0 = time.perf_counter()
        out = gp.train_scan_batch(rbi)
        float(np.asarray(out.alpha)[(0, 0, 0)])
        best_b = min(best_b, (time.perf_counter() - t0) / len(frames))
    emit(metric="lidar_gp_2d_scan_train_batch", value=round(1.0 / best_b, 1),
         unit="scans/s", ms=round(best_b * 1e3, 3), scans=len(frames))


def _make_range_sensor_3d_gp():
    """The 3D sensor GP + synthetic scans both 3D-train benches share
    (reference scan shape: test_range_sensor_gp_3d.cpp 271x91 lidar)."""
    from erl_gaussian_process_tpu.geometry.frames_3d import (
        LidarFrame3DSetting,
    )
    from erl_gaussian_process_tpu.kernels import KernelSetting
    from erl_gaussian_process_tpu.models import RangeSensorGaussianProcess3D
    from erl_gaussian_process_tpu.models.mapping import (
        MappingSetting,
        MappingType,
    )
    from erl_gaussian_process_tpu.models.range_sensor_gp_3d import (
        RangeSensorGP3DSetting,
    )
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting

    gp = RangeSensorGaussianProcess3D(RangeSensorGP3DSetting(
        row_group_size=12, row_overlap_size=4, col_group_size=12,
        col_overlap_size=4, min_num_samples_per_group=10,
        sensor_range_var=1e-4, max_valid_range_var=0.1,
        sensor_frame_type="lidar",
        sensor_frame=LidarFrame3DSetting(
            valid_range_min=0.1, valid_range_max=40.0,
            azimuth_min=-np.pi, azimuth_max=np.pi,
            elevation_min=-0.8, elevation_max=0.8,
            num_azimuth_lines=271, num_elevation_lines=91),
        gp=VanillaGPSetting(kernel_type="ou",
                            kernel=KernelSetting(x_dim=2, scale=0.5)),
        mapping=MappingSetting(type=MappingType.IDENTITY)), dtype=DTYPE)
    dirs = gp.sensor_frame.ray_directions_in_frame()
    az = np.arctan2(dirs[..., 1], dirs[..., 0])
    el = np.arctan2(dirs[..., 2], np.hypot(dirs[..., 0], dirs[..., 1]))
    rng = np.random.default_rng(0)
    # a few distinct scans so the runtime can't dedup identical dispatches
    scans = [(5.0 + 0.5 * np.sin(3 * az + p) * np.cos(2 * el)
              ).astype(DTYPE) for p in rng.uniform(0, 6.28, 8)]
    return gp, scans


def bench_range_sensor_3d_train(rounds=5):
    """End-to-end RangeSensorGaussianProcess3D scan training at the
    reference's 271x91 lidar scan shape (test_range_sensor_gp_3d.cpp):
    since the one-dispatch fusion, the per-scan work is one (271, 91)
    range-image transfer + one jitted program whose 144-slot members
    dispatch to the fused Pallas bank on TPU. Wall-clock includes the host
    side — the honest online-sensor number."""
    gp, scans = _make_range_sensor_3d_gp()
    eye, zero = np.eye(3), np.zeros(3)

    def fetch():
        return float(np.asarray(gp.bank.alpha)[(0, 0, 0)])

    for r in scans:
        gp.train(eye, zero, r)
    fetch()
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        for r in scans:
            gp.train(eye, zero, r)
        fetch()
        best = min(best, (time.perf_counter() - t0) / len(scans))
    emit(metric="range_sensor_gp_3d_scan_train", value=round(1.0 / best, 1),
         unit="scans/s", ms=round(best * 1e3, 3))


def bench_range_sensor_3d_train_phases(rounds=8):
    """Phase decomposition of the 3D scan-train wall time: (a) h2d of the
    (271, 91) range image through the tunnel (+ one tiny dispatch to
    barrier it), (b) the fused train program alone, device-only two-point
    slope with a device-resident image, (c) end-to-end wall via gp.train.
    Attribution twin of bench_routed_predict_phases: on the remote tunnel
    the wall number is transfer/dispatch bound, and this bench shows which
    legs a locally-attached chip would not pay."""
    from erl_gaussian_process_tpu.models.range_sensor_gp_3d import (
        _scan_train_fused,
    )

    gp, scans = _make_range_sensor_3d_gp()
    eye, zero = np.eye(3), np.zeros(3)
    gp.train(eye, zero, scans[0])  # builds the scan-fit cache
    c = gp._build_scan_fit_cache()
    sf, s = gp.sensor_frame.setting, gp.setting
    dt = gp.dtype.type
    scalars = (dt(sf.valid_range_min), dt(sf.valid_range_max),
               dt(s.sensor_range_var), jnp.int32(s.min_num_samples_per_group))

    def fn(eps, base, fc_flat, idx, inb):
        return _scan_train_fused(
            base + eps, fc_flat, idx, inb, *scalars, dt(gp._scale),
            kernel=gp._kernel, map_type=s.mapping.type,
            map_scale=s.mapping.scale, use_pallas=c["use_pallas"])

    fn.consts = (jnp.asarray(scans[0]), c["fc_flat"], c["idx"], c["inb"])
    device_s = _time(fn, iters=20)

    # h2d: stage a fresh host image, barrier on a 4-byte readback of one
    # element (the put alone returns before the bytes move)
    pull = jax.jit(lambda a: a[0, 0])
    float(np.asarray(pull(jax.device_put(scans[0]))))  # compile + warm
    h2d = np.inf
    for k in range(rounds):
        r = scans[k % len(scans)] + DTYPE(1e-6 * (k + 1))  # defeat caching
        t0 = time.perf_counter()
        float(np.asarray(pull(jax.device_put(r))))
        h2d = min(h2d, time.perf_counter() - t0)

    def fetch():
        return float(np.asarray(gp.bank.alpha)[(0, 0, 0)])

    fetch()
    e2e = []
    for k in range(rounds):
        t0 = time.perf_counter()
        gp.train(eye, zero, scans[k % len(scans)])
        fetch()
        e2e.append(time.perf_counter() - t0)
    emit(metric="range_sensor_3d_train_phases",
         value=round(min(e2e) * 1e3, 3), unit="ms end-to-end (min)",
         e2e_max_ms=round(max(e2e) * 1e3, 3),
         h2d_ms=round(h2d * 1e3, 3),
         device_ms=round(device_s * 1e3, 3))


def bench_routed_predict(B=60, n=144, d=2, m=16384, rounds=8):
    """Routed prediction at serving load: m queries, each answered by its
    assigned bank member (the `test`/`compute_occ` path of both sensor
    GPs). This is the workload where the old per-query design gathered an
    (m, n, n) factor stack (~830 MB HBM traffic at this shape); the
    segmented design reads each member's factor once. Wall-clock includes
    the host-side grouping — the honest serving number."""
    from erl_gaussian_process_tpu.models.batch_gp import (
        bank_predict_assigned,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, n, d)).astype(DTYPE))
    y = jnp.asarray(rng.uniform(-1, 1, (B, n, 1)).astype(DTYPE))
    var = jnp.full((B, n), 1e-2, DTYPE)
    mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.95)
    bank = bank_fit(x, y, var, mask, DTYPE(0.4), kernel="matern32")
    _fetch(bank.alpha)
    q = rng.uniform(-1, 1, (m, d)).astype(DTYPE)
    idx = rng.integers(0, B, m).astype(np.int32)
    idx[rng.uniform(size=m) < 0.03] = -1   # unresolved queries

    def once(k):
        mean, var_, valid = bank_predict_assigned(
            bank, q + DTYPE(1e-7 * k), idx, DTYPE(0.4), kernel="matern32")
        return float(mean[0, 0]) + float(var_[0])

    once(0)  # compile + warm the shape buckets
    best = np.inf
    for r in range(rounds):
        t0 = time.perf_counter()
        once(r + 1)
        best = min(best, time.perf_counter() - t0)
    # segmented design reads each member's factor once; per-query whiten
    # is one trsm column against its member's (n, n) factor
    emit(metric=f"routed_predict_B{B}_n{n}_m{m}",
         value=round(m / best), unit="queries/s",
         ms=round(best * 1e3, 3),
         **roof(best, flops=m * n * n + 3 * d * n * m,
                hbm_bytes=4 * (B * n * n + 3 * n * m)))


def bench_routed_predict_phases(B=60, n=144, d=2, m=16384, rounds=8):
    """Phase decomposition of the routed-predict serving path (VERDICT r3
    item 5): host grouping / H2D / device compute / D2H+scatter, each the
    min over ``rounds``, plus the min/max spread of the unprofiled
    end-to-end time so the jitter source is attributable."""
    from erl_gaussian_process_tpu.models.batch_gp import (
        bank_predict_assigned,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, n, d)).astype(DTYPE))
    y = jnp.asarray(rng.uniform(-1, 1, (B, n, 1)).astype(DTYPE))
    var = jnp.full((B, n), 1e-2, DTYPE)
    mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.95)
    bank = bank_fit(x, y, var, mask, DTYPE(0.4), kernel="matern32")
    _fetch(bank.alpha)
    q = rng.uniform(-1, 1, (m, d)).astype(DTYPE)
    idx = rng.integers(0, B, m).astype(np.int32)
    idx[rng.uniform(size=m) < 0.03] = -1

    def once(k, prof=None):
        mean, var_, valid = bank_predict_assigned(
            bank, q + DTYPE(1e-7 * k), idx, DTYPE(0.4), kernel="matern32",
            profile=prof)
        return float(mean[0, 0]) + float(var_[0])

    once(0)  # compile + warm
    # unprofiled end-to-end spread
    e2e = []
    for r in range(rounds):
        t0 = time.perf_counter()
        once(r + 1)
        e2e.append(time.perf_counter() - t0)
    # per-phase minima (profiled runs synchronize between phases)
    phases = {}
    for r in range(rounds):
        p = {}
        once(r + 101, prof=p)
        for k in ("host_group", "h2d", "device", "d2h_scatter"):
            phases[k] = min(phases.get(k, np.inf), p[k])
    emit(metric=f"routed_predict_phases_B{B}_n{n}_m{m}",
         value=round(min(e2e) * 1e3, 3), unit="ms end-to-end (min)",
         e2e_max_ms=round(max(e2e) * 1e3, 3),
         **{k + "_ms": round(v * 1e3, 3) for k, v in phases.items()})


def bench_spgp(n=2000, grid=31):
    rng = np.random.default_rng(0)
    c = np.linspace(-3, 3, grid)
    pv, qv = np.meshgrid(c, c, indexing="ij")
    P = pad_pseudo_points(
        np.stack([pv.ravel(), qv.ravel()], axis=-1).astype(DTYPE))
    x = jnp.asarray(rng.uniform(-3, 3, (n, 2)).astype(DTYPE))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(DTYPE))
    var = jnp.full((n,), 1e-4, DTYPE)
    mask = jnp.ones((n,), bool)
    scale = DTYPE(0.18)
    iters = 300

    def make(k):
        @jax.jit
        def loop(s):
            # the accumulated state is the natural loop carry — true
            # sequential dependence, like the online mapping service.
            # x varies with the loop index: with loop-invariant samples XLA
            # legally hoists the whole gram/beta/lambda chain out of the
            # loop and times only the Q/alpha adds (observed: zero slope).
            def body(i, s):
                xi = x + i.astype(DTYPE) * DTYPE(1e-7)
                return spgp_update(s, xi, y, var, mask, scale,
                                   kernel="matern32")
            return jax.lax.fori_loop(0, k, body, s)
        return loop

    import time as _t
    l1, l2 = make(iters), make(2 * iters)

    seq = [0]

    def run(loop):
        # unique pseudo values per invocation: identical-value re-inits have
        # been observed to hit the runtime's execution dedup cache
        seq[0] += 1
        s0 = spgp_init(jnp.asarray(P) + DTYPE(1e-6 * seq[0]), scale,
                       kernel="matern32")
        float(np.asarray(s0.qm[0, 0]))
        t0 = _t.perf_counter()
        r = loop(s0)
        float(np.asarray(r.qm[0, 0]))
        return _t.perf_counter() - t0

    run(l1); run(l2)  # compile + warm
    t1 = min(run(l1) for _ in range(2))
    t2 = min(run(l2) for _ in range(2))
    t = max(t2 - t1, 1e-9) / iters
    M = len(P)
    # K_MN gram + N forward-solve cols against L_KM + Q_M += GEMM
    emit(metric=f"spgp_update_M{M}_N{n}", value=round(1.0 / t, 1),
         unit="updates/s", ms=round(t * 1e3, 3),
         **roof(t, flops=3 * M * M * n + 3 * 2 * M * n))


def bench_spgp_3d(n=2000, grid=(11, 11, 9)):
    """3D occupancy-map update rate at the replica-trajectory example's
    production shape (examples/replica_hotel_3d.py: 1089 pseudo points,
    <=2000 samples/update, Matern-3/2) — same loop-carry methodology as
    bench_spgp."""
    rng = np.random.default_rng(0)
    axes = [np.linspace(-3, 3, g) for g in grid]
    pv = np.meshgrid(*axes, indexing="ij")
    P = pad_pseudo_points(
        np.stack([v.ravel() for v in pv], axis=-1).astype(DTYPE))
    x = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(DTYPE))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(DTYPE))
    var = jnp.full((n,), 1e-4, DTYPE)
    mask = jnp.ones((n,), bool)
    scale = DTYPE(0.4)
    iters = 200

    def make(k):
        @jax.jit
        def loop(s):
            def body(i, s):
                xi = x + i.astype(DTYPE) * DTYPE(1e-7)
                return spgp_update(s, xi, y, var, mask, scale,
                                   kernel="matern32")
            return jax.lax.fori_loop(0, k, body, s)
        return loop

    import time as _t
    l1, l2 = make(iters), make(2 * iters)
    seq = [0]

    def run(loop):
        seq[0] += 1
        s0 = spgp_init(jnp.asarray(P) + DTYPE(1e-6 * seq[0]), scale,
                       kernel="matern32")
        float(np.asarray(s0.qm[0, 0]))
        t0 = _t.perf_counter()
        r = loop(s0)
        float(np.asarray(r.qm[0, 0]))
        return _t.perf_counter() - t0

    run(l1); run(l2)
    t1 = min(run(l1) for _ in range(2))
    t2 = min(run(l2) for _ in range(2))
    t = max(t2 - t1, 1e-9) / iters
    M = len(P)
    emit(metric=f"spgp3d_update_M{M}_N{n}", value=round(1.0 / t, 1),
         unit="updates/s", ms=round(t * 1e3, 3),
         **roof(t, flops=3 * M * M * n + 3 * 3 * M * n))


def main():
    import sys
    # --only <substr>: run just the phases whose name contains <substr>
    # (focused re-runs after a kernel change, without re-paying every
    # remote compile in the full suite)
    only = None
    if "--only" in sys.argv:
        pos = sys.argv.index("--only") + 1
        if pos >= len(sys.argv):
            sys.exit("usage: suite.py [--sweep] [--only <phase-substring>]")
        only = sys.argv[pos]
    phases = [
        ("vanilla_2048", lambda: bench_vanilla(2048)),
        ("vanilla_4096", lambda: bench_vanilla(4096)),
        ("vanilla_8192", lambda: bench_vanilla(8192)),
        ("bank", bench_bank),
        ("bank_512x32", lambda: bench_bank(B=512, n=32)),
        ("nigp", bench_nigp),
        ("lidar_scan_train", bench_lidar_scan_train),
        ("range_sensor_3d_train", bench_range_sensor_3d_train),
        ("range_sensor_3d_train_phases", bench_range_sensor_3d_train_phases),
        ("routed_predict", bench_routed_predict),
        ("routed_predict_phases", bench_routed_predict_phases),
        ("spgp", bench_spgp),
        ("spgp_3d", bench_spgp_3d),
    ]
    if "--sweep" in sys.argv:
        phases.append(("bank_sweep", bench_bank_sweep))
    emit(metric="backend", value=jax.default_backend(),
         unit=str(jax.devices()[0]))
    for name, thunk in phases:
        if only is None or only in name:
            thunk()


if __name__ == "__main__":
    main()
