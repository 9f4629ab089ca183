"""Phase profile of the north-star hotel-0 map update (bench.py headline).

Decomposes the fused update_step (sample -> label -> FITC) replayed over a
pose batch into:
  - full        : the shipped update_batch_steps (sampler + FITC)
  - sampler     : generate_dataset_fixed + labeling + cap only, in the same
                  lax.scan structure
  - fitc        : spgp_update only, over the FULL slot count the sampler
                  emits (n_slots = rays * (1 + free_slots_per_ray))
  - fitc@budget : spgp_update over a max_samples-aligned compacted budget —
                  the headroom a pre-FITC active-slot compaction would buy
                  (actives per update are capped at max_samples=2000, but
                  the fused step currently runs the FITC gram/GEMMs over
                  every slot).

Timing: dispatch the whole replay as one lax.scan, barrier with a forced
scalar fetch (see bench.py module docstring for why block_until_ready is
not a barrier on the axon tunnel); report best-of-rounds per-update ms.

Run: python benchmarks/profile_map_update.py [n_poses]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp

from erl_gaussian_process_tpu.geometry import Aabb
from erl_gaussian_process_tpu.geometry.occupancy_dataset import (
    generate_dataset_fixed,
)
from erl_gaussian_process_tpu.models import SpGpOccupancyMap
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import spgp_update


def main(n_poses=256, rounds=4):
    from bench import make_hotel0_workload

    sensors, pts, masks, hits, traj_pos, setting, pseudo, lo, hi = \
        make_hotel0_workload(n_poses)
    omap = SpGpOccupancyMap(setting, pseudo, Aabb.from_min_max(lo, hi),
                            seed=0, dtype=np.float32, free_slots_per_ray=12)
    s = setting
    state0 = omap.sp_gp.state
    kernel = omap.sp_gp._kernel
    scale = np.float32(omap.sp_gp._scale)
    key = omap.key
    sensors_j = jnp.asarray(sensors)
    pts_j = jnp.asarray(np.where(masks[..., None], pts, 0.0).astype(np.float32))
    masks_j = jnp.asarray(masks)
    aabb_min, aabb_max = omap._aabb_min, omap._aabb_max
    max_samples = int(s.sp_gp.max_num_samples)
    n_slots = pts.shape[1] * (1 + omap.free_slots)
    print(f"# poses={n_poses} rays={pts.shape[1]} free_slots={omap.free_slots}"
          f" n_slots={n_slots} M={omap.sp_gp.state.pseudo.shape[0]}"
          f" max_samples={max_samples}")

    def bench(fn, args, label):
        # fns return a SCALAR: fetching a big array through the tunnel
        # (e.g. the 5.3 MB qm) costs more than the compute being timed
        out = fn(*args)          # compile + warm
        _ = float(np.asarray(out))
        best = np.inf
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(np.asarray(out))
            best = min(best, time.perf_counter() - t0)
        ms = best / n_poses * 1e3
        print(f"{label:<28s} {ms:8.3f} ms/update   ({n_poses / best:8.1f} Hz)")
        return ms

    # ---- full shipped path ------------------------------------------------
    common = dict(kernel=kernel, diagonal_qm=s.sp_gp.diagonal_qm,
                  free_slots=omap.free_slots, max_samples=max_samples,
                  min_distance=s.min_distance, max_distance=s.max_distance,
                  free_sampling_margin=s.free_sampling_margin,
                  free_points_per_meter=s.free_points_per_meter,
                  logodd_occupied=s.logodd_occupied,
                  logodd_free=s.logodd_free,
                  logodd_variance=s.logodd_variance)

    from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
        update_batch_steps,
    )

    def full():
        # update_batch_steps donates its state arg: hand it a fresh copy
        st0 = jax.tree_util.tree_map(jnp.copy, state0)
        st, n_used = update_batch_steps(
            st0, key, jnp.int32(1), sensors_j, pts_j, masks_j,
            aabb_min, aabb_max, scale, **common)
        return st.qm[0, 0]

    bench(full, (), "full (sampler+FITC)")

    # ---- sampler only -----------------------------------------------------
    @jax.jit
    def sampler_only():
        def body(carry, inp):
            step, sensor, p, m = inp
            k = jax.random.fold_in(key, step)
            d_pts, lbl, msk = generate_dataset_fixed(
                k, sensor, p, m, aabb_min, aabb_max,
                s.min_distance, s.max_distance, s.free_sampling_margin,
                s.free_points_per_meter, free_slots_per_ray=omap.free_slots)
            rank = jnp.cumsum(msk.astype(jnp.int32)) - 1
            msk = msk & (rank < max_samples)
            y = jnp.where(lbl > 0, s.logodd_occupied, s.logodd_free)
            return carry + jnp.sum(d_pts) + jnp.sum(y * msk), jnp.sum(msk)
        steps = 1 + jnp.arange(n_poses, dtype=jnp.int32)
        tot, _ = jax.lax.scan(body, jnp.float32(0),
                              (steps, sensors_j, pts_j, masks_j))
        return tot

    bench(sampler_only, (), "sampler only")

    # ---- FITC only, full slot count ----------------------------------------
    # precompute one pose's sampled dataset host-side, replay it per step
    k0 = jax.random.fold_in(key, 1)
    d_pts, lbl, msk = generate_dataset_fixed(
        k0, sensors_j[0], pts_j[0], masks_j[0], aabb_min, aabb_max,
        s.min_distance, s.max_distance, s.free_sampling_margin,
        s.free_points_per_meter, free_slots_per_ray=omap.free_slots)
    rank = jnp.cumsum(msk.astype(jnp.int32)) - 1
    msk = msk & (rank < max_samples)
    y = jnp.where(lbl > 0, s.logodd_occupied, s.logodd_free)[:, None]
    var = jnp.full(d_pts.shape[0], s.logodd_variance, jnp.float32)
    print(f"# active samples pose0: {int(jnp.sum(msk))}")

    from erl_gaussian_process_tpu.kernels import cross_gram
    from erl_gaussian_process_tpu.models.gp_core import f32_matmul
    from jax.scipy.linalg import solve_triangular

    def fitc_variant(xp, yp, varp, mp, label, mode):
        """mode: 'trsm' (shipped XLA chain), 'linv' (beta via L_inv GEMM),
        'pallas' (fused kernel, forced on regardless of _MAX_M). x varies
        with the step index so XLA cannot hoist the chain out of the scan
        (suite.py bench_spgp's observed zero-slope trap)."""
        @jax.jit
        @f32_matmul
        def run(st):
            def body(c, i):
                xi = xp + (i.astype(jnp.float32) * jnp.float32(1e-7))[None]
                if mode == "pallas":
                    from erl_gaussian_process_tpu.ops.pallas_fitc import (
                        pallas_fitc_update,
                    )
                    dq, da = pallas_fitc_update(
                        kernel, c.pseudo, c.L_inv, xi, yp, varp, mp, scale)
                else:
                    kmn = cross_gram(kernel, c.pseudo, xi, scale)
                    if mode == "linv":
                        beta = c.L_inv @ kmn
                    else:
                        beta = solve_triangular(c.L_km, kmn, lower=True)
                    lam = jnp.maximum(1.0 - jnp.sum(beta * beta, axis=0), 0.0)
                    inv = jnp.where(mp, 1.0 / (lam + varp), 0.0)
                    ksc = kmn * inv[None, :]
                    dq = ksc @ kmn.T
                    da = ksc @ jnp.where(mp[:, None], yp, 0.0)
                from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp \
                    import SpGpState
                return SpGpState(pseudo=c.pseudo, L_km=c.L_km, L_inv=c.L_inv,
                                 qm=c.qm + dq, alpha=c.alpha + da,
                                 qm_c=c.qm_c, alpha_c=c.alpha_c), None
            st, _ = jax.lax.scan(
                body, st, jnp.arange(n_poses, dtype=jnp.int32))
            return st.qm[0, 0]
        try:
            bench(run, (state0,), label)
        except Exception as e:
            print(f"{label:<28s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}")

    budget = -(-max_samples // 256) * 256
    order = np.argsort(~np.asarray(msk), kind="stable")[:budget]
    compact = (jnp.asarray(np.asarray(d_pts)[order]),
               jnp.asarray(np.asarray(y)[order]),
               var[:budget], jnp.asarray(np.asarray(msk)[order]))
    nfull = d_pts.shape[0]
    for mode in ("trsm", "linv", "pallas"):
        fitc_variant(d_pts, y, var, msk, f"FITC {mode} n={nfull}", mode)
        fitc_variant(*compact, f"FITC {mode} n={budget}", mode)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
