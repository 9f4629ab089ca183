"""Drift-gate child process: float64 CPU reference replay + exact-f32
CPU pipeline replay.

Invoked by bench.py (and runnable standalone) as

    python benchmarks/drift_check.py IN.npz OUT.npz

IN.npz carries the datasets a float32 chip replay actually consumed
(``update_batch(collect_datasets=True)``) plus the workload definition
(pseudo, scale, kernel, var, grid). This process forces the CPU backend
with float64 enabled BEFORE importing jax (a standalone script, not a
``-m`` module, so no package import can initialize the backend first)
and writes TWO posteriors to OUT.npz:

- ``lo64``: the exact float64 reference (utils/drift.replay_f64);
- ``lo32``: the SAME datasets replayed through the package's own f32
  pipeline on CPU — exact-f32 GEMMs (XLA:CPU), the production tiered
  prepare (f32 chol, exact-host f64 refactorization when indefinite),
  f32 predict. lo32-vs-lo64 is the ALGORITHM drift: what the
  long-horizon accumulation design (Kahan + exact refactorization)
  loses at f32 with exact GEMMs, i.e. the statistic that detects
  conditioning decay without conflating it with the TPU MXU's bf16x3
  noise class (see bench.py hotel0_drift_gate for the measured
  decomposition).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np  # noqa: E402


def main(in_path: str, out_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        pad_pseudo_points,
        spgp_init,
        spgp_predict,
        spgp_prepare,
        spgp_prepare_exact_host,
        spgp_update,
    )
    from erl_gaussian_process_tpu.utils.drift import replay_f64

    z = np.load(in_path)
    lo64 = replay_f64(z["pseudo"], float(z["scale"]), str(z["kernel"]),
                      z["dx"], z["dy"], z["dm"], float(z["var"]),
                      z["grid"])

    # exact-f32 CPU pipeline replay of the identical datasets
    kern = str(z["kernel"])
    scale = np.float32(z["scale"])
    pr = pad_pseudo_points(
        np.ascontiguousarray(np.asarray(z["pseudo"], np.float32)))
    st = spgp_init(jnp.asarray(pr), scale, kernel=kern)
    dx, dy, dm = z["dx"], z["dy"], z["dm"]
    vv = jnp.full((dx.shape[1],), np.float32(z["var"]))
    for i in range(dx.shape[0]):
        st = spgp_update(st, jnp.asarray(dx[i], jnp.float32),
                         jnp.asarray(dy[i], jnp.float32), vv,
                         jnp.asarray(dm[i]), scale, kernel=kern)
    L, a = spgp_prepare(st)
    tier = "f32-chol"
    dl = np.abs(np.diag(np.asarray(L, np.float64)))
    knife_edge = dl.min() <= 0 or (dl.max() / dl.min()) ** 2 > 1e7
    if knife_edge or not bool(np.isfinite(np.asarray(a)).all()):
        # same conditioning-aware escalation as the production class
        # _prepared: a finite f32 chol at cond ~ 1/eps_f32 can carry
        # O(0.1-1) solve error (the knife edge the in-bench gate caught)
        L, a = spgp_prepare_exact_host(st)
        tier = "exact-host-f64"
    mean, _, _ = spgp_predict(st, jnp.asarray(L), jnp.asarray(a),
                              jnp.asarray(z["grid"], jnp.float32), scale,
                              kernel=kern, with_var=False)
    lo32 = np.asarray(mean[:, 0])

    np.savez(out_path, lo64=lo64, lo32=lo32)
    print(f"drift_check child: replayed {z['dx'].shape[0]} poses at f64 "
          f"and exact-f32 (prepare tier: {tier}), "
          f"backend={jax.default_backend()}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
