"""Weak-scaling measurement of the multi-chip paths on a virtual CPU mesh
(VERDICT r3 item 8): per-step time of the sample-sharded SPGP FITC update
(psum accumulation over the mesh axis) and the bank-sharded batched GP fit
(no collectives) as the device count grows with the work held constant PER
DEVICE. Ideal weak scaling = flat step time; the printed efficiency is
t(1 device) / t(k devices).

A CPU mesh measures the STRUCTURE (sharding, collective count, padding
overhead), not ICI bandwidth — virtual devices share one host's cores, so
efficiencies below 1 bound the real-chip number from below on
compute-dominated steps. Run: python benchmarks/weak_scaling.py
"""

import json
import os
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (  # noqa: E402
    spgp_init,
)
from erl_gaussian_process_tpu.parallel import (  # noqa: E402
    make_mesh,
    sharded_bank_fit,
    sharded_spgp_update,
)

N_PER_DEV = 2048      # FITC samples per device (production update = 2000)
B_PER_DEV = 128       # bank members per device
BANK_N = 64           # samples per bank member
REPS = 5


def _time(fn):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dtype = np.float32
    rng = np.random.default_rng(0)
    c = np.linspace(-1, 1, 16, dtype=dtype)
    pv, qv = np.meshgrid(c, c, indexing="ij")
    pseudo = jnp.asarray(np.stack([pv.ravel(), qv.ravel()], axis=-1))

    rows = []
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)

        # (a) sample-sharded FITC update: N grows with the mesh
        n = N_PER_DEV * nd
        state = spgp_init(pseudo, dtype(0.3), kernel="matern32")
        x = jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(dtype))
        y = jnp.asarray(rng.uniform(-1, 1, (n, 1)).astype(dtype))
        var = jnp.full((n,), 1e-3, dtype)
        mask = jnp.ones((n,), bool)
        t_fitc = _time(lambda: sharded_spgp_update(
            mesh, state, x, y, var, mask, dtype(0.3), kernel="matern32"))

        # (b) bank-sharded fit: B grows with the mesh, no collectives
        B = B_PER_DEV * nd
        xb = jnp.asarray(rng.uniform(0, 1, (B, BANK_N, 1)).astype(dtype))
        yb = jnp.asarray(rng.uniform(-1, 1, (B, BANK_N, 1)).astype(dtype))
        vb = jnp.full((B, BANK_N), 1e-2, dtype)
        mb = jnp.asarray(rng.uniform(size=(B, BANK_N)) < 0.9)
        t_bank = _time(lambda: sharded_bank_fit(
            mesh, xb, yb, vb, mb, dtype(0.1), kernel="ou"))

        rows.append({"devices": nd, "fitc_update_ms": t_fitc * 1e3,
                     "bank_fit_ms": t_bank * 1e3})

    t1f, t1b = rows[0]["fitc_update_ms"], rows[0]["bank_fit_ms"]
    for r in rows:
        r["fitc_weak_eff"] = round(t1f / r["fitc_update_ms"], 3)
        r["bank_weak_eff"] = round(t1b / r["bank_fit_ms"], 3)
        r["fitc_update_ms"] = round(r["fitc_update_ms"], 2)
        r["bank_fit_ms"] = round(r["bank_fit_ms"], 2)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
