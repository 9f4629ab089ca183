"""Single-chip t1(N) scaling of the fused rank-N FITC update — the
measured curve the mesh break-even analysis rests on
(docs/architecture.md "when does the mesh pay": the psum costs ~190 us
fixed, so D chips win once t1(N) - t1(N/D) exceeds it; the model assumed
t1 linear in N above the occupancy knee, unvalidated until now).

Sweeps the flattened sample count N of ONE spgp_update at the hotel-0
production shape (M=1152 padded pseudo, d=3, matern32) from one scan's
worth (2048) to the 16-scan fused regime (32768) that
parallel/mesh.sharded_update_many targets. Prints one JSON line per N
with device-only us/update and the per-sample slope.

Run on the chip:  python benchmarks/rank_n_scaling.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   os.pardir, ".jax_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (  # noqa: E402
    pad_pseudo_points,
    spgp_init,
    spgp_update,
)

DTYPE = np.float32


def main():
    from suite import _time  # the DCE/dedup-proof two-point slope recipe

    rng = np.random.default_rng(0)
    m_raw, d = 1089, 3
    pseudo = pad_pseudo_points(
        rng.uniform(-4, 4, (m_raw, d)).astype(DTYPE))
    st0 = spgp_init(jnp.asarray(pseudo), DTYPE(0.55), kernel="matern32")
    # spgp_update donates its state buffers (the production replay threads
    # the state); here the SAME st0 feeds every timed iteration, so re-jit
    # the underlying function WITHOUT donation (costs at most one in-place
    # M^2 copy ~6 us at M=1152 — noise next to the 160+ us updates timed)
    upd = jax.jit(spgp_update.__wrapped__,
                   static_argnames=("kernel", "diagonal_qm", "use_pallas",
                                    "zero_threshold"))
    print(json.dumps({"workload": "fused rank-N FITC update, M=%d d=%d "
                      "matern32 f32 (hotel-0 shape)" % (pseudo.shape[0], d),
                      "backend": jax.default_backend()}), flush=True)

    prev = None
    for n in (2048, 4096, 8192, 16384, 32768):
        x = jnp.asarray(rng.uniform(-4, 4, (n, d)).astype(DTYPE))
        y = jnp.asarray(np.where(rng.uniform(size=(n, 1)) < 0.3, 1.0, -1.0)
                        .astype(DTYPE))
        var = jnp.full((n,), DTYPE(1e-4))
        mask = jnp.ones((n,), bool)

        def fn(eps, x=x, y=y, var=var, mask=mask):
            st = upd(st0, x + eps, y, var, mask, DTYPE(0.55),
                     kernel="matern32")
            return (st.qm, st.alpha)

        iters = max(4, min(40, (40 * 4096) // n))
        t_us = _time(fn, iters=iters) * 1e6
        row = {"n": n, "us_per_update": round(t_us, 1),
               "us_per_1k_samples": round(t_us / (n / 1024), 2)}
        if prev is not None:
            # marginal cost of the added samples: the slope the break-even
            # model needs (fixed per-update cost cancels)
            dn, dt = n - prev[0], t_us - prev[1]
            row["marginal_us_per_1k"] = round(dt / (dn / 1024), 2)
        prev = (n, t_us)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
