"""A/B the rank-2 elimination base case (commit 6ae3b9f) against rank-1,
on the two kernels that carry it: the streaming single-matrix Cholesky
(ops/pallas_chol._elim2d_r2) and the fused bank (ops/pallas_bank.
_elimination_r2).

The rank flags are read at TRACE time, so each variant needs its own
process (jit caches would otherwise pin the first-traced variant).
Measured on v5e (2026-08-18 ritual) the winners DIFFER per kernel —
rank-2 for the HBM-streaming chol (6.78 vs 7.10 ms at n=8192), rank-1
for the VMEM-resident bank (6.7 vs 10.9 ms at B=1024 n=128) — so the
defaults are per-kernel and this A/B swaps both to the non-default:

    python benchmarks/ab_elim.py                  # defaults: chol r2, bank r1
    ERL_GP_CHOL_ELIM1=1 ERL_GP_BANK_ELIM2=1 \
        python benchmarks/ab_elim.py              # swapped: chol r1, bank r2

Parity is hard-asserted against numpy float64 before any timing prints.
Timing uses benchmarks.suite._time (two-point fori_loop slope — see the
measurement-methodology notes there; wall-clock per call lies through
the remote tunnel).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from benchmarks.suite import _time
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit
    from erl_gaussian_process_tpu.ops.pallas_chol import chol_blocked

    assert jax.default_backend() == "tpu", jax.devices()
    chol_rank = 1 if os.environ.get("ERL_GP_CHOL_ELIM1") else 2
    bank_rank = 2 if os.environ.get("ERL_GP_BANK_ELIM2") else 1
    print(f"elimination ranks under test: chol r{chol_rank}, "
          f"bank r{bank_rank} "
          f"(ELIM1={os.environ.get('ERL_GP_CHOL_ELIM1', '')!r}, "
          f"BANK_ELIM2={os.environ.get('ERL_GP_BANK_ELIM2', '')!r})")
    rng = np.random.default_rng(0)

    # --- streaming chol at the suite's two headline sizes ---
    for n in (6144, 8192):
        d = 2
        x = rng.uniform(-3, 3, (n, d)).astype(np.float32)
        r2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        A = np.exp(-r2 / (2 * 0.5**2)).astype(np.float32)
        A[np.arange(n), np.arange(n)] += 1e-2 + 1e-4 * np.arange(n) / n
        Aj = jnp.asarray(A)
        L = np.asarray(chol_blocked(Aj), np.float64)
        err = np.abs(np.tril(L) @ np.tril(L).T - A).max()
        assert np.isfinite(err) and err < 5e-3, (n, err)

        def fn(eps, A):
            return chol_blocked(A + eps)
        fn.consts = (Aj,)
        t = _time(fn, iters=8)
        print(f"chol n={n}: {t * 1e3:8.3f} ms  (factor err {err:.2e})")

    # --- fused bank fit at the measured kernel shape, the sweep shape,
    # and the 3D sensor-bank shape (rect slab: 144 rows x 512 lanes) ---
    for B, n in ((1024, 128), (1000, 100), (408, 144)):
        d = 2
        x = jnp.asarray(rng.uniform(-1, 1, (B, n, d)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-1, 1, (B, n, 1)).astype(np.float32))
        var = jnp.full((B, n), 1e-2, jnp.float32)
        mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.9)
        st = bank_fit(x, y, var, mask, np.float32(0.3), kernel="rbf")
        assert np.isfinite(np.asarray(st.alpha)).all(), (B, n)

        def fb(eps, x, y, var, mask):
            return bank_fit(x + eps, y, var, mask, np.float32(0.3),
                            kernel="rbf")
        fb.consts = (x, y, var, mask)
        t = _time(fb, iters=8)
        print(f"bank fit B={B} n={n}: {t * 1e3:8.3f} ms "
              f"({B / t / 1e3:.0f} k GPs/s)")


if __name__ == "__main__":
    main()
