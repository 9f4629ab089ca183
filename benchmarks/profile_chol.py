"""Decompose the streaming-Cholesky kernel's device time (VERDICT round-1
item 7): measure per-chol device time at a sweep of sizes with the suite's
two-point-slope harness and least-squares fit the three structural
components —

  t(n) ~= D * nb            (diagonal tiles: serial elimination + factor)
        + O * nb*(nb-1)/2   (off-diagonal tiles: solve + DMA)
        + M * nb*(nb^2-1)/6 (prefix MXU products, one per (i,j,p))

with nb = n/512. The fit tells us which component must shrink for the
kernel to approach its ~4.3 ms HBM/MXU floor estimate at n=8192, and by
how much. (Sizes start at n=2560: nb >= 5 is the kernel's structural
minimum since the slab/panel redesign — the (T, 4T) DMA slices are
static shapes.)

Wall-clock-per-call timing is useless here: the remote-TPU tunnel adds
~30 ms of dispatch+fetch per call that SWAMPS the kernel (measured: the
same kernel reads 7.4 ms by slope and 34 ms by wall), so everything goes
through benchmarks.suite._time (fori_loop slope, full-output carry).

Usage: JAX_PLATFORMS='' python benchmarks/profile_chol.py
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
    from erl_gaussian_process_tpu.ops.pallas_chol import chol_blocked

    assert jax.default_backend() == "tpu", jax.devices()
    rng = np.random.default_rng(0)
    rows = []
    for n in (2560, 3072, 4096, 6144, 8192):
        d = 2
        x = rng.uniform(-3, 3, (n, d)).astype(np.float32)
        r2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        A = np.exp(-r2 / (2 * 0.5**2)).astype(np.float32)
        A[np.arange(n), np.arange(n)] += 1e-2 + 1e-4 * np.arange(n) / n
        Aj = jnp.asarray(A)

        def fn(eps, A):
            return chol_blocked(A + eps)
        fn.consts = (Aj,)
        t = _time(fn, iters=8)
        # correctness guard while we're here — a hard assert, not a print:
        # a DMA-ordering regression would otherwise yield a clean-looking
        # timing table over a garbage factor (bench rule: assert finite)
        L = np.asarray(chol_blocked(Aj), np.float64)
        err = np.abs(np.tril(L) @ np.tril(L).T - A).max()
        assert np.isfinite(err) and err < 5e-3, (n, err)

        # XLA baseline at the same precision context — the enable-gate
        # tuning datum: the kernel should stay on only where it beats this
        from erl_gaussian_process_tpu.models.gp_core import f32_matmul

        @f32_matmul
        def xla_fn(eps, A):
            return jnp.linalg.cholesky(A + eps)
        xla_fn.consts = (Aj,)
        t_xla = _time(xla_fn, iters=8)

        nb = n // 512
        rows.append((n, nb, t * 1e3, err))
        print(f"n={n:5d} nb={nb:2d}  t={t*1e3:7.3f} ms  "
              f"xla={t_xla*1e3:7.3f} ms  ({t_xla/t:.2f}x)  "
              f"recon_err={err:.3e}", flush=True)

    # least-squares fit of the three structural components
    Acols = np.array([[nb, nb * (nb - 1) / 2, nb * (nb * nb - 1) / 6]
                      for (_, nb, _, _) in rows])
    tvec = np.array([t for (_, _, t, _) in rows])
    coef, *_ = np.linalg.lstsq(Acols, tvec, rcond=None)
    D, O, M = coef
    print(f"\nper-diag-tile D = {D*1e3:.1f} us   "
          f"per-offdiag-tile O = {O*1e3:.1f} us   "
          f"per-prefix-product M = {M*1e3:.1f} us")
    nb = 16
    print(f"n=8192 decomposition: diag {D*nb:.2f} ms, "
          f"offdiag {O*nb*(nb-1)/2:.2f} ms, "
          f"prefix-MXU {M*nb*(nb*nb-1)/6:.2f} ms, "
          f"model total {D*nb + O*nb*(nb-1)/2 + M*nb*(nb*nb-1)/6:.2f} ms "
          f"(measured {rows[-1][2]:.2f} ms)")


if __name__ == "__main__":
    main()
