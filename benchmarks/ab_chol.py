"""A/B the streaming Cholesky: HEAD vs the last ON-CHIP-MEASURED revision
vs XLA, in one run (VERDICT r3 item: the resident-panel redesign, commit
2e02240, has interpret+AOT-compile validation but no silicon numbers; its
predecessor 74ca48a measured 7.08 ms at n=8192).

Loads the historical kernel straight from git (`git show <rev>:<path>`)
into a scratch module so both revisions run in the same process, same
timing harness, same inputs. Parity of each factor is hard-asserted
before any timing is reported.

Usage: JAX_PLATFORMS='' python benchmarks/ab_chol.py   (TPU tunnel up)
"""

import importlib.util
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

# Default: the pipelined revision that measured 7.08 ms @ n=8192.
# Override with ERL_GP_AB_PREV=<rev> (e.g. HEAD to A/B an uncommitted edit).
PREV_REV = os.environ.get("ERL_GP_AB_PREV", "74ca48a")
KERNEL_PATH = "erl_gaussian_process_tpu/ops/pallas_chol.py"


def load_rev(rev: str):
    repo = os.path.join(os.path.dirname(__file__), os.pardir)
    src = subprocess.check_output(
        ["git", "show", f"{rev}:{KERNEL_PATH}"], cwd=repo, text=True)
    with tempfile.NamedTemporaryFile("w", suffix=f"_chol_{rev}.py",
                                     delete=False) as f:
        f.write(src)
        path = f.name
    try:
        spec = importlib.util.spec_from_file_location(
            f"pallas_chol_{rev}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        os.unlink(path)  # module is loaded; don't leak one file per run
    return mod


def main():
    from benchmarks.suite import _time
    from erl_gaussian_process_tpu.models.gp_core import f32_matmul
    from erl_gaussian_process_tpu.ops import pallas_chol as head

    assert jax.default_backend() == "tpu", jax.devices()
    prev = load_rev(PREV_REV)
    rng = np.random.default_rng(0)
    print(f"{'n':>6} {'HEAD':>9} {'prev(' + PREV_REV + ')':>15} "
          f"{'XLA':>9}  (ms)")
    for n in (4096, 6144, 8192, 12288):
        d = 2
        x = rng.uniform(-3, 3, (n, d)).astype(np.float32)
        r2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        A = np.exp(-r2 / (2 * 0.5**2)).astype(np.float32)
        A[np.arange(n), np.arange(n)] += 1e-2 + 1e-4 * np.arange(n) / n
        Aj = jnp.asarray(A)

        results = {}
        for tag, fn in (("head", head.chol_blocked),
                        ("prev", prev.chol_blocked)):
            L = np.asarray(fn(Aj), np.float64)
            err = np.abs(np.tril(L) @ np.tril(L).T - A).max()
            assert np.isfinite(err) and err < 5e-3, (tag, n, err)

            def timed(eps, A, _fn=fn):
                return _fn(A + eps)
            timed.consts = (Aj,)
            results[tag] = _time(timed, iters=8) * 1e3

        @f32_matmul
        def xla_fn(eps, A):
            return jnp.linalg.cholesky(A + eps)
        xla_fn.consts = (Aj,)
        results["xla"] = _time(xla_fn, iters=8) * 1e3

        print(f"{n:6d} {results['head']:9.3f} {results['prev']:15.3f} "
              f"{results['xla']:9.3f}", flush=True)


if __name__ == "__main__":
    main()
