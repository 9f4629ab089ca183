"""Drift-gate child process: float64 CPU reference replay.

Invoked by bench.py (and runnable standalone) as

    python benchmarks/drift_check.py IN.npz OUT.npz

IN.npz carries the datasets a float32 chip replay actually consumed
(``update_batch(collect_datasets=True)``) plus the workload definition
(pseudo, scale, kernel, var, grid). This process forces the CPU backend
with float64 enabled BEFORE importing jax (a standalone script, not a
``-m`` module, so no package import can initialize the backend first),
replays the identical datasets at f64 (utils/drift.replay_f64), and
writes the reference posterior to OUT.npz.
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

    from erl_gaussian_process_tpu.utils.drift import replay_f64

    z = np.load(in_path)
    lo64 = replay_f64(z["pseudo"], float(z["scale"]), str(z["kernel"]),
                      z["dx"], z["dy"], z["dm"], float(z["var"]),
                      z["grid"])
    np.savez(out_path, lo64=lo64)
    print(f"drift_check child: replayed {z['dx'].shape[0]} poses at f64, "
          f"backend={jax.default_backend()}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
