"""Phase profile of SPGP PredictGradient (VERDICT r4 weak #6): the one
north-star sub-path still on plain XLA. Times the prepared-posterior
predict at the hotel-0 production shape with and without the gradient
columns, and compares against the HBM roofline of the derivative-gram
materialization — the decision input for "fuse it in Pallas" vs "XLA is
already at the memory bound".

Reference for the op: TestResult gradient path,
src/sparse_pseudo_input_gp.cpp:188-242.

Run on the chip:  python benchmarks/profile_grad_predict.py
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
    spgp_predict,
    spgp_prepare,
    spgp_update,
)

DTYPE = np.float32
HBM_GBPS = 819.0  # v5e


def main():
    from suite import _time

    rng = np.random.default_rng(0)
    m_raw, d, mq = 1089, 3, 2048
    pseudo = pad_pseudo_points(
        rng.uniform(-4, 4, (m_raw, d)).astype(DTYPE))
    m = pseudo.shape[0]
    st = spgp_init(jnp.asarray(pseudo), DTYPE(0.55), kernel="matern32")
    n = 2048
    st = spgp_update(st, jnp.asarray(rng.uniform(-4, 4, (n, d)), DTYPE),
                     jnp.asarray(rng.uniform(-1, 1, (n, 1)), DTYPE),
                     jnp.full((n,), DTYPE(1e-4)), jnp.ones((n,), bool),
                     DTYPE(0.55), kernel="matern32")
    L_qm, a = spgp_prepare(st)
    xq = jnp.asarray(rng.uniform(-4, 4, (mq, d)).astype(DTYPE))
    print(json.dumps({"workload": f"spgp_predict M={m} d={d} mq={mq} "
                      "matern32 f32", "backend": jax.default_backend()}),
          flush=True)

    for with_grad, with_var, label in [
            (False, False, "mean_only"),
            (False, True, "mean_var"),
            (True, False, "mean_grad"),
            (True, True, "mean_grad_var")]:
        def fn(eps, wg=with_grad, wv=with_var):
            mean, grad, var = spgp_predict(
                st, L_qm, a, xq + eps, DTYPE(0.55), kernel="matern32",
                with_grad=wg, with_var=wv)
            out = (mean,)
            if grad is not None:
                out += (grad,)
            if var is not None:
                out += (var,)
            return out

        # the mean/grad paths are tens-of-us GEMM work: at iters=40 the
        # two-point slope (80 extra iterations) is ~1 ms against ~50 ms
        # of fixed tunnel cost and drowns in jitter (observed: a 0.0 us
        # "measurement" for mean_grad). 400 iterations puts the delta at
        # 10+ ms; the var paths are ~300 us/call and keep the short loop.
        t_us = _time(fn, iters=(40 if with_var else 400)) * 1e6
        # HBM roofline of the dominant traffic: the (M, mq*(1+d[if grad]))
        # cross gram written once and read once by the GEMM, plus the
        # whitening solves when with_var
        cols = mq * (1 + d) if with_grad else mq
        bytes_gram = 2 * m * cols * 4
        if with_var:
            bytes_gram += 2 * m * mq * 4 * 2  # beta + gamma passes
        roof_us = bytes_gram / (HBM_GBPS * 1e3)  # bytes/(GB/s) in us
        print(json.dumps({
            "path": label, "us": round(t_us, 1),
            "hbm_roofline_us": round(roof_us, 1),
            "x_roofline": round(t_us / roof_us, 2)}), flush=True)

    # the serving-path variant: variance whitening as a GEMM against the
    # prepare-cached chol(Q_M)^{-1} (fitc_variance li_qm; what the class
    # Test() path uses at f32) instead of the per-call trsm
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        _tri_inv)
    li = _tri_inv(L_qm)

    for with_grad, label in [(False, "mean_var_amortized"),
                             (True, "mean_grad_var_amortized")]:
        def fn(eps, wg=with_grad):
            mean, grad, var = spgp_predict(
                st, L_qm, a, xq + eps, DTYPE(0.55), kernel="matern32",
                with_grad=wg, with_var=True, li_qm=li)
            return (mean, var) if grad is None else (mean, grad, var)

        t_us = _time(fn, iters=200) * 1e6
        cols = mq * (1 + d) if with_grad else mq
        bytes_gram = 2 * m * cols * 4 + 2 * m * mq * 4 * 2
        roof_us = bytes_gram / (HBM_GBPS * 1e3)
        print(json.dumps({
            "path": label, "us": round(t_us, 1),
            "hbm_roofline_us": round(roof_us, 1),
            "x_roofline": round(t_us / roof_us, 2)}), flush=True)


if __name__ == "__main__":
    main()
