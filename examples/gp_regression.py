"""GP regression walkthrough: exact GP, noisy-input GP with gradient
observations, sparse pseudo-input GP, and a reduced-rank (Hilbert) GP on the
same 1D problem — the reference's test scenarios as a demo.

Usage: JAX_PLATFORMS=cpu python examples/gp_regression.py
"""

import os
import sys

# run from a checkout without installing the package
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

# honor JAX_PLATFORMS=cpu even when a TPU plugin overrides it
# programmatically at interpreter start (this image's remote-TPU
# environment does): force the platform via jax.config before any
# backend initializes.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from erl_gaussian_process_tpu.api import (
    NoisyInputGaussianProcessD,
    SparsePseudoInputGaussianProcessD,
    VanillaGaussianProcessD,
)
from erl_gaussian_process_tpu.kernels import KernelSetting, ReducedRankSetting
from erl_gaussian_process_tpu.models.noisy_input_gp import NoisyInputGPSetting
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import SpGpSetting
from erl_gaussian_process_tpu.models.vanilla_gp import (
    VanillaGaussianProcess,
    VanillaGPSetting,
)


def main():
    rng = np.random.default_rng(0)
    n = 200
    x = np.sort(rng.uniform(-0.9, 0.9, n))[None, :]    # (x_dim, n)
    f = np.sin(3 * x[0])
    y = (f + rng.normal(0, 0.01, n))[:, None]
    var = np.full(n, 1e-4)
    xq = np.linspace(-0.8, 0.8, 400)[None, :]
    truth = np.sin(3 * xq[0])

    # 1. exact GP (reference: VanillaGaussianProcess)
    gp = VanillaGaussianProcessD(VanillaGPSetting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.3)))
    gp.train(x, y, var)
    r = gp.test(xq)
    print("exact GP      MAE %.2e   mean var %.2e"
          % (np.abs(r.get_mean() - truth).mean(), r.get_variance().mean()))

    # 2. NIGP with gradient observations (GPIS style)
    grad = 3 * np.cos(3 * x)                           # (x_dim*y_dim, n)
    nig = NoisyInputGaussianProcessD(NoisyInputGPSetting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=0.3)))
    nig.train(x, y, mat_grad=grad, var_x=np.full(n, 1e-6), var_y=var,
              var_grad=np.full(n, 1e-4),
              grad_flag=np.ones(n, bool))
    rn = nig.test(xq, predict_gradient=True)
    print("NIGP+grad     MAE %.2e   grad MAE %.2e"
          % (np.abs(rn.get_mean() - truth).mean(),
             np.abs(rn.get_gradient()[0] - 3 * np.cos(3 * xq[0])).mean()))

    # 3. incremental SPGP over 20 pseudo points, two streamed batches
    sp = SparsePseudoInputGaussianProcessD(
        SpGpSetting(kernel_type="rbf", kernel=KernelSetting(x_dim=1,
                                                            scale=0.3)),
        np.linspace(-1, 1, 20)[None, :])
    half = n // 2
    sp.update(x[:, :half], y[:half], var[:half])
    sp.update(x[:, half:], y[half:], var[half:])
    rs = sp.test(xq)
    print("SPGP (m=20)   MAE %.2e" % np.abs(rs.get_mean() - truth).mean())

    # 4. reduced-rank (Hilbert-space) GP, 64 basis functions
    rr = VanillaGaussianProcess(VanillaGPSetting(
        kernel_type="reduced_rank_rbf",
        kernel=ReducedRankSetting(x_dim=1, scale=0.3, num_basis=[64],
                                  boundary=[2.0], coord_origin=[0.0])))
    rr.train(x, y, var)
    rrr = rr.test(xq)
    print("RR-GP (64 bf) MAE %.2e" % np.abs(rrr.get_mean() - truth).mean())

    # 5. marginal-likelihood scale selection (one vmapped NLML sweep —
    # the automated version of the manual sweeps the reference records
    # in its test comments)
    from erl_gaussian_process_tpu.utils import select_scale

    best, _, _ = select_scale(x.T, y, var, kernel="rbf", refine=1)
    tuned = VanillaGaussianProcessD(VanillaGPSetting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=best)))
    tuned.train(x, y, var)
    print("NLML scale    %.3f -> MAE %.2e"
          % (best, np.abs(tuned.test(xq).get_mean() - truth).mean()))

    # 6. NIGP variant: the joint value/gradient NLML (the reference's own
    # recorded sweeps, test_noisy_input_gp.cpp:174-178, were for this model)
    from erl_gaussian_process_tpu.utils import select_scale_nigp

    best_n, _, _ = select_scale_nigp(
        x.T, y, grad.T[:, :, None], np.full(n, 1e-6), var,
        np.full(n, 1e-4), kernel="rbf", refine=1)
    tuned_n = NoisyInputGaussianProcessD(NoisyInputGPSetting(
        kernel_type="rbf", kernel=KernelSetting(x_dim=1, scale=best_n)))
    tuned_n.train(x, y, mat_grad=grad, var_x=np.full(n, 1e-6), var_y=var,
                  var_grad=np.full(n, 1e-4), grad_flag=np.ones(n, bool))
    rt = tuned_n.test(xq, predict_gradient=True)
    print("NIGP NLML     %.3f -> MAE %.2e   grad MAE %.2e"
          % (best_n, np.abs(rt.get_mean() - truth).mean(),
             np.abs(rt.get_gradient()[0] - 3 * np.cos(3 * xq[0])).mean()))

    # 6b. FITC variant: select the scale for the fixed-pseudo-point SPGP
    # (the production occupancy-map YAML hand-sets scale: 0.18 — this is
    # the automated version of that choice)
    from erl_gaussian_process_tpu.utils import select_scale_spgp

    best_s, _, _ = select_scale_spgp(
        np.linspace(-1, 1, 20)[:, None], x.T, y, var, kernel="rbf",
        refine=1)
    sp_t = SparsePseudoInputGaussianProcessD(
        SpGpSetting(kernel_type="rbf",
                    kernel=KernelSetting(x_dim=1, scale=best_s)),
        np.linspace(-1, 1, 20)[None, :])
    sp_t.update(x, y, var)
    print("SPGP NLML     %.3f -> MAE %.2e"
          % (best_s, np.abs(sp_t.test(xq).get_mean() - truth).mean()))

    # 7. scale-mixture kernel: two RBF components at scale and scale/2
    # (erl_covariance's Setting{scale_mix, weights}; docs/parity.md #2)
    mixgp = VanillaGaussianProcessD(VanillaGPSetting(
        kernel_type="rbf",
        kernel=KernelSetting(x_dim=1, scale=best, scale_mix=0.5,
                             weights=[0.7, 0.3])))
    mixgp.train(x, y, var)
    print("mixture GP    MAE %.2e"
          % np.abs(mixgp.test(xq).get_mean() - truth).mean())


if __name__ == "__main__":
    main()
