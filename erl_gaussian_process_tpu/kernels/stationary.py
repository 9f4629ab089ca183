"""Stationary kernel gram builders (pure jnp; Pallas fused variants live in
``pallas_gram.py`` and are selected automatically for large problems).

Kernel families (conventions pinned numerically against the reference's
golden-accuracy tests, see tests/test_vanilla_gp.py):

- ``rbf``      : k(r) = exp(-r^2 / (2 s^2))      (reference name RadialBiasFunction)
- ``ou``       : k(r) = exp(-r / s)              (OrnsteinUhlenbeck)
- ``matern32`` : k(r) = (1 + c r) exp(-c r),  c = sqrt(3)/s

All are unit variance. ``train_gram`` adds per-sample noise to the diagonal —
the reference keeps noise inside ``ComputeKtrain`` (src/vanilla_gp.cpp:487) —
and applies identity padding for masked-out rows so padded Choleskys remain
valid (identity-padding trick, reference: src/batch_gp_update_torch.cpp:60-67).

Array layout: inputs are row-major ``(n, d)`` (the reference uses Eigen
column-major ``(d, n)``; the class-level API accepts both, see models/).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from erl_gaussian_process_tpu.kernels.base import register_kernel, get_kernel


def pairwise_sqdist(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances. x1: (n, d), x2: (m, d) -> (n, m).

    Uses the exact elementwise-difference form (matches Eigen's arithmetic for
    float64 golden parity); XLA fuses the broadcast + reduce, and for the tiny
    feature dims used here (d <= 3) this is VPU-bound, not MXU-bound.
    """
    diff = x1[:, None, :] - x2[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def pairwise_dist(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(pairwise_sqdist(x1, x2))


# --- kernel families ---------------------------------------------------------

def _rbf_from_sqdist(r2, scale):
    return jnp.exp(r2 * (-0.5 / (scale * scale)))


def _ou_from_dist(r, scale):
    return jnp.exp(-r / scale)


def _matern32_from_dist(r, scale):
    c = math.sqrt(3.0) / scale
    cr = c * r
    return (1.0 + cr) * jnp.exp(-cr)


def _rbf(x1, x2, scale):
    return _rbf_from_sqdist(pairwise_sqdist(x1, x2), scale)


def _ou(x1, x2, scale):
    return _ou_from_dist(pairwise_dist(x1, x2), scale)


def _matern32(x1, x2, scale):
    return _matern32_from_dist(pairwise_dist(x1, x2), scale)


register_kernel("rbf", cross=_rbf)
register_kernel("ou", cross=_ou)
register_kernel("matern32", cross=_matern32)

_FROM_DIST = {
    "rbf": _rbf_from_sqdist,   # consumes SQUARED distance
    "ou": _ou_from_dist,
    "matern32": _matern32_from_dist,
}


def register_scale_mixture(base: str, scale_mix: float, weights: tuple) -> str:
    """Register (idempotently) a scale-mixture kernel over one base family
    and return its registry name.

    Semantics (erl_covariance's ``Setting{scale, scale_mix, weights}``; its
    source is not vendored in the reference snapshot, so the contract is
    ours, documented in docs/parity.md): ``k_mix(r; s) =
    sum_i w_i k(r; s * scale_mix**i) / sum_i w_i`` — a geometric ladder of
    component scales with normalized weights, preserving the unit-variance
    invariant k(x,x)=1 that every variance formula relies on
    (1 - ||.||^2, reference: src/vanilla_gp.cpp:121).

    TPU shape: the component count is static config, so the mixture is a
    single registered closure — the pairwise distance matrix is computed
    ONCE and each component applies only its scalar map; XLA fuses the W
    elementwise maps + weighted sum into one pass over the (n, m) tile.
    """
    total = float(sum(weights))
    wn = tuple(float(w) / total for w in weights)
    ratios = tuple(float(scale_mix) ** i for i in range(len(wn)))
    name = "mix(%s;%g;%s)" % (base, float(scale_mix),
                              ",".join("%g" % w for w in weights))
    from erl_gaussian_process_tpu.kernels import base as _base
    if name in _base._MIXTURES:
        return name

    fdist = _FROM_DIST[base]
    squared = base == "rbf"

    def cross(x1, x2, scale):
        r = pairwise_sqdist(x1, x2) if squared else pairwise_dist(x1, x2)
        out = wn[0] * fdist(r, scale * ratios[0])
        for w, m in zip(wn[1:], ratios[1:]):
            out = out + w * fdist(r, scale * m)
        return out

    register_kernel(name, cross=cross)
    _base._MIXTURES[name] = (base, ratios, wn)
    return name


def kernel_fn(name: str):
    """Return k(x1, x2, scale) -> (n, m) for a kernel family name."""
    return get_kernel(name)["cross"]


# --- gram builders -----------------------------------------------------------

def cross_gram(name: str, x1, x2, scale, mask1=None) -> jnp.ndarray:
    """K[i, j] = k(x1_i, x2_j); rows with mask1 False are zeroed.

    Equivalent of ``Covariance::ComputeKtest`` (reference call site:
    src/vanilla_gp.cpp:537) transposed to (n_train, n_test)-as-(rows, cols) =
    reference's column layout. Dispatches to the fused Pallas kernel on TPU
    for float32 problems above the dispatch-overhead threshold.
    """
    from erl_gaussian_process_tpu.kernels.base import mixture_params
    from erl_gaussian_process_tpu.ops.pallas_gram import (
        pallas_cross_gram,
        pallas_gram_enabled,
    )

    if (x1.ndim == 2
            and (name in ("rbf", "ou", "matern32")
                 or mixture_params(name) is not None)
            and pallas_gram_enabled(x1.dtype, x1.shape[0], x2.shape[0],
                                    x1.shape[1])):
        k = pallas_cross_gram(name, x1, x2, scale)
    else:
        k = kernel_fn(name)(x1, x2, scale)
    if mask1 is not None:
        k = jnp.where(mask1[:, None], k, 0.0)
    return k


def train_gram(name: str, x, var, scale, mask=None) -> jnp.ndarray:
    """K = k(x, x) + diag(var), identity-padded outside ``mask``.

    Equivalent of ``Covariance::ComputeKtrain(x, var, n, K, alpha)``
    (reference call site: src/vanilla_gp.cpp:487). With ``mask`` given,
    masked-out rows/cols become identity rows: the Cholesky factor and all
    solves then agree exactly with the compacted (mask-gathered) problem.
    """
    k = kernel_fn(name)(x, x, scale)
    n = x.shape[0]
    k = k + jnp.diag(var.astype(k.dtype))
    if mask is not None:
        m2 = mask[:, None] & mask[None, :]
        eye = jnp.eye(n, dtype=k.dtype)
        k = jnp.where(m2, k, eye)
    return k
