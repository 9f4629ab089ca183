"""Joint value/gradient grams for GPs with derivative observations (NIGP).

Equivalent of the reference's ``ComputeKtrainWithGradient`` /
``ComputeKtestWithGradient`` kernel interface (call sites:
src/noisy_input_gp.cpp:860-868 and :65-72). Layout matches the reference:

- train gram rows/cols: ``[values(n); grad-dim0(n); grad-dim1(n); ...]``
  (dim-major gradient blocks; the reference packs only flagged samples —
  here every sample has a gradient slot and unflagged slots are masked to
  identity rows, which is exactly equivalent and keeps shapes static for XLA)
- test gram columns:     ``[means(m); grad-dim0(m); grad-dim1(m); ...]``
  (reference column indexing ``jj = index + (j+1)*num_test``,
  src/noisy_input_gp.cpp:196)

Noise placement (pinned numerically against reference goldens,
tests/test_noisy_input_gp.py): value diagonal += ``var_x + var_y``,
gradient diagonal += ``var_grad``.

The prior gradient variance used in predictive gradient-variance formulas is
``3 / scale^2`` for every kernel family — a reference quirk inherited from
Matérn-3/2 (``m_three_over_scale_square_``, src/noisy_input_gp.cpp:724) that
we replicate for parity.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from erl_gaussian_process_tpu.kernels.base import resolve_kernel_name


def gradient_prior_variance(scale: float) -> float:
    """Prior variance of each gradient component: 3/scale^2
    (reference: src/noisy_input_gp.cpp:724, used at :270-280)."""
    return 3.0 / (scale * scale)


def _rbf_blocks(x1, x2, scale):
    """k, dk/dx2, d2k/dx1 dx2 for the RBF kernel k = exp(-|d|^2 / 2 s^2)."""
    inv_s2 = 1.0 / (scale * scale)
    diff = x1[:, None, :] - x2[None, :, :]            # (n, m, d)
    r2 = jnp.sum(diff * diff, axis=-1)                # (n, m)
    k = jnp.exp(-0.5 * inv_s2 * r2)
    dk = diff * (inv_s2 * k)[..., None]               # dk/dx2_l = (d_l/s^2) k
    d = x1.shape[-1]
    eye = jnp.eye(d, dtype=k.dtype)
    # d2k/dx1_k dx2_l = (delta_kl/s^2 - d_k d_l / s^4) k
    d2k = (eye[None, None] * inv_s2
           - diff[..., :, None] * diff[..., None, :] * (inv_s2 * inv_s2)) \
        * k[..., None, None]
    return k, dk, d2k


def _matern32_blocks(x1, x2, scale):
    """Matérn-3/2: k = (1 + c r) e^{-c r}, c = sqrt(3)/s.
    dk/dx2_l = c^2 d_l e^{-cr};  d2k/dx1_k dx2_l = c^2 e^{-cr}(δ_kl - c d_k d_l / r)."""
    c = math.sqrt(3.0) / scale
    diff = x1[:, None, :] - x2[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    r = jnp.sqrt(r2)
    e = jnp.exp(-c * r)
    k = (1.0 + c * r) * e
    dk = diff * ((c * c) * e)[..., None]
    d = x1.shape[-1]
    eye = jnp.eye(d, dtype=k.dtype)
    safe_r = jnp.where(r > 0, r, 1.0)
    outer = diff[..., :, None] * diff[..., None, :] / safe_r[..., None, None]
    d2k = (c * c) * e[..., None, None] * (eye[None, None] - c * outer)
    return k, dk, d2k


_GRAD_BLOCKS = {
    "rbf": _rbf_blocks,
    "matern32": _matern32_blocks,
}


def _blocks(name, x1, x2, scale):
    from erl_gaussian_process_tpu.kernels.base import mixture_params

    key = resolve_kernel_name(name)
    mix = mixture_params(key)
    if mix is not None:
        # differentiation is linear: the mixture's (k, dk, d2k) are the
        # weighted sums of the component blocks at each component scale
        base, ratios, weights = mix
        try:
            fn = _GRAD_BLOCKS[base]
        except KeyError:
            raise NotImplementedError(
                f"kernel {base!r} has no gradient gram "
                "(OU is not differentiable at 0)") from None
        k, dk, d2k = fn(x1, x2, scale * ratios[0])
        k, dk, d2k = weights[0] * k, weights[0] * dk, weights[0] * d2k
        for w, m in zip(weights[1:], ratios[1:]):
            kc, dkc, d2kc = fn(x1, x2, scale * m)
            k, dk, d2k = k + w * kc, dk + w * dkc, d2k + w * d2kc
        return k, dk, d2k
    try:
        return _GRAD_BLOCKS[key](x1, x2, scale)
    except KeyError:
        raise NotImplementedError(
            f"kernel {key!r} has no gradient gram (OU is not differentiable at 0)"
        ) from None


def _assemble(k, dk, d2k, neg_row_grad: bool):
    """Assemble the joint gram [[Kff, Kfg], [Kgf, Kgg]] with dim-major
    gradient blocks. ``neg_row_grad``: gradient ROWS differentiate w.r.t. x1,
    so their value-covariances flip sign relative to dk (= d/dx2)."""
    n, m, d = dk.shape
    kfg = dk.transpose(0, 2, 1).reshape(n, d * m)          # value-row, grad-col
    kgf_blocks = -dk if neg_row_grad else dk               # d/dx1 = -d/dx2
    kgf = kgf_blocks.transpose(2, 0, 1).reshape(d * n, m)  # grad-row, value-col
    kgg = d2k.transpose(2, 0, 3, 1).reshape(d * n, d * m)
    top = jnp.concatenate([k, kfg], axis=1)
    bot = jnp.concatenate([kgf, kgg], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def joint_mask(sample_mask, grad_mask, d: int):
    """Row-activity mask of the joint system: values then d gradient blocks."""
    return jnp.concatenate([sample_mask] + [grad_mask] * d, axis=0)


def train_gram_with_gradient(
    name, x, var_x, var_y, var_grad, sample_mask, grad_mask, scale
):
    """Joint train gram, identity-padded outside the active rows.

    x: (n, d); var_*: (n,); sample_mask/grad_mask: (n,) bool.
    Returns (n(1+d), n(1+d)).
    """
    n, d = x.shape
    k, dk, d2k = _blocks(name, x, x, scale)
    big = _assemble(k, dk, d2k, neg_row_grad=True)
    noise = jnp.concatenate(
        [(var_x + var_y)] + [var_grad] * d, axis=0
    ).astype(big.dtype)
    big = big + jnp.diag(noise)
    act = joint_mask(sample_mask, grad_mask, d)
    m2 = act[:, None] & act[None, :]
    eye = jnp.eye(n * (1 + d), dtype=big.dtype)
    return jnp.where(m2, big, eye)


def cross_gram_with_gradient(
    name, x_train, x_test, scale, sample_mask, grad_mask, with_test_grad: bool,
    with_train_grad: bool = True,
):
    """Joint cross gram, rows = train joint system, cols = test queries
    (means first, then dim-major gradient columns if ``with_test_grad``).
    Masked-out train rows are zeroed.

    ``with_train_grad=False`` emits value rows only (the reference's
    ``no_gradient_observation`` branch still predicts test gradients from a
    value-only train system, src/noisy_input_gp.cpp:821-829 + :65-72).
    Returns (n or n(1+d), m or m(1+d)).
    """
    n, d = x_train.shape
    m = x_test.shape[0]
    k, dk, d2k = _blocks(name, x_train, x_test, scale)
    if with_train_grad and with_test_grad:
        big = _assemble(k, dk, d2k, neg_row_grad=True)
    elif with_train_grad:
        kgf = (-dk).transpose(2, 0, 1).reshape(d * n, m)
        big = jnp.concatenate([k, kgf], axis=0)
    elif with_test_grad:
        kfg = dk.transpose(0, 2, 1).reshape(n, d * m)
        big = jnp.concatenate([k, kfg], axis=1)
    else:
        big = k
    if with_train_grad:
        act = joint_mask(sample_mask, grad_mask, d)
    else:
        act = sample_mask
    return jnp.where(act[:, None], big, 0.0)
