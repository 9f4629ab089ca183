"""Reduced-rank (Hilbert-space) covariance — TPU-native equivalent of the
reference's external ``covariance::ReducedRankCovariance<Dtype>`` (API
reconstructed from call sites, SURVEY.md §2.2; reference usage:
src/vanilla_gp.cpp:120-131 variance sign flip, :304-310 stateful copy,
:358-374 coord origin, :757/:828 ``BuildSpectralDensities``).

Method (Solin & Särkkä, "Hilbert space methods for reduced-rank Gaussian
process regression", Stat. Comput. 2020): on the box
``[origin - Lb, origin + Lb]^d`` the negative Laplacian has eigenpairs

    phi_j(x)  = prod_k sqrt(1/Lb_k) * sin(pi j_k (x_k - o_k + Lb_k) / (2 Lb_k))
    lam_j     = sum_k (pi j_k / (2 Lb_k))^2

and a stationary kernel is approximated by k(x, x') ~= sum_j S(sqrt(lam_j))
phi_j(x) phi_j(x') with S the kernel's spectral density. We use the
*whitened* parameterization: features ``phit_j = sqrt(S_j) * phi_j`` so the
prior on weights is N(0, I). Then

    train:    A = I + Phit^T diag(1/var) Phit        (m, m)
              b = Phit^T (y / var)                   (m, q)
              L = chol(A);  alpha = A^{-1} b
    predict:  mean = phit(x*)^T alpha
              var  = ||L^{-1} phit(x*)||^2           <- note **+**, no 1-...

which is exactly the reference's reduced-rank contract: "Ktrain" is the
(m, m) information matrix (rows = #basis, not n — vanilla_gp.cpp:804), and
the posterior variance flips from ``1 - ||.||^2`` to ``+||.||^2``
(vanilla_gp.cpp:120-131).

TPU notes: the feature matrix build is one (n, m) outer-product-of-sines per
dim followed by an (m, n) x (n, m) GEMM on the MXU — larger and denser than
the exact-GP path, which is the point: m stays fixed as n grows.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from erl_gaussian_process_tpu.kernels.base import KernelSetting

# names accepted for a reduced-rank kernel: "reduced_rank_rbf", "rr_matern32",
# or the reference's C++ type string "erl::covariance::ReducedRankMatern32<...>"
_RR_NAME_RE = re.compile(
    r"^(?:erl::covariance::)?(?:ReducedRank|reduced_rank_?|rr_)(\w*?)"
    r"\s*(?:<.*>)?$", re.IGNORECASE)

_BASE_ALIASES = {
    "radialbiasfunction": "rbf", "radial_bias_function": "rbf",
    "squaredexponential": "rbf", "rbf": "rbf",
    "ornsteinuhlenbeck": "ou", "ornstein_uhlenbeck": "ou", "ou": "ou",
    "matern32": "matern32", "": "",
}


def parse_reduced_rank_name(name: str) -> Optional[str]:
    """If ``name`` denotes a reduced-rank kernel, return the base kernel
    family name ("" when the name is generic, e.g. just "reduced_rank" —
    the setting's ``base_kernel`` then decides); else None."""
    m = _RR_NAME_RE.match(name.strip())
    if not m:
        return None
    base = re.sub(r"\d+[df]?$", "", m.group(1)).lower()
    if base in ("matern", "matern3"):
        base = "matern32"
    return _BASE_ALIASES.get(base, base)


# --- spectral densities (unit-variance kernels, isotropic, d input dims) ----

def spectral_density(name: str, omega2, scale: float, d: int):
    """S(omega) as a function of omega^2 for the three kernel families.

    rbf      : S = (2 pi)^{d/2} s^d exp(-omega^2 s^2 / 2)
    matern32 : nu = 3/2, S = c_d * (2 nu / s^2 + omega^2)^{-(nu + d/2)}
    ou       : nu = 1/2 (exponential kernel), same Matern form.
    """
    s = scale
    if name == "rbf":
        return (2.0 * math.pi) ** (d / 2.0) * s**d * jnp.exp(-0.5 * s * s * omega2)
    if name in ("matern32", "ou"):
        nu = 1.5 if name == "matern32" else 0.5
        c = (2.0 ** d * math.pi ** (d / 2.0) * math.gamma(nu + d / 2.0)
             * (2.0 * nu) ** nu) / (math.gamma(nu) * s ** (2.0 * nu))
        return c * (2.0 * nu / (s * s) + omega2) ** (-(nu + d / 2.0))
    raise KeyError(f"no spectral density for kernel {name!r}")


@dataclasses.dataclass
class ReducedRankSetting(KernelSetting):
    """Setting for the reduced-rank kernel: extends the base covariance
    setting (reference: ReducedRankCovariance<Dtype>::Setting) with the
    basis grid. ``boundary`` is the box half-extent per dim (relative to
    ``coord_origin``); ``num_basis`` is basis functions per dim (total
    m = prod(num_basis))."""

    base_kernel: str = "rbf"
    num_basis: List[int] = dataclasses.field(default_factory=lambda: [32])
    # None = "not set by the user" — the sensor-model classes derive a
    # frame-fitted box from it, and ReducedRankBasis falls back to the
    # reference's 1.0 half-extent. A literal [1.0] is an EXPLICIT box and
    # survives (the old [1.0] dataclass default was indistinguishable from
    # an explicit 1.0-rad boundary, silently overriding it).
    boundary: Optional[List[float]] = None
    coord_origin: List[float] = dataclasses.field(default_factory=lambda: [0.0])

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in (d or {}).items() if k in known})


class ReducedRankBasis:
    """Precomputed basis-grid state — the equivalent of the reference's
    stateful kernel whose ``BuildSpectralDensities()`` must run after
    creation/deserialization (vanilla_gp.cpp:828, :757) and which must be
    deep-copied with the GP (vanilla_gp.cpp:304-310).

    Holds the per-basis frequency grid and the whitening weights
    sqrt(S(sqrt(lam_j))). Pure data; all feature evaluation is stateless jnp.
    """

    def __init__(self, setting: ReducedRankSetting, dtype=np.float64):
        self.setting = setting
        self.dtype = np.dtype(dtype)
        d = len(setting.num_basis)
        if setting.boundary is None:
            # unset -> the reference Setting's 1.0 half-extent per dim
            setting.boundary = [1.0] * d
        if len(setting.boundary) != d or len(setting.coord_origin) != d:
            raise ValueError(
                "num_basis, boundary, coord_origin must share length "
                f"({setting.num_basis}, {setting.boundary}, "
                f"{setting.coord_origin})")
        self.build_spectral_densities()

    @property
    def num_basis_total(self) -> int:
        return int(np.prod(self.setting.num_basis))

    @property
    def x_dim(self) -> int:
        return len(self.setting.num_basis)

    def build_spectral_densities(self):
        """(Re)build the frequency grid + whitening weights
        (reference: BuildSpectralDensities, called post-create/post-load)."""
        s = self.setting
        d = self.x_dim
        axes = [np.arange(1, n + 1, dtype=self.dtype) for n in s.num_basis]
        grids = np.meshgrid(*axes, indexing="ij")
        j = np.stack([g.ravel() for g in grids], axis=-1)      # (m, d)
        Lb = np.asarray(s.boundary, self.dtype)                 # (d,)
        freq = j * (math.pi / 2.0) / Lb                         # (m, d)
        lam = np.sum(freq * freq, axis=-1)                      # (m,)
        Sj = np.asarray(
            spectral_density(s.base_kernel, jnp.asarray(lam), s.scale, d))
        self._freq = jnp.asarray(freq)                          # (m, d)
        self._sqrt_s = jnp.asarray(np.sqrt(Sj, dtype=self.dtype))
        self._origin = jnp.asarray(np.asarray(s.coord_origin, self.dtype))
        self._half = jnp.asarray(Lb)
        self._inv_sqrt_vol = self.dtype.type(
            float(np.prod(1.0 / np.sqrt(Lb))))

    # -- coord origin (reference: Get/SetCoordOrigin, vanilla_gp.cpp:358-374)
    @property
    def coord_origin(self) -> np.ndarray:
        return np.asarray(self._origin)

    def set_coord_origin(self, origin: Sequence[float]):
        self.setting.coord_origin = [float(v) for v in origin]
        self._origin = jnp.asarray(
            np.asarray(self.setting.coord_origin, self.dtype))

    def features(self, x, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Whitened features Phit (n, m): sqrt(S_j) * phi_j(x_i).

        x: (n, d). Rows with mask False are zeroed (so masked samples
        contribute nothing to A or b). Inputs outside the box clamp to the
        box edge (sin basis vanishes at the boundary, so far-outside points
        get ~zero features — mirroring the reference's domain assumption).
        """
        if mask is None:
            mask = jnp.ones(x.shape[0], bool)
        return rr_features(x, mask, self._freq, self._sqrt_s, self._origin,
                           self._half, self._inv_sqrt_vol)

    def state_dict(self):
        return {"setting": self.setting.to_dict(),
                "dtype": self.dtype.str}

    @classmethod
    def from_state_dict(cls, d):
        return cls(ReducedRankSetting.from_dict(d["setting"]),
                   dtype=np.dtype(d["dtype"]))

    def __eq__(self, other):
        if not isinstance(other, ReducedRankBasis):
            return NotImplemented
        return self.setting == other.setting and self.dtype == other.dtype


@jax.jit
def rr_features(x, mask, freq, sqrt_s, origin, half, inv_sqrt_vol):
    """Whitened Hilbert-basis features (n, m); see ReducedRankBasis.features."""
    z = x - origin[None, :] + half[None, :]            # (n, d) in [0, 2L]
    z = jnp.clip(z, 0.0, 2.0 * half[None, :])
    angles = z[:, None, :] * freq[None, :, :]          # (n, m, d)
    phi = jnp.prod(jnp.sin(angles), axis=-1)           # (n, m)
    phi = phi * (inv_sqrt_vol * sqrt_s)[None, :]
    return jnp.where(mask[:, None], phi, 0.0)


@jax.jit
def rr_features_with_grad(x, freq, sqrt_s, origin, half, inv_sqrt_vol):
    """Whitened features AND their input gradients: (phi (n, m),
    dphi (n, d, m)) with dphi[i, k, j] = d phit_j / d x_k (x_i).

    The reduced-rank GP is linear in the basis weights, so gradient
    observations/predictions are plain linear observations with
    gradient-feature rows — this is how the NIGP joint system threads
    through the reduced-rank kernel (the reference routes it through
    ReducedRankCovariance::ComputeKtrainWithGradient, called at
    src/noisy_input_gp.cpp:860-868; the external implementation is
    reconstructed from the Hilbert-RR math, see module docstring).
    Unmasked — callers apply sample/grad masks."""
    d = x.shape[1]
    z = x - origin[None, :] + half[None, :]
    zc = jnp.clip(z, 0.0, 2.0 * half[None, :])
    # chain rule through the clamp: the implemented feature is constant in
    # x_k wherever the coordinate is clipped, so its true derivative there
    # is 0 — without this, an out-of-box point pairs ~zero phi rows with
    # full-magnitude boundary-cosine dphi rows (inconsistent posteriors)
    inside = (z > 0.0) & (z < 2.0 * half[None, :])     # (n, d)
    angles = zc[:, None, :] * freq[None, :, :]         # (n, m, d)
    sin = jnp.sin(angles)
    cos = jnp.cos(angles)
    w = inv_sqrt_vol * sqrt_s                          # (m,)
    phi = jnp.prod(sin, axis=-1) * w[None, :]
    # d is tiny and static (1-3): unrolled per-dim product-of-others
    dphis = []
    dims = jnp.arange(d)
    for k in range(d):
        others = jnp.prod(
            jnp.where(dims[None, None, :] == k, 1.0, sin), axis=-1)
        dphis.append(others * cos[:, :, k] * freq[None, :, k]
                     * inside[:, k:k + 1])
    dphi = jnp.stack(dphis, axis=1) * w[None, None, :]  # (n, d, m)
    return phi, dphi


def rr_joint_train_system(phi, dphi, y, grad, var_val, var_grad,
                          sample_mask, grad_mask):
    """Joint value/gradient reduced-rank information system:

        A = I + Phit^T Wv Phit + sum_k dPhit_k^T Wg dPhit_k
        b = Phit^T Wv y + sum_k dPhit_k^T Wg grad_k

    with Wv = diag(sample_mask / var_val), Wg = diag(grad_mask / var_grad).
    ``var_val`` carries the NIGP value-noise placement var_x + var_y
    (kernels/gradient.py noise contract). phi (n, m); dphi (n, d, m);
    y (n, q); grad (n, d, q). Returns (A (m, m), b (m, q))."""
    wv = jnp.where(sample_mask, 1.0 / var_val, 0.0)
    wg = jnp.where(grad_mask, 1.0 / var_grad, 0.0)
    m = phi.shape[1]
    A = jnp.eye(m, dtype=phi.dtype) + phi.T @ (phi * wv[:, None])
    A = A + jnp.einsum("ndm,n,ndp->mp", dphi, wg, dphi)
    b = phi.T @ (jnp.where(sample_mask[:, None], y, 0.0) * wv[:, None])
    b = b + jnp.einsum("ndm,n,ndq->mq", dphi, wg,
                       jnp.where(grad_mask[:, None, None], grad, 0.0))
    return A, b


def rr_ktest_joint(xq, freq, sqrt_s, origin, half, inv_sqrt_vol,
                   with_test_grad: bool):
    """Reduced-rank "Ktest" in the NIGP joint layout: rows = #basis,
    columns = [means(mq) | grad-dim0(mq) | grad-dim1(mq) | ...]
    (dim-major blocks, matching cross_gram_with_gradient's column
    convention and the reference's jj = index + (j+1)*num_test indexing,
    src/noisy_input_gp.cpp:196). Shape (m, mq*(1+d)) or (m, mq)."""
    phi, dphi = rr_features_with_grad(xq, freq, sqrt_s, origin, half,
                                      inv_sqrt_vol)
    if not with_test_grad:
        return phi.T
    d = xq.shape[1]
    cols = [phi.T] + [dphi[:, k, :].T for k in range(d)]
    return jnp.concatenate(cols, axis=1)


def rr_train_system(basis_phi: jnp.ndarray, y, var, mask):
    """A = I + Phit^T diag(mask/var) Phit; b = Phit^T (mask * y / var).

    basis_phi: (n, m) already mask-zeroed or not — mask applied here again on
    the weights so either is safe. Returns (A (m, m), b (m, q)).
    """
    w = jnp.where(mask, 1.0 / var, 0.0)                        # (n,)
    phw = basis_phi * w[:, None]                               # (n, m)
    A = jnp.eye(basis_phi.shape[1], dtype=basis_phi.dtype) + basis_phi.T @ phw
    b = phw.T @ jnp.where(mask[:, None], y, 0.0)
    return A, b
