"""Fused Pallas cross-gram kernel.

The gram matrix K[i, j] = k(x1_i, x2_j) is the reference's
``Covariance::ComputeKtest``/``ComputeKtrain`` hot loop (reference call
sites: src/vanilla_gp.cpp:487,537; src/sparse_pseudo_input_gp.cpp:758-762).
XLA's generic broadcast-diff fusion leaves ~20x bandwidth on the table at
production shapes (measured 0.21 ms for a (1024, 2048) float32 matern32 gram
on v5e vs a ~0.01 ms write roofline); this kernel computes distance + kernel
function in one VMEM pass per output tile.

Layout: inputs are passed transposed, ``(d, n)`` with the point index on the
lane (128-wide) axis, so each feature dim is one VPU row broadcast — no 3-D
intermediates, no relayouts. The d-loop is unrolled at trace time (d <= 8).

Padding: callers may pass any (m, n); the wrapper pads the lane/sublane dims
to tile multiples and slices the result. Padded rows/cols compute garbage
that is sliced away (kernel functions are finite everywhere, incl. r = 0).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

# explicit int32 index-map constants: under jax_enable_x64 a bare
# Python literal traces as i64 and Mosaic rejects the mixed-width
# index tuple (func.return (i32, i64) fails to legalize)
_Z = np.int32(0)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from erl_gaussian_process_tpu.ops.vma import io_vma

_TILE_M = 256
_TILE_N = 512
_MIN_ELEMENTS = 128 * 128  # below this, dispatch overhead dominates; use jnp


def pallas_gram_enabled(dtype, m: int, n: int, d: int) -> bool:
    """Dispatch policy: TPU backend, f32, d small, problem big enough.
    Symbolic dimensions (jax.export shape polymorphism) are not Pallas-
    eligible — size comparisons would be inconclusive, so fall to the
    jnp path."""
    if not all(isinstance(v, int) for v in (m, n, d)):
        return False
    if os.environ.get("ERL_GP_NO_PALLAS"):
        return False
    if jnp.dtype(dtype) != jnp.float32 or d > 8:
        return False
    if m * n < _MIN_ELEMENTS:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # no backend yet
        return False


def _apply_family(name: str, r2, scale: float):
    """Kernel value from squared distance (unit variance, SURVEY.md §2.2).

    Scale-mixture names (kernels/stationary.register_scale_mixture) are
    supported natively: the distance tile is already in registers, so a
    W-component mixture is W fused scalar maps + a weighted sum on the
    VPU — the fused FITC/bank/gram kernels all stay on for mixture
    configs (ratios/weights are static config, unrolled at trace time)."""
    from erl_gaussian_process_tpu.kernels.base import mixture_params

    mix = mixture_params(name)
    if mix is not None:
        base, ratios, weights = mix
        out = weights[0] * _apply_family(base, r2, scale * ratios[0])
        for w, m in zip(weights[1:], ratios[1:]):
            out = out + w * _apply_family(base, r2, scale * m)
        return out
    if name == "rbf":
        return jnp.exp(r2 * (-0.5 / (scale * scale)))
    r = jnp.sqrt(r2)
    if name == "ou":
        return jnp.exp(-r / scale)
    if name == "matern32":
        c = math.sqrt(3.0) / scale
        cr = c * r
        return (1.0 + cr) * jnp.exp(-cr)
    raise KeyError(f"pallas gram: unknown kernel family {name!r}")


def _gram_kernel(*refs, name: str, d: int):
    # per-dim x1 columns (TILE_M, 1) broadcast natively across lanes; x2
    # dims are sublane rows of one (8, TILE_N) buffer broadcasting across
    # sublanes. Measured on v5e: extracting columns from a (TILE_M, d_pad)
    # buffer is a cross-lane gather that doubles kernel time.
    (scale_ref, *x1_refs, x2r_ref, out_ref) = refs
    r2 = jnp.zeros(out_ref.shape, out_ref.dtype)
    for k in range(d):  # d is tiny and static: unrolled VPU broadcasts
        diff = x1_refs[k][:, :] - x2r_ref[k, :][None, :]  # (TILE_M, TILE_N)
        r2 = r2 + diff * diff
    out_ref[:] = _apply_family(name, r2, scale_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("name", "d"))
def _pallas_cross_gram_padded(scale, x1_cols, x2r, *, name: str, d: int):
    m = x1_cols[0].shape[0]
    n = x2r.shape[1]
    grid = (m // _TILE_M, n // _TILE_N)
    return pl.pallas_call(
        functools.partial(_gram_kernel, name=name, d=d),
        out_shape=jax.ShapeDtypeStruct((m, n), x2r.dtype,
                                       vma=io_vma(scale, *x1_cols, x2r)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (_Z, _Z),
                         memory_space=pltpu.SMEM),
            *[pl.BlockSpec((_TILE_M, 1), lambda i, j: (i, _Z),
                           memory_space=pltpu.VMEM) for _ in range(d)],
            pl.BlockSpec((8, _TILE_N), lambda i, j: (_Z, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_M, _TILE_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * m * n * d,
            bytes_accessed=(m + n) * d * 4 + m * n * 4,
            transcendentals=m * n,
        ),
    )(scale, *x1_cols, x2r)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def pallas_cross_gram(name: str, x1, x2, scale) -> jnp.ndarray:
    """K[i, j] = k(x1_i, x2_j). x1: (m, d); x2: (n, d) -> (m, n), float32.

    The d-loop runs on the feature dim as sublanes; points ride the lane
    axis. Call ``pallas_gram_enabled`` first — this function assumes TPU.
    """
    m, d = x1.shape
    n = x2.shape[0]
    mp, np_ = _round_up(m, _TILE_M), _round_up(n, _TILE_N)
    x1_cols = [jnp.zeros((mp, 1), x1.dtype).at[:m, 0].set(x1[:, k])
               for k in range(d)]
    x2r = jnp.zeros((8, np_), x2.dtype).at[:d, :n].set(x2.T)
    scale_arr = jnp.asarray(scale, x2r.dtype).reshape(1, 1)
    out = _pallas_cross_gram_padded(scale_arr, x1_cols, x2r, name=name, d=d)
    return out[:m, :n]
