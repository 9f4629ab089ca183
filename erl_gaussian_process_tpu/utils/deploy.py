"""AOT export / deployment artifacts (`jax.export`).

Production serving wants the hot step functions as PRECOMPILED, portable
artifacts: a mapping service should load a bytes blob and run it — no
Python tracing, no model-code import on the serving host, and a pinned
program that cannot drift under it. jax.export serializes the lowered
StableHLO (optionally for MULTIPLE platforms: one artifact runs on both
the TPU fleet and a CPU fallback), with calling-convention and shape
checks baked in.

The reference has no analogue (its deployment story is "link the .so");
this is the TPU-native equivalent of shipping a compiled binary.

Two trace-time caveats, documented here because they are contracts:

- **Dispatch is frozen at export.** The Pallas-vs-XLA dispatch gates
  (`pallas_fitc_enabled` etc.) are Python-time checks against the
  exporting host's backend: an artifact exported on a CPU host carries
  the (numerically identical) XLA chain; export on a TPU host — or pass
  ``use_pallas=True`` explicitly where the step exposes it — to embed
  the fused Pallas kernels.
- **Shapes are frozen at export.** Fixed shapes are this framework's
  design anyway (SURVEY.md §7); export one artifact per production
  shape bucket.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
from jax import export as _jexport

_REGISTERED = False


def register_serializations() -> None:
    """Register every model-state NamedTuple with jax.export (idempotent).
    Required once per process before serializing artifacts whose
    inputs/outputs carry model states."""
    global _REGISTERED
    if _REGISTERED:
        return
    from erl_gaussian_process_tpu.models.batch_gp import BankState
    from erl_gaussian_process_tpu.models.noisy_input_gp import (
        NoisyInputGPState,
    )
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpState,
    )
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPState

    for cls in (BankState, NoisyInputGPState, SpGpState, VanillaGPState):
        _jexport.register_namedtuple_serialization(
            cls, serialized_name=f"erl_gaussian_process_tpu.{cls.__name__}")
    _REGISTERED = True


def export_fn(fn: Callable, *arg_specs,
              platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Serialize ``jit(fn)`` lowered for ``platforms`` at the given
    ``jax.ShapeDtypeStruct`` argument specs. Returns the artifact bytes."""
    register_serializations()
    exp = _jexport.export(jax.jit(fn), platforms=tuple(platforms))(
        *arg_specs)
    return bytes(exp.serialize())


def load_fn(blob: bytes) -> Callable:
    """Deserialize an artifact into a callable (usable inside jit too)."""
    register_serializations()
    exp = _jexport.deserialize(blob)
    return exp.call


def export_map_update_step(setting, *, n_pseudo: int, n_rays: int,
                           free_slots: int, dim: int = 2, dtype=None,
                           platforms: Sequence[str] = ("tpu", "cpu")
                           ) -> bytes:
    """The flagship artifact: one fused occupancy-map update (free-space
    sampling + logodds labeling + rank-N FITC update) at a fixed shape
    bucket, from a SpGpOccupancyMapSetting.

    Caller contract at serve time (mirrors SpGpOccupancyMap.update):
    ``new_state, n_used = step(state, base_key, step_index,
    sensor_position, scan_points, point_mask, aabb_min, aabb_max, scale)``.
    """
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.kernels import resolve_kernel_setting
    from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
        update_step,
    )
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpState,
    )

    f32 = dtype or jnp.float32
    s = setting
    zt = (float(s.sp_gp.sparse_zero_threshold)
          if s.sp_gp.use_sparse else 0.0)
    fn = functools.partial(
        update_step,
        # Resolve through the full Setting (scale_mix/weights included) so
        # the artifact bakes in the SAME kernel the live map resolves —
        # a mixture-configured map must not export a plain-base-kernel
        # artifact that silently accumulates a different posterior.
        kernel=resolve_kernel_setting(s.sp_gp.kernel_type, s.sp_gp.kernel,
                                      "export_map_update_step"),
        diagonal_qm=s.sp_gp.diagonal_qm, free_slots=free_slots,
        max_samples=int(s.sp_gp.max_num_samples),
        min_distance=s.min_distance, max_distance=s.max_distance,
        free_sampling_margin=s.free_sampling_margin,
        free_points_per_meter=s.free_points_per_meter,
        logodd_occupied=s.logodd_occupied, logodd_free=s.logodd_free,
        logodd_variance=s.logodd_variance, zero_threshold=zt)

    def S(shape, dt=f32):
        return jax.ShapeDtypeStruct(shape, dt)

    state = SpGpState(pseudo=S((n_pseudo, dim)),
                      L_km=S((n_pseudo, n_pseudo)),
                      L_inv=S((n_pseudo, n_pseudo)),
                      qm=S((n_pseudo, n_pseudo)), alpha=S((n_pseudo, 1)),
                      qm_c=S((n_pseudo, n_pseudo)),
                      alpha_c=S((n_pseudo, 1)))
    args = (state, S((2,), jnp.uint32), S((), jnp.int32), S((dim,)),
            S((n_rays, dim)), S((n_rays,), jnp.bool_), S((dim,)),
            S((dim,)), S(()))
    return export_fn(lambda *xs: fn(*xs), *args, platforms=platforms)


def export_map_predict_step(*, n_pseudo: int, n_queries=None, dim: int = 2,
                            kernel: str = "matern32", with_grad: bool = False,
                            zero_threshold: float = 0.0, dtype=None,
                            platforms: Sequence[str] = ("tpu", "cpu")
                            ) -> bytes:
    """The serving-side predict artifact: prepared-posterior queries
    (``mean, grad = predict(state, L_qm, alpha_solved, points, scale)``).

    ``n_queries``: an int freezes a query-batch bucket; ``None`` exports
    with a SYMBOLIC query dimension (jax.export shape polymorphism) — one
    artifact serves any batch size. The Pallas dispatch gates detect the
    symbolic dim and keep the (numerically identical) XLA path, so
    polymorphic artifacts trade the fused-kernel perf for bucket-free
    serving; export fixed buckets for the hot sizes."""
    import jax.numpy as jnp

    from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
        predict_prepared_step,
    )
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpState,
    )

    f32 = dtype or jnp.float32
    fn = functools.partial(predict_prepared_step, kernel=kernel,
                           with_grad=with_grad,
                           zero_threshold=zero_threshold)

    def S(shape, dt=f32):
        return jax.ShapeDtypeStruct(shape, dt)

    nq = n_queries
    if nq is None:
        nq, = _jexport.symbolic_shape("b")
    state = SpGpState(pseudo=S((n_pseudo, dim)),
                      L_km=S((n_pseudo, n_pseudo)),
                      L_inv=S((n_pseudo, n_pseudo)),
                      qm=S((n_pseudo, n_pseudo)), alpha=S((n_pseudo, 1)),
                      qm_c=S((n_pseudo, n_pseudo)),
                      alpha_c=S((n_pseudo, 1)))
    args = (state, S((n_pseudo, n_pseudo)), S((n_pseudo, 1)),
            S((nq, dim)), S(()))
    return export_fn(lambda *xs: fn(*xs), *args, platforms=platforms)
