"""Occupancy training-set generation: hit points + free-space samples along
rays (equivalent of ``geometry::OccupancyMap<Dtype,Dim>::GenerateDataset``;
call signature at reference src/spgp_occupancy_map.cpp:63-77).

Two implementations:
- ``generate_dataset_np``: host/numpy, variable-size output (mirrors the
  reference's std::mt19937-driven sampler semantics);
- ``generate_dataset_fixed``: pure-JAX, fixed shapes + validity mask, keyed
  by a PRNG key — this is the one fused into the jitted online-mapping step
  (free samples get a fixed per-ray quota; actives are gated by the
  free-points-per-meter density, so the realized density matches).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def generate_dataset_np(
    rng: np.random.Generator,
    sensor_position: np.ndarray,      # (d,)
    points: np.ndarray,               # (n, d) world hit points
    aabb_min: np.ndarray,
    aabb_max: np.ndarray,
    min_distance: float,
    max_distance: float,
    free_sampling_margin: float,
    free_points_per_meter: float,
    max_dataset_size: int,
):
    """Returns (dataset_points (m, d), labels (m,) ∈ {0, 1}, hit_indices).

    Labels: 1 = occupied (the hit point), 0 = free (sampled along the ray).
    Rays shorter than min_distance or invalid are skipped; rays longer than
    max_distance contribute free samples up to max_distance but no hit.
    """
    p = np.asarray(points, float)
    sp = np.asarray(sensor_position, float)
    delta = p - sp
    dist = np.linalg.norm(delta, axis=-1)
    finite = np.isfinite(dist) & (dist > 0)
    in_box = np.all((p >= aabb_min) & (p <= aabb_max), axis=-1)

    occupied = finite & in_box & (dist >= min_distance) & (dist <= max_distance)
    hit_indices = np.flatnonzero(occupied)

    out_pts = [p[occupied]]
    out_lbl = [np.ones(occupied.sum())]

    free_ray = finite & (dist >= min_distance)
    free_len = np.minimum(dist, max_distance)
    for i in np.flatnonzero(free_ray):
        d_i = free_len[i]
        n_free = int(free_points_per_meter * d_i)
        if n_free <= 0:
            continue
        u = rng.uniform(free_sampling_margin, 1.0 - free_sampling_margin,
                        size=n_free)
        pts = sp + u[:, None] * (delta[i] / dist[i]) * d_i
        keep = np.all((pts >= aabb_min) & (pts <= aabb_max), axis=-1)
        out_pts.append(pts[keep])
        out_lbl.append(np.zeros(keep.sum()))

    pts = np.concatenate(out_pts, axis=0)
    lbl = np.concatenate(out_lbl, axis=0)
    if max_dataset_size > 0 and pts.shape[0] > max_dataset_size:
        sel = rng.choice(pts.shape[0], size=max_dataset_size, replace=False)
        pts, lbl = pts[sel], lbl[sel]
    return pts, lbl, hit_indices


@partial(jax.jit, static_argnames=("free_slots_per_ray",))
def generate_dataset_fixed(
    key,
    sensor_position,                  # (d,)
    points,                           # (n, d) world end points
    point_mask,                       # (n,) bool valid-measurement mask
    aabb_min,
    aabb_max,
    min_distance,
    max_distance,
    free_sampling_margin,
    free_points_per_meter,
    *,
    free_slots_per_ray: int,
):
    """Fixed-shape sampler: returns (dataset_points (n*(1+F), d),
    labels (n*(1+F),), mask (n*(1+F),) bool) with F = free_slots_per_ray.

    Slot layout: first n hit slots, then n*F free slots. Free slot j of ray i
    is active iff j < free_points_per_meter * effective_ray_length_i, so the
    expected sample density matches the reference sampler.
    """
    p = jnp.asarray(points)
    sp = jnp.asarray(sensor_position)
    n, d = p.shape
    # per-dim 2D arrays throughout: 3D (n, F, d) broadcasts with reduces over
    # the minor d-axis cost ~2x the whole sampler in layout ops on TPU
    # (measured: the in-box check alone was 0.12 ms of a 0.25 ms step)
    delta = [p[:, k] - sp[k] for k in range(d)]
    dist = jnp.sqrt(sum(dk * dk for dk in delta))
    inv_safe = jnp.where(dist > 0, 1.0 / jnp.where(dist > 0, dist, 1.0), 0.0)
    finite = point_mask & jnp.isfinite(dist) & (dist > 0)
    in_box = finite
    for k in range(d):
        in_box = in_box & (p[:, k] >= aabb_min[k]) & (p[:, k] <= aabb_max[k])

    hit_ok = in_box & (dist >= min_distance) & (dist <= max_distance)
    free_len = jnp.minimum(dist, max_distance)
    free_ray = finite & (dist >= min_distance)

    F = free_slots_per_ray
    u = jax.random.uniform(
        key, (n, F),
        minval=free_sampling_margin, maxval=1.0 - free_sampling_margin,
        dtype=p.dtype)
    t = u * (free_len * inv_safe)[:, None]                 # (n, F) ray params
    free_k = [sp[k] + t * delta[k][:, None] for k in range(d)]
    slot_idx = jnp.arange(F, dtype=p.dtype)[None, :]
    n_free = free_points_per_meter * free_len
    free_ok = free_ray[:, None] & (slot_idx < n_free[:, None])
    for k in range(d):
        free_ok = free_ok & (free_k[k] >= aabb_min[k]) \
            & (free_k[k] <= aabb_max[k])

    free_pts = jnp.stack([fk.reshape(n * F) for fk in free_k], axis=-1)
    pts = jnp.concatenate([p, free_pts], axis=0)
    lbl = jnp.concatenate(
        [jnp.ones(n, p.dtype), jnp.zeros(n * F, p.dtype)], axis=0)
    mask = jnp.concatenate([hit_ok, free_ok.reshape(n * F)], axis=0)
    pts = jnp.where(mask[:, None], pts, 0.0)
    return pts, lbl, mask


def compact_slots(pts, lbl, mask, budget: int):
    """Gather the active slots into a fixed ``budget``-size prefix,
    preserving slot order (hits first, then free samples — the reference's
    dataset layout). Callers must have capped ``mask`` to <= budget actives
    (the max_samples cap in update_step does).

    The sampler's slot grid is rays * (1 + free_slots_per_ray) wide but the
    map caps actives at max_num_samples — the FITC gram/GEMMs downstream
    cost O(M^2 n) in the SLOT count, so running them over the compacted
    budget instead of the full grid is a pure win (measured 2.1x on the
    hotel-0 update's FITC phase: benchmarks/profile_map_update.py).
    Inactive tail slots stay masked; gathered coordinates of inactive slots
    are whatever top_k picked, masked out downstream exactly like the
    uncompacted layout's inactive slots."""
    n = pts.shape[0]
    # active slots get descending positive scores in slot order; inactive 0.
    # top_k then yields the actives' indices in ascending slot order.
    score = jnp.where(mask, jnp.int32(n) - jnp.arange(n, dtype=jnp.int32),
                      jnp.int32(0))
    _, idx = jax.lax.top_k(score, budget)
    return pts[idx], lbl[idx], mask[idx]
