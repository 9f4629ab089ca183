"""Multi-chip scaling over a ``jax.sharding.Mesh``.

The reference has no distributed backend (SURVEY.md §2.3) — its parallel
axes are OpenMP threads and one batched-CUDA path. The natural TPU scale-out
(SURVEY.md §5.8) is:

- **GP banks** (lidar partitions, 3D partition grids, batched solves):
  embarrassingly parallel over the bank axis -> shard the leading B axis
  over the mesh; no collectives.
- **SPGP / occupancy-map updates**: shard the N training samples; each chip
  computes its local FITC contribution and the (Q_M, alpha) accumulation is
  a ``psum`` over ICI.
"""

from erl_gaussian_process_tpu.parallel.mesh import (
    make_mesh,
    sharded_bank_fit,
    sharded_spgp_predict,
    sharded_spgp_update,
    sharded_update_many,
)

__all__ = ["make_mesh", "sharded_bank_fit", "sharded_spgp_predict",
           "sharded_spgp_update", "sharded_update_many"]
