"""erl_gaussian_process_tpu — TPU-native online Gaussian-process regression.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ExistentialRobotics/erl_gaussian_process`` (C++17/Eigen/OpenMP reference):
exact GP regression, noisy-input GPs with gradient observations, incremental
sparse pseudo-input (FITC) GPs, lidar/range-sensor local-GP banks, and online
SPGP occupancy mapping — redesigned for TPU hardware:

- all hot linear algebra (gram assembly, Cholesky, triangular solves) is
  batched, fixed-shape XLA/MXU work; banks of small local GPs run as one
  ``vmap``-ped padded batch instead of OpenMP loops
  (reference: src/lidar_gp_2d.cpp:366, src/batch_gp_update_torch.cpp:72);
- state is pure pytrees; every step function is ``jit``-able and shardable
  over a ``jax.sharding.Mesh``;
- padding follows the identity-diagonal trick (pad gram diagonal with ones,
  alpha rows with zeros) so padded Choleskys stay valid
  (reference: src/batch_gp_update_torch.cpp:60-67).
"""

from erl_gaussian_process_tpu import kernels, models, geometry, utils
from erl_gaussian_process_tpu.init import init

init()  # register setting/kernel types (reference: src/init.cpp Init())

__all__ = ["kernels", "models", "geometry", "utils", "init"]
__version__ = "0.4.0"
