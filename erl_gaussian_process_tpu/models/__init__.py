"""GP model families (L3/L4 of the reference, SURVEY.md §1).

Functional cores (``*_fit`` / ``*_predict`` pure functions over pytrees) are
the TPU compute path; the thin classes mirror the reference's Python binding
API (``train`` / ``test`` → TestResult, reference:
python/binding/bind_vanilla_gp.cpp).
"""

from erl_gaussian_process_tpu.models.vanilla_gp import (
    VanillaGaussianProcess,
    VanillaGPState,
    vanilla_fit,
)
from erl_gaussian_process_tpu.models.noisy_input_gp import (
    NoisyInputGaussianProcess,
    NoisyInputGPState,
    nigp_fit,
)
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
    SparsePseudoInputGaussianProcess,
    SpGpState,
    spgp_init,
    spgp_update,
)
from erl_gaussian_process_tpu.models.mapping import Mapping, MappingType
from erl_gaussian_process_tpu.models.batch_gp import BatchGPBank, bank_fit
from erl_gaussian_process_tpu.models.lidar_gp_2d import LidarGaussianProcess2D
from erl_gaussian_process_tpu.models.range_sensor_gp_3d import (
    RangeSensorGaussianProcess3D,
)
from erl_gaussian_process_tpu.models.spgp_occupancy_map import SpGpOccupancyMap

__all__ = [
    "VanillaGaussianProcess",
    "VanillaGPState",
    "vanilla_fit",
    "NoisyInputGaussianProcess",
    "NoisyInputGPState",
    "nigp_fit",
    "SparsePseudoInputGaussianProcess",
    "SpGpState",
    "spgp_init",
    "spgp_update",
    "Mapping",
    "MappingType",
    "BatchGPBank",
    "bank_fit",
    "LidarGaussianProcess2D",
    "RangeSensorGaussianProcess3D",
    "SpGpOccupancyMap",
]
