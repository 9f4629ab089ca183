# Type stub for the reference-compatible API surface (the analogue of the
# reference's python/erl_gaussian_process/pyerl_gaussian_process.pyi).
from typing import Optional, Tuple

import numpy as np

from erl_gaussian_process_tpu.models.lidar_gp_2d import (
    LidarGaussianProcess2D as LidarGaussianProcess2D,
    LidarGP2DSetting,
    LidarGP2DTestResult,
)
from erl_gaussian_process_tpu.models.mapping import (
    Mapping as Mapping,
    MappingType as MappingType,
)
from erl_gaussian_process_tpu.models.noisy_input_gp import (
    NoisyInputGaussianProcess as NoisyInputGaussianProcess,
)
from erl_gaussian_process_tpu.models.range_sensor_gp_3d import (
    RangeSensorGaussianProcess3D as RangeSensorGaussianProcess3D,
)
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
    SparsePseudoInputGaussianProcess as SparsePseudoInputGaussianProcess,
)
from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
    SpGpOccupancyMap as SpGpOccupancyMap,
)
from erl_gaussian_process_tpu.models.vanilla_gp import (
    VanillaGaussianProcess as VanillaGaussianProcess,
    VanillaGPSetting,
    VanillaTestResult,
)

class VanillaGaussianProcessD(VanillaGaussianProcess):
    def __init__(self, setting: Optional[VanillaGPSetting] = ...) -> None: ...

class VanillaGaussianProcessF(VanillaGaussianProcess):
    def __init__(self, setting: Optional[VanillaGPSetting] = ...) -> None: ...

class NoisyInputGaussianProcessD(NoisyInputGaussianProcess): ...
class NoisyInputGaussianProcessF(NoisyInputGaussianProcess): ...
class SparsePseudoInputGaussianProcessD(SparsePseudoInputGaussianProcess): ...
class SparsePseudoInputGaussianProcessF(SparsePseudoInputGaussianProcess): ...
class LidarGaussianProcess2Dd(LidarGaussianProcess2D): ...
class LidarGaussianProcess2Df(LidarGaussianProcess2D): ...
class RangeSensorGaussianProcess3Dd(RangeSensorGaussianProcess3D): ...
class RangeSensorGaussianProcess3Df(RangeSensorGaussianProcess3D): ...
class SpGpOccupancyMapD(SpGpOccupancyMap): ...
class SpGpOccupancyMapF(SpGpOccupancyMap): ...

MappingD = Mapping
MappingF = Mapping

__all__: list[str]
