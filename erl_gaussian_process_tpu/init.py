"""Type registration at import time — the equivalent of the reference's
``Init()`` (reference: include/erl_gaussian_process/init.hpp:1-12,
src/init.cpp:13-44, where every ``Setting`` type is registered with the YAML
factory via ``REGISTER(x) x::Register<x>()`` and the sibling packages'
``covariance::Init()`` / ``geometry::Init()`` are chained).

Here the kernel registry is populated by importing
:mod:`erl_gaussian_process_tpu.kernels` and the setting registry by the
``register_setting`` calls below; the package ``__init__`` calls ``init()``
once so, as in the reference, a user never has to.
"""

from __future__ import annotations

_initialized = False


def init() -> None:
    global _initialized
    if _initialized:
        return
    _initialized = True

    # importing kernels populates the kernel registry (stationary.py +
    # reduced_rank.py register at module import)
    import erl_gaussian_process_tpu.kernels  # noqa: F401
    from erl_gaussian_process_tpu.utils.config import register_setting

    from erl_gaussian_process_tpu.kernels.base import KernelSetting
    from erl_gaussian_process_tpu.geometry.frames_3d import (
        DepthFrame3DSetting,
        LidarFrame3DSetting,
    )
    from erl_gaussian_process_tpu.geometry.lidar_frame_2d import (
        LidarFrame2DSetting,
    )
    from erl_gaussian_process_tpu.models.lidar_gp_2d import LidarGP2DSetting
    from erl_gaussian_process_tpu.models.mapping import MappingSetting
    from erl_gaussian_process_tpu.models.noisy_input_gp import (
        NoisyInputGPSetting,
    )
    from erl_gaussian_process_tpu.models.range_sensor_gp_3d import (
        RangeSensorGP3DSetting,
    )
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SpGpSetting,
    )
    from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
        SpGpOccupancyMapSetting,
    )
    from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting

    # reference type-string aliases mirror src/init.cpp:27-36
    register_setting(KernelSetting,
                     "erl::covariance::Covariance<double>::Setting",
                     "erl::covariance::Covariance<float>::Setting",
                     "covariance")
    register_setting(VanillaGPSetting, "VanillaGaussianProcess",
                     "vanilla_gaussian_process")
    register_setting(NoisyInputGPSetting, "NoisyInputGaussianProcess",
                     "noisy_input_gaussian_process")
    register_setting(SpGpSetting, "SparsePseudoInputGaussianProcess",
                     "sparse_pseudo_input_gaussian_process", "sp_gp")
    register_setting(MappingSetting, "Mapping")
    register_setting(LidarGP2DSetting, "LidarGaussianProcess2D",
                     "lidar_gaussian_process_2d")
    register_setting(RangeSensorGP3DSetting, "RangeSensorGaussianProcess3D",
                     "range_sensor_gaussian_process_3d")
    register_setting(SpGpOccupancyMapSetting, "SpGpOccupancyMap")
    register_setting(LidarFrame2DSetting, "LidarFrame2D")
    register_setting(LidarFrame3DSetting, "LidarFrame3D")
    register_setting(DepthFrame3DSetting, "DepthFrame3D")
