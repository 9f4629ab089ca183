"""Sensor-frame geometry (TPU-native equivalent of the external
``erl_geometry`` package's API surface used by the reference; reconstructed
from call sites, SURVEY.md §2.2)."""

from erl_gaussian_process_tpu.geometry.aabb import Aabb
from erl_gaussian_process_tpu.geometry.lidar_frame_2d import (
    LidarFrame2D,
    LidarFrame2DSetting,
)
from erl_gaussian_process_tpu.geometry.frames_3d import (
    DepthFrame3D,
    DepthFrame3DSetting,
    LidarFrame3D,
    LidarFrame3DSetting,
    create_range_sensor_frame_3d,
)
from erl_gaussian_process_tpu.geometry.occupancy_dataset import (
    generate_dataset_fixed,
    generate_dataset_np,
)
from erl_gaussian_process_tpu.geometry.grid_map_info import (
    GridMapInfo,
    GridMapInfo2D,
    GridMapInfo3D,
)
from erl_gaussian_process_tpu.geometry.simulators import Lidar2D, Space2D

__all__ = [
    "Aabb",
    "GridMapInfo",
    "GridMapInfo2D",
    "GridMapInfo3D",
    "LidarFrame2D",
    "LidarFrame2DSetting",
    "LidarFrame3D",
    "LidarFrame3DSetting",
    "DepthFrame3D",
    "DepthFrame3DSetting",
    "create_range_sensor_frame_3d",
    "generate_dataset_fixed",
    "generate_dataset_np",
    "Lidar2D",
    "Space2D",
]
