"""YAML config system tests (reference pattern: FromYamlFile/AsYamlFile
round-trip + registered type-string creation,
test/gtest/test_spgp_occupancy_map_2d.cpp:263-267, src/init.cpp:27-36)."""

import os

import numpy as np

from erl_gaussian_process_tpu.models.spgp_occupancy_map import (
    SpGpOccupancyMapSetting,
)
from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting
from erl_gaussian_process_tpu.utils import (
    as_yaml_file,
    create_setting,
    from_yaml_file,
    from_yaml_str,
    setting_names,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_production_yaml_loads_reference_format():
    """config/spgp_occupancy_map_2d.yaml uses the reference's exact schema
    (C++ kernel type tags included) and must load to the production values."""
    s = from_yaml_file(SpGpOccupancyMapSetting,
                       os.path.join(REPO, "config/spgp_occupancy_map_2d.yaml"))
    assert s.sp_gp.kernel.x_dim == 2
    assert np.isclose(s.sp_gp.kernel.scale, 0.18)
    assert s.sp_gp.max_num_samples == 2000
    assert s.free_points_per_meter == 3
    assert s.logodd_occupied == 1 and s.logodd_free == -1
    assert np.isclose(s.logodd_variance, 1e-4)
    # the C++ type tag must resolve to the matern32 family
    from erl_gaussian_process_tpu.kernels import resolve_kernel_name
    assert resolve_kernel_name(s.sp_gp.kernel_type) == "matern32"
    # and the float variant is identical (reference: both files equal)
    s2 = from_yaml_file(
        SpGpOccupancyMapSetting,
        os.path.join(REPO, "config/spgp_occupancy_map_2d_float.yaml"))
    assert s2.to_dict() == s.to_dict()


def test_yaml_round_trip(tmp_path):
    s = SpGpOccupancyMapSetting()
    s.sp_gp.kernel.scale = 0.25
    s.logodd_occupied = 2.5
    p = str(tmp_path / "cfg.yaml")
    as_yaml_file(s, p)
    s2 = from_yaml_file(SpGpOccupancyMapSetting, p)
    assert s2.to_dict() == s.to_dict()


def test_registry_creates_by_reference_type_string():
    for ts in [
        "erl::gaussian_process::VanillaGaussianProcess<double>::Setting",
        "VanillaGaussianProcess",
        "vanilla_gp_setting",
    ]:
        s = create_setting(ts)
        assert isinstance(s, VanillaGPSetting), ts
    s = create_setting("sp_gp", {"max_num_samples": 77})
    assert s.max_num_samples == 77
    assert "vanilla_gp_setting" in setting_names()


def test_from_yaml_str_nested_kernel():
    s = from_yaml_str(VanillaGPSetting, """
kernel_type: erl::covariance::OrnsteinUhlenbeck1d
kernel:
  x_dim: 1
  scale: 0.5
max_num_samples: 64
""")
    assert s.max_num_samples == 64
    assert np.isclose(s.kernel.scale, 0.5)
    from erl_gaussian_process_tpu.kernels import resolve_kernel_name
    assert resolve_kernel_name(s.kernel_type) == "ou"
