"""Reference-compatible API surface tests (names from the reference pybind
module, python/binding/*.cpp; see api.py docstring for citations)."""

import numpy as np

from erl_gaussian_process_tpu import api


def test_all_reference_exports_present():
    # the exact names the reference pybind module registers
    for name in [
        "VanillaGaussianProcessD", "VanillaGaussianProcessF",
        "NoisyInputGaussianProcessD", "NoisyInputGaussianProcessF",
        "MappingD", "MappingF", "MappingType",
        "LidarGaussianProcess2Dd", "LidarGaussianProcess2Df",
        "RangeSensorGaussianProcess3Dd", "RangeSensorGaussianProcess3Df",
    ]:
        assert hasattr(api, name), name
        assert name in api.__all__, name


def test_dtype_variants_pin_dtype():
    d = api.VanillaGaussianProcessD()
    f = api.VanillaGaussianProcessF()
    assert d.dtype == np.float64 and f.dtype == np.float32
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 30))
    y = np.sin(2 * x[0])[:, None]
    for gp, dt in [(d, np.float64), (f, np.float32)]:
        gp.train(x, y, np.full(30, 1e-4))
        res = gp.test(np.linspace(-0.5, 0.5, 7)[None, :])
        assert res.get_mean().dtype == dt
        assert isinstance(gp, api.VanillaGaussianProcess)


def test_mapping_type_enum_names():
    # reference enum entries (bind_mapping.cpp:34-43 / mapping.hpp:11-20)
    for entry in ["IDENTITY", "INVERSE", "INVERSE_SQRT", "EXP", "LOG",
                  "TANH", "SIGMOID"]:
        assert hasattr(api.MappingType, entry), entry
    m = api.MappingD(api.Mapping.Setting(type=api.MappingType.INVERSE_SQRT))
    x = np.asarray([4.0])
    np.testing.assert_allclose(np.asarray(m.map(x)), [0.5])
    np.testing.assert_allclose(np.asarray(m.inv(m.map(x))), x)


def test_unbound_reference_classes_also_exported():
    """SPGP and the occupancy map are NOT in the reference's bindings
    (SURVEY.md §2.1 C10); this rebuild exports them."""
    pseudo = np.linspace(0, 1, 16)[None, :]
    gp = api.SparsePseudoInputGaussianProcessF(None, pseudo)
    assert gp.dtype == np.float32
    assert gp.pseudo_points.shape == (1, 16)
