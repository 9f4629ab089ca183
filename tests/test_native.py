"""Native C++ runtime tests: build, loader parity, token-checkpoint
round-trips (native vs Python fallback byte-compatibility), raycaster parity.
"""

import os

import numpy as np
import pytest

from erl_gaussian_process_tpu.utils import native as nat
from erl_gaussian_process_tpu.utils.loaders import load_lidar_log


def _write_synthetic_log(path, frames, dtype=np.float64):
    with open(path, "wb") as f:
        for angles, ranges, pose in frames:
            f.write(np.int32(len(angles)).tobytes())
            f.write(np.asarray(angles, dtype).tobytes())
            f.write(np.asarray(ranges, dtype).tobytes())
            f.write(np.uint64(len(pose)).tobytes())
            f.write(np.asarray(pose, dtype).tobytes())


def test_native_builds():
    assert nat.native_available(), (
        "native lib should build in this image (g++ present); "
        "set ERL_GP_NO_NATIVE=1 to skip intentionally")
    assert nat.get_lib().egp_version() == 1


def test_lidar_log_native_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    frames = []
    for n in (5, 9, 3):
        ang = np.sort(rng.uniform(-np.pi, np.pi, n))
        rr = rng.uniform(0.1, 10.0, n)
        pose = rng.uniform(-1, 1, 6)  # column-major 2x3 [t | R]
        frames.append((ang, rr, pose))
    p = str(tmp_path / "log.dat")
    _write_synthetic_log(p, frames)

    got = load_lidar_log(p)  # native path (lib available per test above)
    os.environ["ERL_GP_NO_NATIVE"] = "1"
    try:
        nat._lib, nat._tried = None, False
        ref = load_lidar_log(p)
    finally:
        del os.environ["ERL_GP_NO_NATIVE"]
        nat._lib, nat._tried = None, False
    assert len(got) == len(ref) == 3
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a.angles, b.angles)
        np.testing.assert_array_equal(a.ranges, b.ranges)
        np.testing.assert_array_equal(a.position, b.position)
        np.testing.assert_array_equal(a.rotation, b.rotation)


def test_token_checkpoint_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    arrays = {
        "a/b": rng.standard_normal((7, 3)),
        "a/c": rng.standard_normal((4,)).astype(np.float32),
        "flags": np.array([True, False, True]),
        "idx": np.arange(5, dtype=np.int64),
        "scalar": np.asarray(3, np.int32).reshape(()),
    }
    p = str(tmp_path / "ck.egpt")
    nat.save_tokens(p, arrays)
    back = nat.load_tokens(p)
    assert set(back) == set(arrays)
    for k in arrays:
        assert back[k].dtype == np.asarray(arrays[k]).dtype, k
        np.testing.assert_array_equal(back[k], arrays[k])


def test_token_format_native_and_python_byte_identical(tmp_path):
    """The Python fallback writer/reader must produce/read the exact same
    bytes as the native one."""
    arrays = {"x": np.arange(12, dtype=np.float64).reshape(3, 4),
              "m": np.array([1, 0, 1], np.uint8)}
    p_nat = str(tmp_path / "nat.egpt")
    p_py = str(tmp_path / "py.egpt")
    nat.save_tokens(p_nat, arrays)
    os.environ["ERL_GP_NO_NATIVE"] = "1"
    try:
        nat._lib, nat._tried = None, False
        nat.save_tokens(p_py, arrays)
        back_py = nat.load_tokens(p_nat)   # python reader, native bytes
    finally:
        del os.environ["ERL_GP_NO_NATIVE"]
        nat._lib, nat._tried = None, False
    with open(p_nat, "rb") as f1, open(p_py, "rb") as f2:
        assert f1.read() == f2.read()
    back_nat = nat.load_tokens(p_py)       # native reader, python bytes
    for k in arrays:
        np.testing.assert_array_equal(back_py[k], arrays[k])
        np.testing.assert_array_equal(back_nat[k], arrays[k])


def test_model_checkpoint_egpt(tmp_path):
    """Full model save/load through the token stream (the reference's
    Serialization<T>::Write/Read + operator== pattern)."""
    from erl_gaussian_process_tpu.models.vanilla_gp import (
        VanillaGaussianProcess,
    )

    rng = np.random.default_rng(2)
    gp = VanillaGaussianProcess()
    x = rng.uniform(-1, 1, (1, 50))
    y = np.sin(3 * x[0])[:, None]
    gp.train(x, y, np.full(50, 1e-4))
    p = str(tmp_path / "gp.egpt")
    gp.save(p)
    gp2 = VanillaGaussianProcess()
    gp2.load(p)
    assert gp == gp2


def test_raycast_native_matches_numpy():
    from erl_gaussian_process_tpu.geometry.simulators import (
        reference_space_2d,
    )

    space = reference_space_2d()
    rng = np.random.default_rng(3)
    ang = rng.uniform(-np.pi, np.pi, 257)
    dirs = np.stack([np.cos(ang), np.sin(ang)], -1)
    origin = np.array([0.9, -0.4])

    r_native = space.cast_rays(origin, dirs)  # native (lib available)
    os.environ["ERL_GP_NO_NATIVE"] = "1"
    try:
        nat._lib, nat._tried = None, False
        r_np = space.cast_rays(origin, dirs)
    finally:
        del os.environ["ERL_GP_NO_NATIVE"]
        nat._lib, nat._tried = None, False
    finite = np.isfinite(r_np)
    assert (finite == np.isfinite(r_native)).all()
    np.testing.assert_allclose(r_native[finite], r_np[finite], rtol=1e-12)


def test_raycast_mesh_native_matches_numpy():
    """3D Moller-Trumbore parity: native OpenMP vs chunked numpy, plus a
    ground-truth sanity check on an analytic box (ray hitting a wall at a
    known distance)."""
    from erl_gaussian_process_tpu.geometry.simulators import (
        reference_room_mesh_3d,
        TriangleMesh,
    )

    mesh = reference_room_mesh_3d()
    rng = np.random.default_rng(5)
    d = rng.normal(size=(409, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    origin = mesh.center() + np.array([0.2, -0.1, 0.05])

    r_native = mesh.cast_rays(origin, d)
    os.environ["ERL_GP_NO_NATIVE"] = "1"
    try:
        nat._lib, nat._tried = None, False
        r_np = mesh.cast_rays(origin, d)
    finally:
        del os.environ["ERL_GP_NO_NATIVE"]
        nat._lib, nat._tried = None, False
    assert np.isfinite(r_native).all()  # closed room: every ray hits
    np.testing.assert_allclose(r_native, r_np, rtol=1e-12)

    # analytic check: +x ray from the origin of a unit box hits x = 1
    box = TriangleMesh.box([-1, -1, -1], [1, 1, 1])
    r = box.cast_rays(np.zeros(3), np.array([[1.0, 0, 0], [0, -1.0, 0]]))
    np.testing.assert_allclose(r, [1.0, 1.0], atol=1e-12)


def test_reference_float_and_double_logs_agree():
    """Parse the vendored real scan logs in both dtypes (data/double +
    data/float, vendored from the reference's data assets); frames must
    agree to float32 precision."""
    import os

    repo = os.path.join(os.path.dirname(__file__), os.pardir)
    dpath = os.path.join(repo, "data", "double", "train.dat")
    fpath = os.path.join(repo, "data", "float", "train.dat")
    fd = load_lidar_log(dpath, dtype=np.float64)
    ff = load_lidar_log(fpath, dtype=np.float32)
    assert len(fd) == len(ff) > 0
    for a, b in zip(fd, ff):
        assert a.angles.shape == b.angles.shape
        np.testing.assert_allclose(a.angles, b.angles, rtol=2e-7, atol=1e-6)
        finite = np.isfinite(a.ranges) & np.isfinite(b.ranges)
        np.testing.assert_allclose(a.ranges[finite], b.ranges[finite],
                                   rtol=2e-7, atol=1e-5)
        np.testing.assert_allclose(a.position, b.position, atol=1e-6)
