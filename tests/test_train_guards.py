"""Train-guard, degenerate-input, and checkpoint-train-set parity tests.

Reference behaviors pinned here:
- Train() returns false + warns on empty data
  (/root/reference/src/vanilla_gp.cpp:481-484) and on an already-trained
  model (:511-514) — the no-arg ``train()`` layer.
- The binding-layer ``train(x, y, var)`` resets first, so consecutive
  calls succeed (bind_vanilla_gp.cpp:80-97).
- Write/Read round-trips the FULL TrainSet so a loaded model can be
  retrained (src/vanilla_gp.cpp:606-790; noisy_input_gp.cpp:952-1147).
- Untrainable scans return False, never raise.
- Config honesty: unimplementable kernel knobs are rejected loudly.
"""

import logging

import numpy as np
import pytest

from erl_gaussian_process_tpu.kernels import KernelSetting
from erl_gaussian_process_tpu.models import (
    NoisyInputGaussianProcess,
    VanillaGaussianProcess,
)
from erl_gaussian_process_tpu.geometry.lidar_frame_2d import (
    LidarFrame2D,
    LidarFrame2DSetting,
)

NOISE = 1e-3


def _sine_data(n=40):
    x = np.linspace(0, 2 * np.pi, n)
    return x[None, :], np.sin(x), np.full(n, NOISE)


def test_vanilla_empty_data_returns_false(caplog):
    gp = VanillaGaussianProcess()
    with caplog.at_level(logging.WARNING, "erl_gaussian_process_tpu"):
        ok = gp.train(np.zeros((1, 0)), np.zeros((0, 1)), np.zeros(0))
    assert ok is False
    assert not gp.is_trained
    assert any("num_samples" in r.message for r in caplog.records)


def test_vanilla_noarg_train_requires_train_set(caplog):
    gp = VanillaGaussianProcess()
    with caplog.at_level(logging.WARNING, "erl_gaussian_process_tpu"):
        assert gp.train() is False
    assert any("num_samples" in r.message for r in caplog.records)


def test_vanilla_already_trained_guard(caplog):
    gp = VanillaGaussianProcess()
    x, y, v = _sine_data()
    assert gp.train(x, y, v) is True
    # no-arg train on a trained model: C++ Train() guard
    with caplog.at_level(logging.WARNING, "erl_gaussian_process_tpu"):
        assert gp.train() is False
    assert any("reset the model" in r.message for r in caplog.records)
    # binding-layer train (with data) resets first and succeeds
    assert gp.train(x, y, v) is True
    # reset re-arms the no-arg path (train set survives reset)
    gp.reset(gp.setting.max_num_samples, 1, 1)
    assert not gp.is_trained
    assert gp.train() is True
    assert gp.is_trained


def test_vanilla_checkpoint_carries_train_set_and_retrains(tmp_path):
    gp = VanillaGaussianProcess()
    x, y, v = _sine_data()
    assert gp.train(x, y, v)
    path = str(tmp_path / "gp.npz")
    gp.save(path)

    gp2 = VanillaGaussianProcess()
    gp2.load(path)
    ts = gp2.get_train_set()
    assert ts is not None
    np.testing.assert_array_equal(ts.x, x)
    np.testing.assert_array_equal(ts.y, y[:, None])
    np.testing.assert_array_equal(ts.var, v)

    # retrain from the loaded train set: bitwise-identical posterior state
    gp2.reset(gp2.setting.max_num_samples, 1, 1)
    assert gp2.train() is True
    np.testing.assert_array_equal(np.asarray(gp2.state.L),
                                  np.asarray(gp.state.L))
    np.testing.assert_array_equal(np.asarray(gp2.state.alpha),
                                  np.asarray(gp.state.alpha))


def test_nigp_guards_and_checkpoint_retrain(tmp_path, caplog):
    gp = NoisyInputGaussianProcess()
    with caplog.at_level(logging.WARNING, "erl_gaussian_process_tpu"):
        assert gp.train(np.zeros((1, 0)), np.zeros((0, 1))) is False
        assert gp.train() is False

    n = 30
    x = np.linspace(0, 2 * np.pi, n)
    y = np.sin(x)
    g = np.cos(x)[None, :]
    assert gp.train(x[None, :], y, g, var_x=1e-4, var_y=1e-4, var_grad=1e-4)
    with caplog.at_level(logging.WARNING, "erl_gaussian_process_tpu"):
        assert gp.train() is False  # already-trained guard

    path = str(tmp_path / "nigp.npz")
    gp.save(path)
    gp2 = NoisyInputGaussianProcess()
    gp2.load(path)
    ts = gp2.get_train_set()
    assert ts is not None and ts.num_samples == n
    np.testing.assert_array_equal(ts.x, x[None, :])
    np.testing.assert_array_equal(ts.grad, g)
    assert ts.grad_flag.all()

    gp2.reset(gp2.setting.max_num_samples, 1, 1)
    assert gp2.train() is True
    np.testing.assert_array_equal(np.asarray(gp2.state.L),
                                  np.asarray(gp.state.L))
    np.testing.assert_array_equal(np.asarray(gp2.state.alpha),
                                  np.asarray(gp.state.alpha))


def test_lidar_frame_rejects_wrong_ray_count(caplog):
    f = LidarFrame2D(LidarFrame2DSetting(num_rays=16))
    with caplog.at_level(logging.WARNING, "erl_gaussian_process_tpu"):
        ok = f.update_ranges(np.eye(2), np.zeros(2), np.ones(9))
    assert ok is False
    assert not f.is_valid()
    assert any("scan rejected" in r.message for r in caplog.records)
    assert f.update_ranges(np.eye(2), np.zeros(2), np.ones(16)) is True
    assert f.is_valid()


def test_lidar_gp_empty_partitions_returns_false(caplog):
    from erl_gaussian_process_tpu.models.lidar_gp_2d import (
        LidarGaussianProcess2D,
        LidarGP2DSetting,
    )
    # 4 rays <= overlap_size 6: no partitions can be formed
    s = LidarGP2DSetting(
        sensor_frame=LidarFrame2DSetting(num_rays=4, angle_min=-1.0,
                                         angle_max=1.0))
    gp = LidarGaussianProcess2D(s)
    assert gp.partitions == []
    with caplog.at_level(logging.WARNING, "erl_gaussian_process_tpu"):
        ok = gp.train(np.eye(2), np.zeros(2), np.ones(4))
    assert ok is False
    assert not gp.is_trained
    assert any("no partitions" in r.message for r in caplog.records)


def test_use_sparse_logs_and_arms_threshold(caplog):
    # use_sparse is now implemented (thresholded math as masked dense,
    # tests/test_sparse_pseudo_input_gp.py): the ctor logs INFO (not a
    # warning) and arms the threshold used by every update/predict path
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        SparsePseudoInputGaussianProcess,
        SpGpSetting,
    )
    s = SpGpSetting(kernel_type="rbf",
                    kernel=KernelSetting(x_dim=1, scale=0.5),
                    use_sparse=True, sparse_zero_threshold=1e-5)
    with caplog.at_level(logging.INFO, "erl_gaussian_process_tpu"):
        gp = SparsePseudoInputGaussianProcess(
            s, np.linspace(-1, 1, 8)[None, :])
    assert any("use_sparse" in r.message for r in caplog.records)
    assert gp._zero_threshold == 1e-5


def test_scale_mixture_settings_resolve_or_reject():
    # half-specified: scale_mix with no weights names zero components ->
    # loud error (intent unknowable), not a silently different kernel
    with pytest.raises(ValueError, match="no mixture components"):
        VanillaGaussianProcess(VanillaGaussianProcess.Setting(
            kernel=KernelSetting(scale_mix=2.0)))
    # fully-specified mixtures are implemented (tests/test_scale_mixture.py)
    gp = NoisyInputGaussianProcess(NoisyInputGaussianProcess.Setting(
        kernel=KernelSetting(x_dim=1, scale=0.3, weights=[0.5, 0.5]),
        max_num_samples=8))
    assert gp._kernel.startswith("mix(")
