"""Test configuration: run on a virtual 8-device CPU mesh with float64
enabled so golden-accuracy assertions (ported from the reference's gtest
suite, SURVEY.md §4) are met at double precision.

Note: a pytest plugin imports jax before this conftest runs, so setting
JAX_PLATFORMS in os.environ is too late — the platform must be forced via
jax.config (safe as long as no backend has initialized yet)."""

import os

# ERL_GP_TEST_TPU=1 runs the suite against the real attached chip instead
# of the virtual CPU mesh (needed for the TPU-only Pallas kernel tests,
# which Mosaic compiles only for real hardware).
_USE_TPU = os.environ.get("ERL_GP_TEST_TPU", "") == "1"

if _USE_TPU:
    # compiles go through the remote-TPU tunnel (30-90 s each); reuse the
    # same persistent executable cache bench.py uses
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

if not _USE_TPU:
    assert jax.devices()[0].platform == "cpu", jax.devices()

# Shared marker for Pallas interpret-mode parity tests. On the real
# (remote) chip they are strictly redundant with the *_tpu compiled-path
# parity tests AND pathologically slow: interpret mode emulates each
# DMA/op as its own dispatch, and every dispatch rides the ~30 ms tunnel
# round trip (observed: one small gram interpret case > 5 min on-chip vs
# 2 s on CPU).
interpret_test = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret emulation through the remote tunnel; the *_tpu "
           "parity tests cover these kernels on silicon")


@pytest.fixture
def artifact():
    """Env-gated visual artifact dump, restoring the reference tests'
    plot-the-result observability (they write plplot/OpenCV/Open3D figures
    into GTEST_PREPARE_OUTPUT_DIR; SURVEY.md §4 asked for headless
    matplotlib equivalents). Set ERL_GP_TEST_ARTIFACTS=<dir> to enable —
    disabled (no-op, zero cost) in normal CI runs.

        def test_x(artifact):
            ...
            artifact("name", lambda ax: ax.imshow(img))
    """
    import os as _os

    out = _os.environ.get("ERL_GP_TEST_ARTIFACTS")

    def save(name, draw):
        if not out:
            return None
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        _os.makedirs(out, exist_ok=True)
        fig, ax = plt.subplots(figsize=(6.4, 5.2), dpi=110)
        draw(ax)
        path = _os.path.join(out, name + ".png")
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        return path

    return save
