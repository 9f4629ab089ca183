"""Test configuration: run on a virtual 8-device CPU mesh with float64
enabled so golden-accuracy assertions (ported from the reference's gtest
suite, SURVEY.md §4) are met at double precision.

Note: a pytest plugin imports jax before this conftest runs, so setting
JAX_PLATFORMS in os.environ is too late — the platform must be forced via
jax.config (safe as long as no backend has initialized yet)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
