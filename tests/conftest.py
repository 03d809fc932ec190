"""Test harness: force the CPU platform with a virtual 8-device mesh.

The session's sitecustomize imports jax at interpreter start and registers the
real TPU backend, so plain env vars are too late — the platform must be forced
via jax.config before the first backend initialization. Multi-chip sharding
logic is thereby testable on any host: the same jax.sharding.Mesh code paths
compile and execute against 8 virtual CPU devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# single-core XLA compiles are slow here; persist them across test runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()} — platform forcing "
    "failed; check sitecustomize interaction")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
