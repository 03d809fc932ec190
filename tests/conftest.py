"""Test harness: force CPU JAX with a virtual 8-device mesh.

Must run before the first `import jax` anywhere in the test session, so the
flags live here at conftest import time. Multi-chip sharding logic is thereby
testable on any host: the same `jax.sharding.Mesh` code paths compile and
execute against 8 virtual CPU devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

# force CPU even when the session env pins JAX_PLATFORMS=axon (real TPU):
# unit tests must be hermetic and fast, and the 8-device virtual mesh below
# only exists on the host platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# single-core XLA CPU compiles are slow here; persist them across test runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

# this environment's CPU backend emulates TPU matmul numerics (bf16-precision
# dots by default — measured ~7e-2 abs error on a fp32 64x64 matmul). Oracle
# tests need real fp32: force full precision for ops that don't pin their own.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
