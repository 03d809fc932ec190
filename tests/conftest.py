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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
