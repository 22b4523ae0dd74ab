"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests emulate an
8-chip mesh with XLA's host-platform device-count override (SURVEY.md §4).
Must be set before jax initializes its backends, hence the env mutation at
import time.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize pins jax_platforms to "axon,cpu" (the real
# TPU tunnel), ignoring JAX_PLATFORMS; tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return devices[:8]
