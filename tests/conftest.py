"""Test configuration: force CPU with 8 virtual devices.

Sharding/collective logic is validated on a virtual CPU mesh, the strategy
SURVEY.md section 4 prescribes (the reference's CI has no multi-device
tests to port — .travis.yml runs a single-threaded binary).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (this image's sitecustomize) overrides JAX_PLATFORMS;
# the config update below wins over it.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
