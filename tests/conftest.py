"""Test harness: CPU backend with 8 virtual devices so pjit/mesh code paths
run without TPU hardware (SURVEY.md §4 test-strategy plan)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's site customization registers a remote-TPU ("axon")
# backend and force-sets jax_platforms; override it AFTER the jax import so
# tests run on the local 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    assert jax.device_count() == 8
    return jax.devices()


@pytest.fixture()
def rng():
    return jax.random.key(0)


@pytest.fixture(scope="session")
def np_rng():
    return np.random.default_rng(0)
