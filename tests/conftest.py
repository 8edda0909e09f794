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

# Persistent compile cache (gitignored <repo>/.jax_cache): the suite is
# compile-dominated on this one-core host; entries survive across runs and
# rounds. APVT_COMPILE_CACHE=0 disables.
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

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
