"""Persistent-compile-cache helper: gating, path resolution, real entries.

The cache MUST stay off on a forced multi-device host topology: deserialized
sharded executables abort the CPU backend there (deterministic repro: a
cold-cache ``tests/test_mesh.py`` run passes and writes entries, the warm
rerun SIGABRTs executing the first sharded train step). The suite itself
runs under that topology, so the positive paths are tested on env copies /
in a single-device subprocess.
"""

import os
import subprocess
import sys

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import (
    compile_cache,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_disabled_on_forced_multi_device_topology():
    # conftest sets --xla_force_host_platform_device_count: must be a no-op
    assert "xla_force_host_platform_device_count" in os.environ["XLA_FLAGS"]
    assert compile_cache.enable() is None


def test_env_kill_switch(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "")  # clear the topology gate
    monkeypatch.setenv("APVT_COMPILE_CACHE", "0")
    assert compile_cache.enable() is None


def test_default_path_and_override(monkeypatch, tmp_path):
    """Path resolution only — exercised in a subprocess below; here we pin
    the pure logic by stubbing the jax config write."""
    calls = []

    class _Cfg:
        @staticmethod
        def update(k, v):
            calls.append((k, v))

    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.delenv("APVT_COMPILE_CACHE", raising=False)
    monkeypatch.setattr("jax.config", _Cfg())
    path = compile_cache.enable()
    assert path == os.path.join(REPO, ".jax_cache")
    monkeypatch.setenv("APVT_COMPILE_CACHE", str(tmp_path / "cc"))
    assert compile_cache.enable() == str(tmp_path / "cc")
    assert calls == [("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")),
                     ("jax_compilation_cache_dir", str(tmp_path / "cc"))]


def test_entries_written_single_device_subprocess(tmp_path):
    """On a single-device CPU backend (the supported host configuration)
    enable() takes effect and compilations land on disk."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""  # single-device host topology
    env["JAX_PLATFORMS"] = "cpu"
    env["APVT_COMPILE_CACHE"] = str(tmp_path / "cc")
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import compile_cache\n"
        "assert compile_cache.enable() is not None\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "import jax.numpy as jnp\n"
        "@jax.jit\n"
        "def f(x):\n"
        "    for _ in range(8):\n"
        "        x = jnp.tanh(x @ x) + x\n"
        "    return x.sum()\n"
        "print(float(f(jnp.ones((128, 128)))))\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=REPO, timeout=300)
    assert len(os.listdir(str(tmp_path / "cc"))) >= 1
