"""Persistent-compile-cache helper: path resolution + config effect."""

import os

import jax

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import (
    compile_cache,
)


def test_enable_points_jax_at_default_repo_dir():
    path = compile_cache.enable()
    assert path is not None and path.endswith(".jax_cache")
    assert jax.config.jax_compilation_cache_dir == path
    # idempotent
    assert compile_cache.enable() == path


def test_enable_env_override_and_disable(monkeypatch, tmp_path):
    monkeypatch.setenv("APVT_COMPILE_CACHE", str(tmp_path / "cc"))
    assert compile_cache.enable() == str(tmp_path / "cc")
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")

    monkeypatch.setenv("APVT_COMPILE_CACHE", "0")
    before = jax.config.jax_compilation_cache_dir
    assert compile_cache.enable() is None  # disabled: no-op
    assert jax.config.jax_compilation_cache_dir == before

    # restore the conftest default for the rest of the session
    monkeypatch.delenv("APVT_COMPILE_CACHE")
    compile_cache.enable()


def test_cache_dir_gets_entries(tmp_path, monkeypatch):
    monkeypatch.setenv("APVT_COMPILE_CACHE", str(tmp_path / "cc"))
    compile_cache.enable()
    # drop jax's min-compile-time gate so a small program writes an entry
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        for _ in range(8):
            x = jnp.tanh(x @ x) + x
        return x.sum()

    float(f(jnp.ones((128, 128))))
    assert os.path.isdir(str(tmp_path / "cc"))
    assert len(os.listdir(str(tmp_path / "cc"))) >= 1
    monkeypatch.delenv("APVT_COMPILE_CACHE")
    compile_cache.enable()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
