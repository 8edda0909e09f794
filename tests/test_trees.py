import jax.numpy as jnp
import pytest

from apvt_lora.utils import trees


@pytest.fixture
def tree():
    return {"a": {"b": jnp.ones((2,)), "c": jnp.zeros((3,))}, "d": jnp.arange(4)}


def test_flatten_unflatten_roundtrip(tree):
    flat = trees.flatten_with_paths(tree)
    assert set(flat) == {"a/b", "a/c", "d"}
    rebuilt = trees.unflatten_from_paths(flat)
    assert jnp.array_equal(rebuilt["a"]["b"], tree["a"]["b"])


def test_get_set_update_are_functional(tree):
    new = trees.set_path(tree, "a/b", jnp.full((2,), 7.0))
    assert jnp.array_equal(trees.get_path(new, "a/b"), jnp.full((2,), 7.0))
    assert jnp.array_equal(trees.get_path(tree, "a/b"), jnp.ones((2,)))  # original intact

    upd = trees.update_path(tree, "d", lambda x: x + 1)
    assert jnp.array_equal(trees.get_path(upd, "d"), jnp.arange(4) + 1)


def test_match_paths():
    t = {"blocks": {"attn": {"q": {"w": jnp.ones((2, 2))}, "o": {"w": jnp.ones((2, 2))}}}}
    assert trees.match_paths(t, ("q",)) == ["blocks/attn/q"]
    assert trees.match_paths(t, ("q", "o")) == ["blocks/attn/o", "blocks/attn/q"]
