"""Checksum-verified device->host transfer (utils/transfer).

Motivated by an observed remote-TPU backend flaw: device_get intermittently
returned wrong bytes for one leaf of a fetched checkpoint tree (round 2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import transfer


def test_verified_get_roundtrip_mixed_tree():
    tree = {
        "f32": jnp.arange(12.0).reshape(3, 4),
        "bf16": jnp.ones((5, 7), jnp.bfloat16) * 1.5,
        "i32": jnp.arange(6, dtype=jnp.int32),
        "u8": jnp.arange(4, dtype=jnp.uint8),
        "bool": jnp.array([True, False, True]),
        "host": np.zeros(3),  # passes through untouched
        "scalar": jnp.float32(2.5),
    }
    out = transfer.verified_get(tree)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(tree[k]))
    assert isinstance(out["f32"], np.ndarray)


def test_host_and_device_checksums_agree():
    rng = jax.random.key(0)
    for shape, dtype in [((768, 5), jnp.float32), ((3, 17), jnp.bfloat16),
                         ((64,), jnp.int32)]:
        x = (jax.random.normal(rng, shape).astype(dtype)
             if jnp.issubdtype(dtype, jnp.floating)
             else jnp.arange(np.prod(shape), dtype=dtype).reshape(shape))
        dev = int(jax.device_get(transfer._device_checksums([x])[0]))
        host = transfer._host_checksum_leaf(np.asarray(jax.device_get(x)))
        assert dev == host, (shape, dtype)


def test_checksum_detects_permutation():
    """The observed axon corruption preserves values but scrambles element
    order — the position-weighted checksum must catch that (a plain sum
    cannot)."""
    a = np.arange(1, 3841, dtype=np.float32).reshape(768, 5)
    perm = a.reshape(-1)[::-1].reshape(768, 5).copy()
    assert transfer._host_checksum_leaf(a) != transfer._host_checksum_leaf(perm)
    # tile-order scramble (swap 128-element blocks), values preserved
    b = a.reshape(-1).copy()
    b[:128], b[128:256] = a.reshape(-1)[128:256], a.reshape(-1)[:128]
    assert transfer._host_checksum_leaf(a) != transfer._host_checksum_leaf(
        b.reshape(768, 5))


def test_verified_get_retries_on_corruption(monkeypatch):
    """A corrupted first fetch must be detected and refetched."""
    x = jnp.arange(8.0)
    truth = np.arange(8.0, dtype=np.float32)
    corrupted = truth.copy()
    corrupted[3] = 99.0

    calls = {"n": 0}
    real_get = jax.device_get

    def flaky_get(v):
        out = real_get(v)
        if (isinstance(v, list) and len(v) == 1
                and isinstance(v[0], jax.Array) and v[0].ndim >= 1):
            # the bulk data fetch (checksum fetches are scalar lists):
            # corrupt it the first time
            calls["n"] += 1
            if calls["n"] == 1:
                return [corrupted]
        return out

    monkeypatch.setattr(jax, "device_get", flaky_get)
    with pytest.warns(UserWarning, match="checksum mismatch"):
        out = transfer.verified_get({"x": x})
    np.testing.assert_array_equal(out["x"], truth)


def test_verified_get_raises_on_persistent_corruption(monkeypatch):
    x = jnp.arange(8.0)
    corrupted = np.arange(8.0, dtype=np.float32)
    corrupted[0] = -1.0
    real_get = jax.device_get

    def always_bad(v):
        out = real_get(v)
        if (isinstance(v, list) and len(v) == 1
                and isinstance(v[0], jax.Array) and v[0].ndim >= 1):
            return [corrupted]
        if isinstance(v, jax.Array) and v.ndim >= 1:
            return corrupted
        return out

    monkeypatch.setattr(jax, "device_get", always_bad)
    with pytest.raises(RuntimeError, match="corruption persisted"), \
            pytest.warns(UserWarning):
        transfer.verified_get({"x": x}, retries=2)


def test_save_pytree_preserves_f_contiguous_arrays(tmp_path):
    """Regression: jax.device_get can return F-contiguous (transposed-stride)
    views of device buffers; safetensors writes raw buffers assuming C order,
    which silently transposed such leaves (a (768, 5) classifier head) until
    the writer forced contiguity. Reproduces the stride pattern on CPU."""
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import checkpoint as ckpt

    c = np.arange(20, dtype=np.float32).reshape(4, 5)
    f = np.asfortranarray(c)
    assert f.flags["F_CONTIGUOUS"] and not f.flags["C_CONTIGUOUS"]
    tree = {"head": {"w": f, "b": np.ones(5, np.float32)}}
    p = str(tmp_path / "m.safetensors")
    ckpt.save_pytree(tree, p)
    re, _ = ckpt.load_pytree(p)
    np.testing.assert_array_equal(re["head"]["w"], c)
