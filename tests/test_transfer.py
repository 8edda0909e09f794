"""Checksum-verified device->host transfer (utils/transfer).

Motivated by an observed remote-TPU backend flaw: device_get intermittently
returned wrong bytes for one leaf of a fetched checkpoint tree (round 2).
"""

import os

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


def test_host_checksum_0d_and_blocked_equivalence(monkeypatch):
    """0-d 64-bit leaves must not crash (numpy forbids itemsize-changing
    views of 0-d arrays), and the blocked accumulation must equal the naive
    single-pass formula across chunk boundaries."""
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import transfer

    s = transfer._host_checksum_leaf(np.array(7, dtype=np.int64))
    w = np.array(7, dtype=np.int64).reshape(-1).view(np.uint32)
    want = int(sum(int(v) * (i + 1) for i, v in enumerate(w)) & 0xFFFFFFFF)
    assert s == want

    arr = np.random.default_rng(0).integers(0, 2**31, 1000, np.int64)
    ref = transfer._host_checksum_leaf(arr)
    monkeypatch.setattr(transfer, "_CHECKSUM_CHUNK", 64)  # force many blocks
    assert transfer._host_checksum_leaf(arr) == ref


def test_stale_bf16_sidecar_cannot_corrupt_later_save(tmp_path):
    """Regression (round-3 review): a leftover legacy __bf16__ sidecar next
    to a NEW f32 save previously made load view f32 bytes as bf16. Metadata
    now lives in the safetensors header and the save removes stale
    sidecars."""
    import json

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import checkpoint as ckpt

    p = str(tmp_path / "m.safetensors")
    # simulate the legacy hazard: a stale sidecar tagging head/w as bf16
    with open(p + ".json", "w") as f:
        json.dump({"__bf16__": ["head/w"]}, f)
    tree = {"head": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    ckpt.save_pytree(tree, p, meta={"note": "f32"})
    assert not os.path.exists(p + ".json")  # stale sidecar removed
    re, meta = ckpt.load_pytree(p)
    assert meta == {"note": "f32"}
    assert re["head"]["w"].dtype == np.float32
    np.testing.assert_array_equal(re["head"]["w"], tree["head"]["w"])


def test_legacy_json_sidecar_still_loads(tmp_path):
    """Checkpoints written before header-embedded metadata (tensor file +
    .json sidecar, incl. the bf16 tag) must keep loading."""
    import json

    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import checkpoint as ckpt

    bf = jnp.asarray(np.linspace(-2, 2, 8, dtype=np.float32)).astype(jnp.bfloat16)
    p = str(tmp_path / "legacy.safetensors")
    save_file({"w": np.asarray(bf).view(np.uint16)}, p)  # no header meta
    with open(p + ".json", "w") as f:
        json.dump({"__bf16__": ["w"], "epoch": 3}, f)
    tree, meta = ckpt.load_pytree(p)
    assert meta == {"epoch": 3}
    assert tree["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(tree["w"]).view(np.uint16),
                                  np.asarray(bf).view(np.uint16))


def test_train_state_single_file_and_legacy(tmp_path):
    """save_train_state writes ONE atomic file (no torn params/opt pair);
    legacy two-file checkpoints still load; the positional opt keys survive
    an optax chain with >= 10 leaf-bearing elements (string-sorted order
    would permute '10' before '2')."""
    import jax
    import jax.numpy as jnp
    import optax

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train.steps import TrainState
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import checkpoint as ckpt

    params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
    # 12-element chain: every add_decayed_weights/trace pair carries leaves
    tx = optax.chain(*[optax.trace(decay=0.1 * (i + 1)) for i in range(11)],
                     optax.sgd(1e-2))
    state = TrainState.create(params, tx)
    # make the moments distinguishable from init
    state, _ = (state, None)
    upd = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(upd, state.opt_state, state.params)
    state = TrainState(optax.apply_updates(state.params, updates), opt_state,
                       state.step + 1)

    prefix = str(tmp_path / "ck")
    ckpt.save_train_state(state, prefix, meta={"epoch": 5})
    assert os.path.exists(prefix + ".state.safetensors")
    assert not os.path.exists(prefix + ".params.safetensors")
    assert ckpt.train_state_exists(prefix)

    restored, meta = ckpt.load_train_state(prefix, tx, state_cls=TrainState)
    assert meta["epoch"] == 5 and int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in params:
        np.testing.assert_array_equal(np.asarray(state.params[k]),
                                      np.asarray(restored.params[k]))

    # legacy two-file layout still loads
    legacy = str(tmp_path / "old")
    ckpt.save_pytree(state.params, legacy + ".params.safetensors",
                     meta={"step": 1})
    ckpt.save_pytree({"opt": state.opt_state}, legacy + ".opt.safetensors")
    restored2, _ = ckpt.load_train_state(legacy, tx, state_cls=TrainState)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
