import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvt_lora.models import vit
from apvt_lora.ops import lora
from apvt_lora.utils import trees


@pytest.fixture(scope="module")
def setup():
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    lcfg = lora.LoRAConfig(rank=4, alpha=16.0, targets=vit.LORA_TARGETS_DEFAULT)
    adapter = lora.init(jax.random.key(1), params, lcfg)
    x = jax.random.uniform(jax.random.key(2), (2, cfg.image_size, cfg.image_size, 3))
    return cfg, params, lcfg, adapter, x


def _randomize(adapter, key):
    leaves, treedef = jax.tree.flatten(adapter)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef, [0.05 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )


def test_zero_init_is_identity(setup):
    cfg, params, lcfg, adapter, x = setup
    base = vit.apply(cfg, params, x)
    attached = vit.apply(cfg, lora.attach(params, adapter, lcfg), x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(attached), atol=1e-5)


def test_merged_equals_unmerged(setup):
    """ΔW = (α/r)·A·B folded into W must match the runtime branch
    x·W + s·(x·A)·B — the core LoRA-math invariant (SURVEY.md §4)."""
    cfg, params, lcfg, adapter, x = setup
    adapter = _randomize(adapter, jax.random.key(3))
    unmerged = vit.apply(cfg, lora.attach(params, adapter, lcfg), x)
    merged = vit.apply(cfg, lora.merge(params, adapter, lcfg), x)
    np.testing.assert_allclose(np.asarray(unmerged), np.asarray(merged), atol=2e-3)


def test_unmerge_restores_base(setup):
    cfg, params, lcfg, adapter, x = setup
    adapter = _randomize(adapter, jax.random.key(4))
    roundtrip = lora.merge(lora.merge(params, adapter, lcfg), adapter, lcfg, sign=-1.0)
    for path in ("blocks/attn/q/w", "head/w"):
        np.testing.assert_allclose(
            np.asarray(trees.get_path(roundtrip, path)),
            np.asarray(trees.get_path(params, path)),
            atol=1e-5,
        )


def test_merge_many_order_independent(setup):
    cfg, params, lcfg, adapter, x = setup
    a1 = _randomize(adapter, jax.random.key(5))
    a2 = _randomize(adapter, jax.random.key(6))
    m12 = lora.merge_many(params, [a1, a2], [lcfg, lcfg])
    m21 = lora.merge_many(params, [a2, a1], [lcfg, lcfg])
    np.testing.assert_allclose(
        np.asarray(trees.get_path(m12, "blocks/attn/v/w")),
        np.asarray(trees.get_path(m21, "blocks/attn/v/w")),
        atol=1e-5,
    )


def test_grads_hit_only_adapter(setup):
    """LoRA training form: grad w.r.t. the adapter pytree through attach()."""
    cfg, params, lcfg, adapter, x = setup
    labels = jnp.array([0, 1])

    def loss(ad):
        logits = vit.apply(cfg, lora.attach(params, ad, lcfg), x)
        return -jnp.take_along_axis(jax.nn.log_softmax(logits), labels[:, None], 1).mean()

    g = jax.grad(loss)(adapter)
    # B is zero-init, so dL/dA = 0 but dL/dB != 0 on the first step.
    gb = np.asarray(g["blocks/attn/q"]["b"])
    assert np.isfinite(gb).all() and np.abs(gb).max() > 0


def test_detach_strips_lora(setup):
    cfg, params, lcfg, adapter, x = setup
    stripped = lora.detach(lora.attach(params, adapter, lcfg))
    assert jax.tree.structure(stripped) == jax.tree.structure(params)


def test_param_count_matches_reference_scale():
    """ViT-B r=8 over q,k,v,o: 12 layers x 4 targets x 2 x 768 x 8 factors."""
    cfg = vit.VIT_B16.with_classes(21)
    params = vit.init(jax.random.key(0), cfg)
    lcfg = lora.LoRAConfig(rank=8, alpha=16.0, targets=vit.LORA_TARGETS_DEFAULT)
    adapter = lora.init(jax.random.key(1), params, lcfg)
    assert lora.num_params(adapter) == 12 * 4 * 2 * 768 * 8


def test_lora_dropout_training_form(rng):
    """attach(dropout_rng=...) drops adapter-branch inputs only: the frozen-W
    path is unaffected, eval form is deterministic, different keys give
    different outputs, and zero-dropout matches the eval form exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora

    cfg = vit.VIT_TEST
    params = vit.init(rng, cfg)
    lcfg = lora.LoRAConfig(rank=4, alpha=8.0, dropout=0.5,
                           targets=("blocks/attn/q", "head"))
    adapter = jax.tree.map(lambda v: v + 0.05,
                           lora.init(jax.random.fold_in(rng, 1), params, lcfg))
    x = jax.random.uniform(jax.random.fold_in(rng, 2), (3, 32, 32, 3))

    eval_out = vit.apply(cfg, lora.attach(params, adapter, lcfg), x)
    t1 = vit.apply(cfg, lora.attach(params, adapter, lcfg,
                                    dropout_rng=jax.random.key(0)), x)
    t2 = vit.apply(cfg, lora.attach(params, adapter, lcfg,
                                    dropout_rng=jax.random.key(1)), x)
    assert float(jnp.abs(t1 - t2).max()) > 1e-6  # stochastic across keys
    assert float(jnp.abs(t1 - eval_out).max()) > 1e-6  # differs from eval

    # dropout=0 short-circuits to the eval form even with a key
    lcfg0 = lora.LoRAConfig(rank=4, alpha=8.0, dropout=0.0,
                            targets=lcfg.targets)
    d0 = vit.apply(cfg, lora.attach(params, adapter, lcfg0,
                                    dropout_rng=jax.random.key(0)), x)
    e0 = vit.apply(cfg, lora.attach(params, adapter, lcfg0), x)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(e0), atol=1e-7)

    # with the adapter zeroed the dropout has no effect at all (W path clean)
    zero_ad = jax.tree.map(jnp.zeros_like, adapter)
    za = vit.apply(cfg, lora.attach(params, zero_ad, lcfg,
                                    dropout_rng=jax.random.key(0)), x)
    zb = vit.apply(cfg, params, x)
    np.testing.assert_allclose(np.asarray(za), np.asarray(zb), atol=1e-6)


def test_detach_strips_dropout_leaves(rng):
    """detach() is the exact inverse of attach() including the training-form
    dropout leaves (review finding)."""
    import jax

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora

    params = vit.init(rng, vit.VIT_TEST)
    lcfg = lora.LoRAConfig(rank=2, dropout=0.3, targets=("blocks/attn/q",))
    ad = lora.init(jax.random.fold_in(rng, 1), params, lcfg)
    attached = lora.attach(params, ad, lcfg, dropout_rng=jax.random.key(0))
    restored = lora.detach(attached)
    assert jax.tree.structure(restored) == jax.tree.structure(params)


def test_lora_dropout_mask_statistics(rng):
    """The hardware-RNG dropout path (ops/nn.py dense: lax.rng_bit_generator
    masks, PERF.md 'LoRA dropout masks') keeps the semantics the threefry
    path had: per-key determinism, ~keep-rate drop statistics, an exactly
    unbiased inverted scale (surviving entries are x/keep_q), and
    independent streams across targets."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import nn

    keep = 0.9
    x = jnp.ones((64, 197, 768), jnp.float32)
    a = jnp.eye(768, dtype=jnp.float32)[:, :768]  # identity A exposes xb
    p = {
        "w": jnp.zeros((768, 768), jnp.float32),
        "lora_a": a,
        "lora_b": jnp.eye(768, dtype=jnp.float32),
        "lora_s": jnp.float32(1.0),
        "lora_rng": jax.random.key(7),
        "lora_p": jnp.float32(1.0 - keep),
    }
    y1 = jax.jit(nn.dense)(p, x)
    y2 = jax.jit(nn.dense)(p, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))  # per-key deterministic

    vals = np.unique(np.round(np.asarray(y1), 5))
    keep_q = round(keep * 65536) / 65536
    # inverted dropout on ones: exactly {0, 1/keep_q}
    np.testing.assert_allclose(vals, [0.0, 1.0 / keep_q], atol=1e-5)
    drop_rate = float((np.asarray(y1) == 0.0).mean())
    assert abs(drop_rate - (1.0 - keep_q)) < 3e-3  # ~9.7M draws, generous CI
    # unbiased: E[xb] == x
    assert abs(float(y1.mean()) - 1.0) < 3e-3

    # a different target key gives an independent (different) mask
    p2 = dict(p, lora_rng=jax.random.key(8))
    y3 = jax.jit(nn.dense)(p2, x)
    assert float(jnp.abs(y3 - y1).max()) > 0.0


def test_lora_dropout_post_a_mode(rng):
    """dropout_mode='post_a' (ops/lora.py): the mask lands on the rank-r
    projection x@A, not the input — stochastic across keys, exact manual
    reference through ops.nn._rbg_dropout_scale, detach strips the leaf."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora, nn
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import trees

    params = {"lin": nn.dense_init(rng, 16, 8)}
    lcfg = lora.LoRAConfig(rank=4, alpha=8.0, dropout=0.5,
                           dropout_mode="post_a", targets=("lin",))
    adapter = jax.tree.map(lambda v: v + 0.05,
                           lora.init(jax.random.fold_in(rng, 1), params, lcfg))
    x = jax.random.uniform(jax.random.fold_in(rng, 2), (5, 16))

    attached = lora.attach(params, adapter, lcfg, dropout_rng=jax.random.key(0))
    leaf = attached["lin"]
    assert "lora_rng_pa" in leaf and "lora_rng" not in leaf
    y = nn.dense(leaf, x)

    # exact manual reference with the same RBG stream
    xa = x @ np.asarray(adapter["lin"]["a"])
    scale_mask = np.asarray(nn._rbg_dropout_scale(
        leaf["lora_rng_pa"], leaf["lora_p"], xa.shape))
    ref = (x @ np.asarray(params["lin"]["w"])
           + lcfg.scale * (xa * scale_mask) @ np.asarray(adapter["lin"]["b"])
           + np.asarray(params["lin"]["b"]))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

    # stochastic across keys; deterministic per key
    y1 = nn.dense(lora.attach(params, adapter, lcfg,
                              dropout_rng=jax.random.key(1))["lin"], x)
    assert float(jnp.abs(y - y1).max()) > 1e-6
    np.testing.assert_array_equal(np.asarray(nn.dense(leaf, x)), np.asarray(y))

    # detach strips the post_a leaves
    clean = lora.detach(attached)
    assert "lora_rng_pa" not in trees.flatten_with_paths(clean)
    for path in trees.flatten_with_paths(clean):
        assert not path.rsplit("/", 1)[-1].startswith("lora_")
