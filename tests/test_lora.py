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
