"""BiLoRA adapter tests + the sequential-LoRA stacking workflow
(reference notebook capabilities, SURVEY.md §2.1 items 13-14)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import corruptions
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry, vit
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import bilora, lora


def test_bilora_zero_init_is_identity():
    params = vit.init(jax.random.key(0), vit.VIT_TEST)
    cfg = bilora.BiLoRAConfig(n_frq=16, targets=("blocks/attn/q",))
    ad = bilora.init(params, cfg)
    merged = bilora.apply_delta(params, ad, cfg)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(vit.apply(vit.VIT_TEST, params, x)),
        np.asarray(vit.apply(vit.VIT_TEST, merged, x)), atol=1e-6)


def test_bilora_delta_roundtrip():
    """Scattered coeffs -> ifft2 -> fft2 recovers the spectrum support."""
    fac = {"re": jnp.asarray([1.0, 0.5]), "im": jnp.asarray([0.0, -0.25])}
    pos = np.asarray([[0, 0], [2, 3]], np.int32)
    d = bilora.delta(fac, pos, (8, 8), alpha=1.0)
    assert d.shape == (8, 8)
    spec = np.fft.fft2(np.asarray(d))
    # energy concentrated at the chosen positions (plus conjugate mirror,
    # since taking Re() of the ifft folds in the Hermitian reflection)
    mask = np.zeros((8, 8), bool)
    mask[0, 0] = mask[2, 3] = True
    mask[(8 - 2) % 8, (8 - 3) % 8] = True  # real part folds in the conjugate
    off_support = np.abs(spec)[~mask]
    assert off_support.max() < 1e-3


def test_bilora_positions_task_dependent_and_deterministic():
    p1 = bilora._positions(0, 50, 64, 64)
    p2 = bilora._positions(0, 50, 64, 64)
    p3 = bilora._positions(1, 50, 64, 64)
    np.testing.assert_array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
    assert len({(int(r), int(c)) for r, c in p1}) == 50  # no duplicates


def test_bilora_trains_and_composes():
    """Coefficients are trainable; two tasks' deltas compose additively."""
    entry = registry.get_model("vit_test")
    cfg = entry.config(3)
    params = entry.init(jax.random.key(0), cfg)
    bcfg1 = bilora.BiLoRAConfig(n_frq=8, alpha=1.0,
                                targets=("blocks/attn/q",), task_id=0)
    ad = bilora.init(params, bcfg1)

    x = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
    y = jnp.asarray([0, 1, 2, 0])

    def loss(ad):
        p = bilora.apply_delta(params, ad, bcfg1)
        logits = entry.apply(cfg, p, x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    l0 = float(loss(ad))
    g = jax.grad(loss)(ad)
    gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert gnorm > 0
    tx = optax.adam(1e-2)
    opt = tx.init(ad)
    for _ in range(10):
        grads = jax.grad(loss)(ad)
        up, opt = tx.update(grads, opt, ad)
        ad = optax.apply_updates(ad, up)
    assert float(loss(ad)) < l0

    # composition: task-0 + task-1 deltas sum
    bcfg2 = bilora.BiLoRAConfig(n_frq=8, alpha=1.0,
                                targets=("blocks/attn/q",), task_id=1)
    ad2 = jax.tree.map(lambda v: v + 0.05, bilora.init(params, bcfg2))
    both = bilora.merge_many(params, [ad, ad2], [bcfg1, bcfg2])
    w_base = params["blocks"]["attn"]["q"]["w"]
    w_merged = both["blocks"]["attn"]["q"]["w"]
    assert float(jnp.abs(w_merged - w_base).max()) > 0


def test_corruptions_in_range():
    x = jax.random.uniform(jax.random.key(0), (4, 16, 16, 3))
    for name, fn in corruptions.CORRUPTIONS.items():
        out = fn(x, jax.random.key(1))
        assert out.shape == x.shape, name
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 1.0, name
        assert np.abs(o - np.asarray(x)).max() > 0, name


def test_sequential_lora_stacking():
    """The infLora.ipynb workflow: train LoRA-1 on clean data, merge it,
    train LoRA-2 (different rank) on Gaussian-corrupted data against the
    merged base, merge again — noisy accuracy must improve while the
    composed model still works on clean data."""
    entry = registry.get_model("vit_test")
    cfg = entry.config(3)
    base = entry.init(jax.random.key(0), cfg)

    rng = np.random.default_rng(0)
    n = 24
    images = rng.random((n, 32, 32, 3), np.float32) * 0.15
    labels = np.arange(n) % 3
    for i in range(n):
        images[i, 8:24, 8:24, labels[i]] += 0.8
    images = np.clip(images, 0, 1)
    x, y = jnp.asarray(images), jnp.asarray(labels)
    x_noisy = corruptions.gaussian_noise(x, jax.random.key(9), sigma=0.3)

    def train_adapter(base_params, data_x, rank, steps=25):
        lcfg = lora.LoRAConfig(rank=rank, alpha=16.0,
                               targets=entry.lora_targets(cfg))
        trainable = {"adapter": lora.init(jax.random.key(rank), base_params, lcfg),
                     "head": base_params["head"]}
        tx = optax.adam(5e-3)
        opt = tx.init(trainable)

        @jax.jit
        def step(trainable, opt):
            def loss(t):
                p = lora.attach(base_params, t["adapter"], lcfg)
                p = dict(p)
                p["head"] = t["head"]
                logits = entry.apply(cfg, p, data_x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            g = jax.grad(loss)(trainable)
            up, opt = tx.update(g, opt, trainable)
            return optax.apply_updates(trainable, up), opt

        for _ in range(steps):
            trainable, opt = step(trainable, opt)
        merged = lora.merge(base_params, trainable["adapter"], lcfg)
        merged = dict(merged)
        merged["head"] = trainable["head"]
        return merged

    def acc(params, data_x):
        logits = entry.apply(cfg, params, data_x)
        return float(jnp.mean(jnp.argmax(logits, -1) == y))

    # LoRA-1 on clean data, merged into the base (notebook cell f738f1db)
    stage1 = train_adapter(base, x, rank=4)
    clean_acc_1 = acc(stage1, x)
    noisy_acc_1 = acc(stage1, x_noisy)
    assert clean_acc_1 > acc(base, x)

    # LoRA-2 (r=16-style, different rank) on noisy data against the merged
    # base (notebook cells f47dcfcf/9713f297)
    stage2 = train_adapter(stage1, x_noisy, rank=8)
    noisy_acc_2 = acc(stage2, x_noisy)
    clean_acc_2 = acc(stage2, x)

    assert noisy_acc_2 >= noisy_acc_1  # noise robustness improved
    assert noisy_acc_2 > 0.5
    assert clean_acc_2 > 0.5  # clean capability retained
