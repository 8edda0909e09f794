"""BASELINE.json config 1: FashionMNIST -> ViT-Tiny-class model + LoRA
fine-tune -> FGSM eps-sweep eval, CPU-runnable end to end."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks.common import Normalizer
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import fashion
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora

IDENT = Normalizer((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))


@pytest.fixture(scope="module")
def fashion_root(tmp_path_factory):
    """Synthetic IDX fixture in the reference's fashion_data layout (the
    repo commits labels only; images are generated class-coded here)."""
    root = str(tmp_path_factory.mktemp("fashion_data"))
    raw = os.path.join(root, "FashionMNIST", "raw")
    rng = np.random.default_rng(0)

    def make(n, name_img, name_lbl):
        labels = (np.arange(n) % 10).astype(np.uint8)
        images = rng.integers(0, 40, (n, 28, 28), dtype=np.uint8)
        for i, c in enumerate(labels):
            images[i, 4 + c * 2: 10 + c * 2, 6:22] = 220  # class-coded bar
        fashion.write_idx(os.path.join(raw, name_img), images)
        fashion.write_idx(os.path.join(raw, name_lbl), labels)

    make(60, "train-images-idx3-ubyte", "train-labels-idx1-ubyte")
    make(20, "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte")
    return root


def test_idx_round_trip(fashion_root):
    images, labels = fashion.load_split(fashion_root, "train")
    assert images.shape == (60, 28, 28) and labels.shape == (60,)
    assert images.dtype == np.uint8
    images_t, labels_t = fashion.load_split(fashion_root, "test", limit=5)
    assert len(images_t) == 5

    rgb = fashion.to_rgb_float(images[:4], image_size=32)
    assert rgb.shape == (4, 32, 32, 3)
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0
    # channels replicated
    np.testing.assert_array_equal(rgb[..., 0], rgb[..., 1])


def test_missing_files_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        fashion.load_split(str(tmp_path), "train")


def test_fashion_vit_lora_fgsm_sweep(fashion_root):
    """The full config-1 slice: LoRA fine-tune on FashionMNIST, then FGSM
    robustness at three eps values — robust acc must be monotone non-
    increasing in eps and below clean acc."""
    entry = registry.get_model("vit_test")
    cfg = entry.config(10)
    base = entry.init(jax.random.key(0), cfg)

    train_x, train_y = fashion.load_split(fashion_root, "train")
    test_x, test_y = fashion.load_split(fashion_root, "test")
    xtr = jnp.asarray(fashion.to_rgb_float(train_x, image_size=32))
    ytr = jnp.asarray(train_y)
    xte = jnp.asarray(fashion.to_rgb_float(test_x, image_size=32))
    yte = jnp.asarray(test_y)

    lcfg = lora.LoRAConfig(rank=4, alpha=16.0, targets=entry.lora_targets(cfg))
    trainable = {"adapter": lora.init(jax.random.key(1), base, lcfg),
                 "head": base["head"]}
    tx = optax.adam(5e-3)
    opt = tx.init(trainable)

    @jax.jit
    def step(trainable, opt):
        def loss(t):
            p = dict(lora.attach(base, t["adapter"], lcfg))
            p["head"] = t["head"]
            logits = entry.apply(cfg, p, xtr)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, ytr).mean()

        g = jax.grad(loss)(trainable)
        up, opt = tx.update(g, opt, trainable)
        return optax.apply_updates(trainable, up), opt

    for _ in range(30):
        trainable, opt = step(trainable, opt)

    params = dict(lora.merge(base, trainable["adapter"], lcfg))
    params["head"] = trainable["head"]

    def acc(x):
        logits = entry.apply(cfg, params, x)
        return float(jnp.mean(jnp.argmax(logits, -1) == yte))

    clean = acc(xte)
    assert clean > 0.5, f"LoRA fine-tune failed to learn: {clean}"

    robust = []
    for eps in (4 / 255, 16 / 255, 64 / 255):
        adv = whitebox.fgsm(lambda p, x: entry.apply(cfg, p, x), params,
                            xte, yte, eps=eps, normalize=IDENT)
        assert float(jnp.abs(adv - xte).max()) <= eps + 1e-6
        robust.append(acc(adv))
    assert robust[0] <= clean + 1e-6
    assert robust[2] <= robust[0] + 0.1  # large-eps no better than small
