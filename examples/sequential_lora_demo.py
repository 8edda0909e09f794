"""Sequential LoRA stacking demo — the reference's ``infLora.ipynb`` workflow
as a runnable script (reference notebook cells f738f1db/f47dcfcf/9713f297):

1. fine-tune LoRA-1 on clean data and MERGE it into the base;
2. treat the merged model as a new base; fine-tune LoRA-2 (different rank)
   on Gaussian-noise-corrupted data; merge again;
3. print the clean/noisy accuracy matrix for base, stage-1 and stage-2.

Runs on CPU in ~1 minute with the synthetic dataset:

    python examples/sequential_lora_demo.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# demos run on CPU by default (tiny model; also keeps the BiLoRA ifft2 off
# remote backends that lack complex-FFT support). Set APVT_DEMO_TPU=1 to opt
# into the accelerator.
if os.environ.get("APVT_DEMO_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks.corruptions import gaussian_noise
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import synthetic
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary


def load_arrays(root, split, vocab):
    idx = MetadataIndex(os.path.join(root, split, "metadata.csv"), vocab)
    xs, ys = [], []
    for b in Loader(idx, batch_size=32, image_size=32, resize=32):
        keep = b.valid > 0
        xs.append(b.images_f32()[keep])
        ys.append(b.labels[keep])
    return jnp.asarray(np.concatenate(xs)), jnp.asarray(np.concatenate(ys))


def train_lora_merge(entry, cfg, base, x, y, *, rank, steps=60, lr=5e-3, seed=0):
    lcfg = lora.LoRAConfig(rank=rank, alpha=16.0,
                           targets=entry.lora_targets(cfg), dropout=0.0)
    trainable = {"adapter": lora.init(jax.random.key(seed), base, lcfg),
                 "head": jax.tree.map(jnp.copy, base["head"])}
    tx = optax.adam(lr)
    opt = tx.init(trainable)

    @jax.jit
    def step(trainable, opt):
        def loss(t):
            p = dict(lora.attach(base, t["adapter"], lcfg))
            p["head"] = t["head"]
            logits = entry.apply(cfg, p, x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        g = jax.grad(loss)(trainable)
        up, opt = tx.update(g, opt, trainable)
        return optax.apply_updates(trainable, up), opt

    for _ in range(steps):
        trainable, opt = step(trainable, opt)
    merged = dict(lora.merge(base, trainable["adapter"], lcfg))
    merged["head"] = trainable["head"]
    return merged


def main():
    root = tempfile.mkdtemp()
    synthetic.make_synthetic_dataset(root, n_per_class={"train": 16, "val": 4,
                                                        "test": 8},
                                     image_size=32)
    vocab = LabelVocabulary.from_classes(synthetic.DEFAULT_CLASSES)
    entry = registry.get_model("vit_test")
    cfg = entry.config(len(vocab))
    base = entry.init(jax.random.key(0), cfg)

    x_tr, y_tr = load_arrays(root, "train", vocab)
    x_te, y_te = load_arrays(root, "test", vocab)
    x_te_noisy = gaussian_noise(x_te, jax.random.key(7), sigma=0.3)
    x_tr_noisy = gaussian_noise(x_tr, jax.random.key(8), sigma=0.3)

    def acc(params, x, y):
        return float(jnp.mean(jnp.argmax(entry.apply(cfg, params, x), -1) == y))

    print("stage 0 (random base):"
          f" clean={acc(base, x_te, y_te):.3f}"
          f" noisy={acc(base, x_te_noisy, y_te):.3f}")

    stage1 = train_lora_merge(entry, cfg, base, x_tr, y_tr, rank=4, seed=1)
    print("stage 1 (LoRA-1 r=4 on clean, merged):"
          f" clean={acc(stage1, x_te, y_te):.3f}"
          f" noisy={acc(stage1, x_te_noisy, y_te):.3f}")

    stage2 = train_lora_merge(entry, cfg, stage1, x_tr_noisy, y_tr, rank=16,
                              seed=2)
    print("stage 2 (+LoRA-2 r=16 on noisy, merged):"
          f" clean={acc(stage2, x_te, y_te):.3f}"
          f" noisy={acc(stage2, x_te_noisy, y_te):.3f}")


if __name__ == "__main__":
    main()
