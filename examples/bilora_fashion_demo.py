"""BiLoRA on FashionMNIST — the reference's ``train_bilora.ipynb`` workflow
as a runnable script: frozen backbone + a per-task frequency-domain adapter
(n_frq learnable spectral coefficients, dW = alpha*Re(ifft2(spectrum))).

Uses real FashionMNIST IDX files when present under ``./fashion_data`` (the
reference's committed layout); otherwise generates a synthetic class-coded
IDX fixture (no network egress in this environment).

    python examples/bilora_fashion_demo.py
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

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import fashion
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import bilora


def get_data(limit=128):
    try:
        tr_x, tr_y = fashion.load_split("./fashion_data", "train", limit=limit)
        te_x, te_y = fashion.load_split("./fashion_data", "test", limit=limit // 2)
        print("using real FashionMNIST from ./fashion_data")
    except FileNotFoundError:
        print("no ./fashion_data — generating a synthetic IDX fixture")
        root = tempfile.mkdtemp()
        rng = np.random.default_rng(0)

        def make(n, img_name, lbl_name):
            labels = (np.arange(n) % 10).astype(np.uint8)
            images = rng.integers(0, 40, (n, 28, 28), dtype=np.uint8)
            for i, c in enumerate(labels):
                images[i, 4 + c * 2: 10 + c * 2, 6:22] = 220
            fashion.write_idx(os.path.join(root, img_name), images)
            fashion.write_idx(os.path.join(root, lbl_name), labels)

        make(limit, "train-images-idx3-ubyte", "train-labels-idx1-ubyte")
        make(limit // 2, "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte")
        tr_x, tr_y = fashion.load_split(root, "train")
        te_x, te_y = fashion.load_split(root, "test")
    return (jnp.asarray(fashion.to_rgb_float(tr_x, image_size=32)),
            jnp.asarray(tr_y),
            jnp.asarray(fashion.to_rgb_float(te_x, image_size=32)),
            jnp.asarray(te_y))


def main():
    x_tr, y_tr, x_te, y_te = get_data()
    entry = registry.get_model("vit_test")
    cfg = entry.config(10)
    base = entry.init(jax.random.key(0), cfg)

    bcfg = bilora.BiLoRAConfig(n_frq=100, alpha=1.0, task_id=0,
                               targets=("blocks/attn/q", "blocks/attn/v"))
    trainable = {"coeffs": bilora.init(base, bcfg),
                 "head": jax.tree.map(jnp.copy, base["head"])}
    print("BiLoRA trainable params:",
          sum(int(np.prod(l.shape)) for l in jax.tree.leaves(trainable["coeffs"])),
          "spectral coefficients + head")

    tx = optax.adam(5e-3)
    opt = tx.init(trainable)

    @jax.jit
    def step(trainable, opt):
        def loss(t):
            p = dict(bilora.apply_delta(base, t["coeffs"], bcfg))
            p["head"] = t["head"]
            logits = entry.apply(cfg, p, x_tr)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y_tr).mean()

        l, g = jax.value_and_grad(loss)(trainable)
        up, opt = tx.update(g, opt, trainable)
        return optax.apply_updates(trainable, up), opt, l

    for i in range(80):
        trainable, opt, l = step(trainable, opt)
        if i % 20 == 0:
            print(f"step {i}: loss {float(l):.4f}")

    merged = dict(bilora.apply_delta(base, trainable["coeffs"], bcfg))
    merged["head"] = trainable["head"]
    acc = float(jnp.mean(jnp.argmax(entry.apply(cfg, merged, x_te), -1) == y_te))
    base_acc = float(jnp.mean(jnp.argmax(entry.apply(cfg, base, x_te), -1) == y_te))
    print(f"test accuracy: base {base_acc:.3f} -> BiLoRA {acc:.3f}")


if __name__ == "__main__":
    main()
