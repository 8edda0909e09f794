"""Measured PyTorch reference baseline for the PGD-10 headline metric.

BASELINE.md's 55 imgs/s A100 figure is a roofline *estimate* (the reference
publishes no numbers). This script replaces estimate-vs-measurement with
measurement-vs-measurement on hardware both sides can actually run here:

* **torch side**: eager float32 PGD-10 over HF ``ViTForImageClassification``
  (ViT-B/16 geometry, random init — no hub egress) with the reference's exact
  attack semantics (whitebox_attacks.py:108-113 / torchattacks.PGD: summed CE
  on ImageNet-normalized input, alpha*sign(grad), Linf+[0,1] projection),
  Python loop per step — the reference's execution model.
* **jax side**: this framework's ``attacks.whitebox.make_pgd`` (one compiled
  ``lax.scan`` program) pinned to the same CPU backend, same geometry/batch.

Both run on this host's CPU, so the printed ratio isolates the *framework*
(compilation, fusion, loop structure) from the accelerator. Record the output
in BASELINE.md. Tunables: REFBENCH_BATCH, REFBENCH_STEPS, REFBENCH_REPEATS.
"""

from __future__ import annotations

import json
import os
import time


def bench_torch(batch: int, steps: int, repeats: int) -> float:
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.ViTConfig(num_labels=21)  # ViT-B/16 @ 224 defaults
    model = transformers.ViTForImageClassification(config).eval()

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    g = torch.Generator().manual_seed(1)
    images = torch.rand((batch, 3, 224, 224), generator=g)
    labels = torch.randint(0, 21, (batch,), generator=g)

    def pgd(x0):
        eps, alpha = 8 / 255, 3 / 255
        x = x0 + torch.empty_like(x0).uniform_(-eps, eps, generator=g)
        x = torch.min(torch.max(x, (x0 - eps).clamp_min(0)), (x0 + eps).clamp_max(1))
        for _ in range(steps):
            x = x.detach().requires_grad_(True)
            logits = model((x - mean) / std).logits
            loss = torch.nn.functional.cross_entropy(logits, labels, reduction="sum")
            # input-only gradient, exactly torchattacks' autograd.grad call —
            # no weight-gradient matmuls, same work the JAX side does
            grad_x = torch.autograd.grad(loss, x)[0]
            x = x.detach() + alpha * grad_x.sign()
            x = torch.min(torch.max(x, (x0 - eps).clamp_min(0)), (x0 + eps).clamp_max(1))
        return x

    pgd(images)  # warmup (allocator, thread pools)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = pgd(images)
    dt = time.perf_counter() - t0
    assert torch.isfinite(out).all()
    return batch * repeats / dt


def bench_jax(batch: int, steps: int, repeats: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")  # same silicon as the torch run
    import jax.numpy as jnp

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit

    cfg = vit.VIT_B16.with_classes(21).__class__(
        **{**vit.VIT_B16.with_classes(21).__dict__, "compute_dtype": "float32"})
    params = vit.init(jax.random.key(0), cfg)
    run = whitebox.make_pgd(vit.apply, cfg, eps=8 / 255, alpha=3 / 255, steps=steps)

    images = jnp.asarray(
        jax.random.uniform(jax.random.key(1), (batch, 224, 224, 3), jnp.float32))
    labels = jax.random.randint(jax.random.key(2), (batch,), 0, 21)

    x = run(params, images, labels, jax.random.key(3))
    float(jnp.sum(x))  # compile + warmup
    t0 = time.perf_counter()
    for i in range(repeats):
        x = run(params, x, labels, jax.random.key(i))
    float(jnp.sum(x))
    dt = time.perf_counter() - t0
    return batch * repeats / dt


def main() -> None:
    batch = int(os.environ.get("REFBENCH_BATCH", "4"))
    steps = int(os.environ.get("REFBENCH_STEPS", "10"))
    repeats = int(os.environ.get("REFBENCH_REPEATS", "1"))

    torch_ips = bench_torch(batch, steps, repeats)
    jax_ips = bench_jax(batch, steps, repeats)
    print(json.dumps({
        "metric": f"pgd{steps}_vitb_cpu_imgs_per_sec",
        "torch_eager_fp32": round(torch_ips, 3),
        "jax_compiled_fp32": round(jax_ips, 3),
        "jax_over_torch": round(jax_ips / torch_ips, 3),
        "batch": batch, "host": "cpu (same silicon both sides)",
    }))


if __name__ == "__main__":
    main()
