"""North-star benchmark: PGD-10 adversarial-example generation throughput.

Measures images/sec/chip for the jitted PGD program (`attacks.whitebox.pgd`,
a `lax.scan` over 10 fused forward/backward passes) against the flagship
ViT-B/16 with a rank-8 LoRA adapter merged into the weights — the
configuration of BASELINE.json's headline metric and reference
`whitebox_attacks.py` (eps=8/255, alpha=3/255, random start).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` compares against an estimated PyTorch-GPU reference throughput
of 55 imgs/s/chip. The reference publishes no numbers (SURVEY.md §6), so the
estimate is a roofline derivation of what its code actually runs:
ViT-B/16 at 224px is ~35 GFLOPs/img forward (2 FLOPs/MAC convention, 197
tokens); PGD-10 costs 10x(fwd + input-bwd) ~ 1.06 TFLOPs/img. The reference's
torchattacks loop is EAGER FLOAT32 — no autocast, no torch.compile
(whitebox_attacks.py) — so an A100 sustains TF32 matmuls (156 TFLOPs peak) at
an optimistic ~35-40% end-to-end MFU for eager per-op dispatch: ~55-60
TFLOPs -> ~55 imgs/s. (A hypothetical bf16-autocast + compiled version of
the reference would reach ~110; this implementation measures ~83 imgs/s on
one v5e chip = ~45% MFU of its 197-TFLOP bf16 peak, with linear data-mesh
scaling across chips that the single-device reference cannot do at all.)
Tunables: BENCH_BATCH, BENCH_STEPS, BENCH_ITERS env vars.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora

REFERENCE_IMGS_PER_SEC = 55.0  # estimated PyTorch-GPU PGD-10 baseline (see module docstring)


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    n_chips = max(1, len(jax.devices()))

    import dataclasses

    # Pallas whole-head attention (kernels/attention.py, 12 heads per grid
    # program): measured +6% end-to-end over XLA's fusion on v5e.
    cfg = dataclasses.replace(vit.VIT_B16.with_classes(21),
                              use_fused_attention=True)
    lcfg = lora.LoRAConfig(rank=8, alpha=16.0, targets=vit.LORA_TARGETS_DEFAULT)

    # One jitted setup program (eager init would cost hundreds of per-op
    # dispatches through the remote-TPU tunnel). The adapter is merged into
    # the weights — the attacked function is identical to the unmerged
    # LoRA path, with fewer matmuls per step.
    @jax.jit
    def build_params(rng):
        params = vit.init(rng, cfg)
        adapter = lora.init(jax.random.fold_in(rng, 1), params, lcfg)
        merged = lora.merge(params, adapter, lcfg)
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), merged)

    params = build_params(jax.random.key(0))
    rng = jax.random.key(0)

    run = whitebox.make_pgd(vit.apply, cfg, eps=8 / 255, alpha=3 / 255, steps=steps)

    images = jax.device_put(
        jax.random.uniform(jax.random.fold_in(rng, 2), (batch, 224, 224, 3), jnp.float32))
    labels = jax.device_put(
        jax.random.randint(jax.random.fold_in(rng, 3), (batch,), 0, cfg.num_classes))
    checksum = jax.jit(jnp.sum)

    # Warmup / compile both programs. Timing methodology: iterations are
    # CHAINED (each feeds the previous output as input) and the final scalar
    # is fetched to host — remote/async backends can make block_until_ready a
    # no-op, but a device->host fetch of a value that data-depends on every
    # iteration cannot lie.
    float(checksum(run(params, images, labels, jax.random.key(99))))

    t0 = time.perf_counter()
    x = images
    for i in range(iters):
        x = run(params, x, labels, jax.random.key(i))
    float(checksum(x))
    dt = time.perf_counter() - t0

    imgs_per_sec_per_chip = batch * iters / dt / n_chips
    print(json.dumps({
        "metric": f"pgd{steps}_adv_images_per_sec_per_chip_vitb_lora",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / REFERENCE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
