"""ConvNeXt-B PGD-10 hardware A/B: Pallas depthwise kernel + fused LN-MLP.

Round-3 trace (tools/profile_pgd.py --backbone convnext): 27.7% of wall in
XLA's depthwise lowering (~3.4 TF/s), and the pointwise-MLP matmuls running
bandwidth-limited on their materialized 4C intermediates. Two opt-in flags
target those seams: ``ConvNeXtConfig.use_dw_kernel`` (kernels/dwconv.py) and
``ConvNeXtConfig.fuse_ln_mlp`` (kernels/mlp.py:fused_ln_mlp, ConvNeXt reuse).

    timeout -k 10 2400 python tools/tpu_ab_convnext.py [--iters 4]

Does, per the house measurement discipline (PERF.md "an isolated-kernel win
is necessary but not sufficient"):
1. hardware parity of each variant's PGD output vs the baseline program
   (same rng) — catches Mosaic lowering issues interpret mode cannot;
2. chained-iteration end-to-end PGD-10 timing of all four flag combinations,
   one JSON line each;
3. exits nonzero on parity failure so a broken kernel can't win an A/B.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import (  # noqa: E402
    compile_cache,
)

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import (  # noqa: E402
    whitebox,
)
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import (  # noqa: E402
    convnext,
)

VARIANTS = (
    ("baseline", {}),
    ("dwkernel", {"use_dw_kernel": True}),
    ("lnmlp", {"fuse_ln_mlp": True}),
    ("dwkernel+lnmlp", {"use_dw_kernel": True, "fuse_ln_mlp": True}),
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"metric": "convnext_ab", "ok": None,
                          "error": "no TPU backend — run on hardware"}))
        return 2

    base_cfg = dataclasses.replace(convnext.CONVNEXT_B.with_classes(21),
                                   unroll_layers=True)

    @jax.jit
    def build(rng):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                            convnext.init(rng, base_cfg))

    params = build(jax.random.key(0))
    images = jax.device_put(jax.random.uniform(
        jax.random.key(2), (args.batch, 224, 224, 3), jnp.float32))
    labels = jax.device_put(jax.random.randint(
        jax.random.key(3), (args.batch,), 0, 21))
    checksum = jax.jit(jnp.sum)

    # Parity on the raw image gradient (one fwd+bwd), NOT the PGD output:
    # PGD's sign() legitimately flips near-zero-gradient pixels into +-2*eps
    # divergence between numerically equivalent programs. The gradient
    # itself must match to normalized tolerance.
    def make_grad(cfg):
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks.common import (
            IMAGENET,
        )

        def loss(imgs):
            logits = convnext.apply(cfg, params, IMAGENET(imgs))
            return jnp.mean(-jax.nn.log_softmax(logits)[
                jnp.arange(labels.shape[0]), labels])

        return jax.jit(jax.grad(loss))

    g_ref = None
    failures = 0
    for name, flags in VARIANTS:
        cfg = dataclasses.replace(base_cfg, **flags)
        g = make_grad(cfg)(images)
        if g_ref is None:
            g_ref = g
            rel = 0.0
        else:
            rel = float(jnp.max(jnp.abs(g - g_ref))
                        / (jnp.max(jnp.abs(g_ref)) + 1e-30))
        ok = rel <= 2e-2
        failures += 0 if ok else 1

        run = whitebox.make_pgd(convnext.apply, cfg, eps=8 / 255,
                                alpha=3 / 255, steps=args.steps)
        adv = run(params, images, labels, jax.random.key(7))
        s = float(checksum(adv))

        t0 = time.perf_counter()
        x = images
        for i in range(args.iters):
            x = run(params, x, labels, jax.random.key(i))
        float(checksum(x))
        dt = time.perf_counter() - t0
        ips = args.batch * args.iters / dt
        print(json.dumps({
            "metric": "convnext_pgd10_imgs_per_sec_per_chip",
            "variant": name, "value": round(ips, 1), "batch": args.batch,
            "steps": args.steps, "iters": args.iters,
            "grad_parity_rel_max_vs_baseline": round(rel, 6),
            "parity_ok": ok, "checksum": s,
        }))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
