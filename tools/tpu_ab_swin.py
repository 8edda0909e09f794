"""Swin-B PGD-10 hardware A/B: packed window-attention scores.

Round-3 measured-negative: block-diagonal OPERAND packing — (49k, 32k)
matmuls — costs k^2 raw FLOPs for <=k^2 utilization and measured flat
(PERF.md "Swin formulation decision"). This round's variant packs only the
M/N (token) axes: p (head, window) instances concatenate to (p*49)-token
score/PV matmuls with a block-diagonal additive mask, keeping the hd=32
contraction — p x raw FLOPs for up to p^2 utilization
(kernels/window_attention.py pack param; VERDICT r3 item 6, target >=120
imgs/s or a documented-negative with this tool's numbers).

    timeout -k 10 2400 python tools/tpu_ab_swin.py [--iters 4]

Per the house discipline: hardware gradient parity of each variant vs the
baseline program, then chained-iteration end-to-end PGD-10 timing, one JSON
line per variant; exits nonzero on parity failure.
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
    swin,
)

VARIANTS = (
    ("fused", {"use_fused_attention": True}),
    ("fused+pack2", {"use_fused_attention": True, "pack_windows": 2}),
    ("fused+pack4", {"use_fused_attention": True, "pack_windows": 4}),
    ("fused+pack8", {"use_fused_attention": True, "pack_windows": 8}),
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"metric": "swin_ab", "ok": None,
                          "error": "no TPU backend — run on hardware"}))
        return 2

    base_cfg = dataclasses.replace(swin.SWIN_B.with_classes(21),
                                   unroll_layers=True)

    @jax.jit
    def build(rng):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                            swin.init(rng, base_cfg))

    params = build(jax.random.key(0))
    images = jax.device_put(jax.random.uniform(
        jax.random.key(2), (args.batch, 224, 224, 3), jnp.float32))
    labels = jax.device_put(jax.random.randint(
        jax.random.key(3), (args.batch,), 0, 21))
    checksum = jax.jit(jnp.sum)

    # Parity on the raw image gradient (one fwd+bwd), NOT the PGD output:
    # PGD's sign() legitimately flips near-zero-gradient pixels into +-2*eps
    # divergence between numerically equivalent programs.
    def make_grad(cfg):
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks.common import (
            IMAGENET,
        )

        def loss(imgs):
            logits = swin.apply(cfg, params, IMAGENET(imgs))
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

        run = whitebox.make_pgd(swin.apply, cfg, eps=8 / 255,
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
            "metric": "swin_pgd10_imgs_per_sec_per_chip",
            "variant": name, "value": round(ips, 1), "batch": args.batch,
            "steps": args.steps, "iters": args.iters,
            "grad_parity_rel_max_vs_baseline": round(rel, 6),
            "parity_ok": ok, "checksum": s,
        }), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
