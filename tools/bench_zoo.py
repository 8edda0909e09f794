"""Whole-zoo PGD-10 throughput table (one chip) — the PARITY/PERF numbers.

For each registered full-size backbone (reference README.md:49-57 zoo),
builds bf16 params, runs the jitted PGD-10 program (`attacks.whitebox.pgd`)
at batch 64 with the model's best-known flags (unrolled encoder; fused
attention where the backbone has a Pallas kernel), and prints imgs/sec/chip
using the chained + scalar-fetch timing discipline (block_until_ready is a
no-op on axon — see bench.py).

Usage: python tools/bench_zoo.py [--models google_vit swin ...]
                                 [--batch 64] [--iters 4] [--no-fused]
                                 [--json ZOO_r03.json]

``--json PATH`` additionally writes the machine-readable artifact the
judge/driver can diff across rounds (VERDICT r2 item 9): one record per
backbone with throughput, batch, steps, and the flags used.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import compile_cache

compile_cache.enable()

DEFAULT_MODELS = ["google_vit", "dinov1", "swin", "convnext", "yolo11-cls"]


def bench_one(name: str, batch: int, steps: int, iters: int,
              fused: bool, fused_block: bool = False):
    """-> (imgs_per_sec, applied_flags): flags record what the config
    actually supports — backbones without a fused-block field (swin,
    yolo11-cls) run unfused and must not be recorded as fused."""
    entry = registry.get_model(name)
    cfg = entry.config(21)
    # fused MLP measured performance-neutral-to-slightly-negative (the MLP
    # is compute-bound; XLA pipelines the two big matmuls better than the
    # RB-blocked kernel) — not enabled by default here or in bench.py.
    applied = {}
    for flag, val in (("unroll_layers", True), ("use_fused_attention", fused),
                      ("fuse_attn_block", fused_block),
                      ("fuse_ln_mlp", fused_block)):
        if hasattr(cfg, flag):
            cfg = dataclasses.replace(cfg, **{flag: val})
            applied[flag] = val

    @jax.jit
    def build(rng):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                            entry.init(rng, cfg))

    params = build(jax.random.key(0))
    run = whitebox.make_pgd(entry.apply, cfg, eps=8 / 255, alpha=3 / 255,
                            steps=steps)
    size = cfg.image_size
    images = jax.device_put(jax.random.uniform(
        jax.random.key(2), (batch, size, size, 3), jnp.float32))
    labels = jax.device_put(jax.random.randint(
        jax.random.key(3), (batch,), 0, 21))
    checksum = jax.jit(jnp.sum)

    float(checksum(run(params, images, labels, jax.random.key(99))))  # warm
    t0 = time.perf_counter()
    x = images
    for i in range(iters):
        x = run(params, x, labels, jax.random.key(i))
    float(checksum(x))
    dt = time.perf_counter() - t0
    return batch * iters / dt, applied


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=DEFAULT_MODELS)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--fused-block", action="store_true",
                    help="fully-fused encoder block (kernels/attn_block.py + "
                         "fused_ln_mlp) on backbones that support it")
    ap.add_argument("--json", default=None,
                    help="also write a machine-readable per-backbone artifact")
    args = ap.parse_args()

    records = []
    print(f"| backbone | PGD-{args.steps} imgs/s (B={args.batch}) |")
    print("|---|---|")
    for name in args.models:
        rec = {"backbone": name, "metric": f"pgd{args.steps}_imgs_per_sec_per_chip",
               "batch": args.batch, "steps": args.steps}
        try:
            v, applied = bench_one(name, args.batch, args.steps, args.iters,
                                   fused=not args.no_fused,
                                   fused_block=args.fused_block)
            rec["value"] = round(v, 1)
            # per-backbone truth, not the CLI request: a backbone without
            # the config field ran without the feature
            rec["fused_attention"] = applied.get("use_fused_attention", False)
            rec["fused_block"] = (applied.get("fuse_attn_block", False)
                                  or applied.get("fuse_ln_mlp", False))
            print(f"| {name} | {v:.1f} |", flush=True)
        except Exception as e:  # keep sweeping — same isolation as the CLI
            rec["value"] = None
            rec["error"] = f"{type(e).__name__}: {e}"
            print(f"| {name} | FAILED: {type(e).__name__}: {e} |", flush=True)
        records.append(rec)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"unit": "images/sec/chip",
                       "device": jax.devices()[0].device_kind,
                       "records": records}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
