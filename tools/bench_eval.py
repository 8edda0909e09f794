"""Forward-only evaluation/serving throughput per backbone -> EVAL_r{N}.json.

The composability harness's hot loop is 80 forward-only evaluation passes
(reference eval_compose.py:275-433; here eval/compose.py's single compiled
eval step), and it is also the deployment/serving path. PERF.md quotes the
ViT-B sweep numbers (bf16 1766 imgs/s, int8 1866 at B=256) from an ad-hoc
session; this tool makes them a reproducible machine-readable artifact like
ZOO_r03.json / TRAIN_r03.json.

Timing follows the axon rule (bench.py docstring): iterations chain inside
one jitted ``lax.scan`` (each feeding on the previous output, so nothing
can be elided or overlapped with the host) and one scalar fetch at the end.

Usage: python tools/bench_eval.py [--json EVAL_r03.json] [--batch 256]
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

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import compile_cache

compile_cache.enable()

DEFAULT_MODELS = ["google_vit", "dinov1", "swin", "convnext", "yolo11-cls"]


def bench_one(name: str, batch: int, iters: int, *, int8: bool = False):
    entry = registry.get_model(name)
    cfg = entry.config(21)
    for flag, val in (("unroll_layers", True), ("use_fused_attention", True)):
        if hasattr(cfg, flag):
            cfg = dataclasses.replace(cfg, **{flag: val})

    @jax.jit
    def build(rng):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                            entry.init(rng, cfg))

    params = build(jax.random.key(0))
    if int8:
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit
        from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import quant

        params = quant.quantize_dense_tree(params, vit.QUANT_TARGETS_DEFAULT)

    size = cfg.image_size
    images = jax.device_put(jax.random.uniform(
        jax.random.key(2), (batch, size, size, 3), jnp.float32))

    @jax.jit
    def sweep(x):
        # each iteration's input depends on the previous logits: a tiny
        # data-dependent shift serializes the chain without changing cost
        def body(xc, _):
            logits = entry.apply(cfg, params, xc)
            shift = (jnp.tanh(logits[:, :1]) * 1e-4)[:, :, None, None]
            return jnp.clip(xc + shift, 0.0, 1.0), None

        xf, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(xf)

    float(sweep(images))  # compile + warm
    t0 = time.perf_counter()
    s = float(sweep(images))
    dt = time.perf_counter() - t0
    return batch * iters / dt, s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=DEFAULT_MODELS)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sweep_batch", nargs="*", type=int,
                    default=[64, 128, 256, 512],
                    help="extra batch sizes swept for the FIRST model only "
                         "(eval-MFU attribution, VERDICT r3 item 9: the "
                         "attack path measured B=64 optimal with larger "
                         "batches losing; pass no values to disable)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    records = []
    for b in args.sweep_batch:
        if b == args.batch or not args.models:
            continue
        rec = {"backbone": args.models[0], "batch": b, "int8": False,
               "metric": "eval_forward_imgs_per_sec_per_chip"}
        try:
            v, _ = bench_one(args.models[0], b, args.iters)
            rec["value"] = round(v, 1)
            print(f"batch sweep {args.models[0]} B={b}: {rec['value']} imgs/s")
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {e}"
        records.append(rec)
    print(f"| backbone | eval imgs/s (B={args.batch}) |")
    print("|---|---|")
    variants = [(n, False) for n in args.models]
    if "google_vit" in args.models:
        variants.append(("google_vit", True))  # the measured int8 serving path
    for name, int8 in variants:
        label = name + ("+int8" if int8 else "")
        rec = {"backbone": name, "metric": "eval_forward_imgs_per_sec_per_chip",
               "batch": args.batch, "int8": int8}
        try:
            v, _ = bench_one(name, args.batch, args.iters, int8=int8)
            rec["value"] = round(v, 1)
            print(f"| {label} | {rec['value']} |")
        except Exception as e:  # noqa: BLE001 — record per-backbone failures
            rec["error"] = f"{type(e).__name__}: {e}"
            print(f"| {label} | ERROR {rec['error'][:60]} |")
        records.append(rec)

    if args.json:
        dev = jax.devices()[0].device_kind
        with open(args.json, "w") as f:
            json.dump({"unit": "images/sec/chip", "device": dev,
                       "records": records}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
