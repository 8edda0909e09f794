"""Composability-matrix stage A/B: host-merged vs device-merged variants.

VERDICT r4 weak #7: ``eval/compose.py``'s variant sweep was host-sequential —
per variant, an eager ``lora.merge_many`` (~4 dispatches per target per
adapter through the remote-device tunnel) + head upload + ``device_put``.
``make_device_variant_builder`` replaces that with one jitted program per
combo size over device-resident base/adapters. This tool measures BOTH modes
at the reference's matrix scale (5 attacks -> 27 variants, eval_compose.py:
275-433 "HOT LOOP #6" enumerates 16 with four) on synthetic data, isolating

  * variant-BUILD wall: 27x merged-weight construction alone, and
  * full MATRIX wall: 27 variants x D datasets through the shared eval step

so the artifact decides "win" or "documented-negative" with data.

Usage: python tools/bench_compose.py [--json COMPOSE_AB_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--platform=cpu" in sys.argv or "cpu" in [
        sys.argv[i + 1] for i, a in enumerate(sys.argv[:-1])
        if a == "--platform"]:
    # sitecustomize force-sets jax_platforms (axon first); the env var is
    # ignored — only the config update after the jax import works
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Batch
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.eval import compose
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import compile_cache

compile_cache.enable()

ATTACKS = ("fgsm", "pgd", "autoattack", "patch", "rp2")


class ArrayLoader:
    """Minimal in-memory loader: pre-batched uint8 arrays -> Batch stream."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch: int):
        self.batches = []
        for i in range(0, len(labels), batch):
            ib, lb = images[i:i + batch], labels[i:i + batch]
            self.batches.append(Batch(
                images=ib, labels=lb.astype(np.int32),
                valid=np.ones(len(lb), np.float32),
                filenames=[f"s{i + j}.png" for j in range(len(lb))]))

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def fetch_scalar(tree) -> float:
    """Force completion through the tunnel (block_until_ready is a no-op on
    axon): fetch one scalar that depends on a merged kernel."""
    leaf = tree["blocks"]["attn"]["q"]["w"] if "blocks" in tree else \
        next(iter(jax.tree.leaves(tree)))
    return float(jnp.sum(leaf[..., 0, :1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", choices=("default", "cpu"), default="default")
    ap.add_argument("--model", default="google_vit")
    ap.add_argument("--classes", type=int, default=21)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n_per_dataset", type=int, default=192)
    ap.add_argument("--datasets", type=int, default=6)
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the backbone geometry (CPU smoke)")
    args = ap.parse_args()

    entry = registry.get_model(args.model)
    cfg = entry.config(args.classes)
    if args.tiny:
        import dataclasses
        cfg = dataclasses.replace(cfg, image_size=32, patch_size=8,
                                  hidden_dim=64, depth=2, num_heads=2,
                                  mlp_dim=128)
    params = jax.device_get(entry.init(jax.random.key(0), cfg))
    targets = entry.lora_targets(cfg) + ("blocks/mlp/fc2",) \
        if "blocks/mlp/fc2" not in entry.lora_targets(cfg) \
        else entry.lora_targets(cfg)
    lcfg = lora.LoRAConfig(rank=args.rank, alpha=16.0, dropout=0.0,
                           targets=tuple(targets))

    adapters = {}
    for i, name in enumerate(ATTACKS):
        ad = jax.device_get(lora.init(jax.random.key(10 + i), params, lcfg))
        # non-zero B so merges change weights; distinct per-attack head
        ad = jax.tree.map(lambda a: a + 0.01 * (i + 1), ad)
        head = {"w": np.asarray(params["head"]["w"]) * (1 + 0.01 * i),
                "b": np.asarray(params["head"]["b"])}
        adapters[name] = (ad, lcfg, head)

    rng = np.random.default_rng(7)
    loaders = {}
    for d in range(args.datasets):
        imgs = rng.integers(0, 256, (args.n_per_dataset, cfg.image_size,
                                     cfg.image_size, 3), dtype=np.uint8)
        labels = rng.integers(0, args.classes, args.n_per_dataset)
        loaders["clean" if d == 0 else ATTACKS[d - 1]] = ArrayLoader(
            imgs, labels, args.batch)

    variants = compose.enumerate_variants(ATTACKS)
    n_imgs = len(variants) * args.datasets * args.n_per_dataset
    print(f"{len(variants)} variants x {args.datasets} datasets "
          f"x {args.n_per_dataset} imgs")

    # --- phase 1: variant BUILD wall, both modes (27 merged-weight builds)
    def time_build(mode: str) -> float:
        if mode == "device":
            builder = compose.make_device_variant_builder(params, adapters)
            for _, combo in variants:  # compile warmup (cached per combo size)
                fetch_scalar(builder(combo))
        t0 = time.perf_counter()
        for _, combo in variants:
            if mode == "device":
                p = builder(combo)
            else:
                p = jax.device_put(
                    compose.build_variant_params(params, combo, adapters))
            fetch_scalar(p)
        return time.perf_counter() - t0

    build_host = time_build("host")
    build_device = time_build("device")
    print(f"variant build x{len(variants)}: host {build_host:.2f}s  "
          f"device {build_device:.2f}s")

    # --- phase 2: full matrix wall, both modes (shared eval-step compile:
    # run device mode once untimed to warm, then time each mode)
    def run_matrix(device_merge: bool) -> float:
        t0 = time.perf_counter()
        compose.run_composability_eval(
            entry, params, adapters, loaders, args.classes, cfg=cfg,
            device_merge=device_merge, log=lambda *_: None)
        return time.perf_counter() - t0

    run_matrix(True)  # warm eval-step + merge compiles
    matrix_device = run_matrix(True)
    matrix_host = run_matrix(False)
    print(f"matrix wall: host-merge {matrix_host:.1f}s "
          f"({n_imgs / matrix_host:.0f} imgs/s)  device-merge "
          f"{matrix_device:.1f}s ({n_imgs / matrix_device:.0f} imgs/s)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "device": jax.devices()[0].device_kind,
                "variants": len(variants), "datasets": args.datasets,
                "n_per_dataset": args.n_per_dataset, "batch": args.batch,
                "build_wall_s": {"host": round(build_host, 3),
                                 "device": round(build_device, 3)},
                "matrix_wall_s": {"host": round(matrix_host, 2),
                                  "device": round(matrix_device, 2)},
                "matrix_imgs_per_s": {
                    "host": round(n_imgs / matrix_host, 1),
                    "device": round(n_imgs / matrix_device, 1)},
            }, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
