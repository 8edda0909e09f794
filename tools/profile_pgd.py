"""Capture a TPU profiler trace of the headline PGD program and print a
per-fusion time table.

``jax.profiler.trace`` works on the axon backend (verified round 2); the
trace lands in ``--out`` (xplane + trace.json.gz) and the table below is the
round-trip-free way to see where PGD time goes (it found the scan
residual-save dynamic-update-slices costing 26% of runtime in round 1's
configuration).

Usage: python tools/profile_pgd.py [--out /tmp/jax-trace] [--scan] [--batch 64]
                                   [--backbone google_vit|swin|convnext|...]

``--backbone`` profiles any zoo member under the same PGD program and flag
set as ``tools/bench_zoo.py`` (unroll_layers on; fused attention where the
config supports it) — round-3 use: attribute ConvNeXt-B's ~15% MFU.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_table import print_top_ops  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/jax-trace")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--scan", action="store_true",
                    help="profile the lax.scan encoder instead of unrolled")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--table_json", default=None,
                    help="also write the top-ops table as JSON")
    ap.add_argument("--backbone", default="google_vit",
                    help="zoo registry name (same flag set as bench_zoo)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import compile_cache

    compile_cache.enable()

    entry = registry.get_model(args.backbone)
    cfg = entry.config(21)
    for flag, val in (("unroll_layers", not args.scan),
                      ("use_fused_attention", True)):
        if hasattr(cfg, flag):
            cfg = dataclasses.replace(cfg, **{flag: val})

    @jax.jit
    def build(rng):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                            entry.init(rng, cfg))

    params = build(jax.random.key(0))
    size = cfg.image_size
    images = jax.device_put(jax.random.uniform(
        jax.random.key(2), (args.batch, size, size, 3), jnp.float32))
    labels = jax.device_put(jax.random.randint(
        jax.random.key(3), (args.batch,), 0, cfg.num_classes))
    run = whitebox.make_pgd(entry.apply, cfg, eps=8 / 255, alpha=3 / 255,
                            steps=args.steps)
    float(jnp.sum(run(params, images, labels, jax.random.key(0))))  # compile

    with jax.profiler.trace(args.out):
        float(jnp.sum(run(params, images, labels, jax.random.key(1))))

    print_top_ops(args.out, args.top, json_out=args.table_json)


if __name__ == "__main__":
    main()
