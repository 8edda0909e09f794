"""Capture a TPU profiler trace of the headline PGD program and print a
per-fusion time table.

``jax.profiler.trace`` works on the axon backend (verified round 2); the
trace lands in ``--out`` (xplane + trace.json.gz) and the table below is the
round-trip-free way to see where PGD time goes (it found the scan
residual-save dynamic-update-slices costing 26% of runtime in round 1's
configuration).

Usage: python tools/profile_pgd.py [--out /tmp/jax-trace] [--scan] [--batch 64]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit

    cfg = dataclasses.replace(vit.VIT_B16.with_classes(21),
                              use_fused_attention=True,
                              unroll_layers=not args.scan)

    @jax.jit
    def build(rng):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                            vit.init(rng, cfg))

    params = build(jax.random.key(0))
    images = jax.device_put(jax.random.uniform(
        jax.random.key(2), (args.batch, 224, 224, 3), jnp.float32))
    labels = jax.device_put(jax.random.randint(
        jax.random.key(3), (args.batch,), 0, cfg.num_classes))
    run = whitebox.make_pgd(vit.apply, cfg, eps=8 / 255, alpha=3 / 255,
                            steps=args.steps)
    float(jnp.sum(run(params, images, labels, jax.random.key(0))))  # compile

    with jax.profiler.trace(args.out):
        float(jnp.sum(run(params, images, labels, jax.random.key(1))))

    print_top_ops(args.out, args.top)


if __name__ == "__main__":
    main()
