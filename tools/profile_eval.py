"""Capture a TPU profiler trace of the eval-forward program and print a
per-fusion time table — the attribution VERDICT r3 item 9 asks for: the
eval path reads ~3100 imgs/s (~27% MFU analytic) vs the attack path's 69%,
and bench_eval.py records the number without saying whether the gap is
dispatch/tunnel overhead or a real program deficiency.

Profiles exactly bench_eval's program (argmax forward at the bench batch,
bf16 params, unrolled encoder + fused attention where supported) over a
chained multi-iteration region, so per-op device time vs wall gap is
visible: if device time per image is small and wall is large, the gap is
dispatch/tunnel; if a fusion dominates, it is the program.

Usage: python tools/profile_eval.py [--backbone google_vit] [--batch 256]
                                    [--iters 8] [--out /tmp/jax-trace-eval]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_table import print_top_ops  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/jax-trace-eval")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--table_json", default=None,
                    help="also write the top-ops table as JSON")
    ap.add_argument("--backbone", default="google_vit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import compile_cache

    compile_cache.enable()

    entry = registry.get_model(args.backbone)
    cfg = entry.config(21)
    for flag, val in (("unroll_layers", True), ("use_fused_attention", True)):
        if hasattr(cfg, flag):
            cfg = dataclasses.replace(cfg, **{flag: val})

    @jax.jit
    def build(rng):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                            entry.init(rng, cfg))

    params = build(jax.random.key(0))
    size = cfg.image_size

    @jax.jit
    def fwd_argmax(p, x):
        # bench_eval's program: normalized forward -> argmax, cast chain
        # included (images arrive as [0,1] f32)
        return jnp.argmax(entry.apply(cfg, p, x), axis=-1)

    images = jax.device_put(jax.random.uniform(
        jax.random.key(2), (args.batch, size, size, 3), jnp.float32))
    int(fwd_argmax(params, images)[0])  # compile

    # chained region: feed the previous prediction back into the pixel
    # stream so XLA cannot overlap iterations away, mirroring bench_eval's
    # timing discipline (block_until_ready is a no-op on axon)
    @jax.jit
    def chain(p, x, n_iters=args.iters):
        def body(c, _):
            pred = jnp.argmax(entry.apply(cfg, p, c), axis=-1)
            c = c + (pred[:, None, None, None] % 2).astype(c.dtype) * 1e-6
            return c, pred[0]
        c, preds = jax.lax.scan(body, x, None, length=n_iters)
        return preds

    int(chain(params, images)[0])  # compile
    t0 = time.perf_counter()
    int(chain(params, images)[-1])
    wall = time.perf_counter() - t0
    ips = args.batch * args.iters / wall
    print(f"chained eval wall: {wall*1e3:.1f} ms for {args.iters} iters "
          f"(batch {args.batch}) = {ips:.0f} imgs/s")

    with jax.profiler.trace(args.out):
        int(chain(params, images)[-1])

    print_top_ops(args.out, args.top, json_out=args.table_json)


if __name__ == "__main__":
    main()
