"""Capture a TPU profiler trace of a flagship TRAIN step and print a
per-fusion time table.

Motivation: TRAIN_r03 measured the rank-8 LoRA step at 436.9 imgs/s vs the
FULL fine-tune step's 526.2 — inverted from the FLOP accounting (LoRA skips
every base-weight-grad matmul, ~88 vs ~128 GF/img). This traces the exact
program tools/bench_train.py times (same builder) so the overhead — suspect:
48 per-target PEFT-dropout bernoulli masks over (B,197,768) per step — is
attributed, not guessed.

Usage: python tools/profile_train.py [--mode lora] [--batch 64]
       [--out /tmp/jax-trace-train] [--top 25]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_train import build_step  # noqa: E402
from trace_table import print_top_ops  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="lora", choices=["full", "lora"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="/tmp/jax-trace-train")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--table_json", default=None,
                    help="also write the top-ops table as JSON")
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--fused-block", action="store_true")
    args = ap.parse_args()

    import jax

    built = build_step(args.mode, args.batch, not args.no_augment,
                       fused_block=args.fused_block)
    step, state = built["step"], built["state"]
    images, labels, valid = built["images"], built["labels"], built["valid"]

    state, m = step(state, images, labels, valid)  # compile + warmup
    float(m["loss_sum"])

    with jax.profiler.trace(args.out):
        state, m = step(state, images, labels, valid)
        float(m["loss_sum"])

    print_top_ops(args.out, args.top, json_out=args.table_json)


if __name__ == "__main__":
    main()
