"""Train-step throughput bench — the L3/L5 hot loops on real TPU.

BENCH/ZOO cover the attack (PGD) and eval paths; this measures the two
TRAINING programs the framework ships (reference train.py / train_loras.py
capabilities) at flagship configuration:

* ``full``  — ViT-B/16 full fine-tune step: AdamW+StepLR, on-device
  augmentation, donated TrainState (train/steps.make_train_step, exactly as
  ``train_base_model`` builds it).
* ``lora``  — rank-8 LoRA adapter step: frozen bf16 base threaded through
  jit as an argument, PEFT-semantics dropout, Adam (exactly as
  ``train_lora_adapter`` builds it).

Methodology matches bench.py: programs are warmed once, then ITERS steps are
CHAINED through the donated state and ONE scalar that data-depends on every
step (the final loss_sum) is fetched — remote/async backends can no-op
``block_until_ready`` but cannot fake a dependent scalar fetch.

MFU is ANALYTIC-ESTIMATE ONLY (documented, not a measurement): per-image
forward ~42 GF (bench.py accounting); full fine-tune backward adds dx (~44)
+ dW (~= forward matmul FLOPs ~42) => ~128 GF/img; LoRA training computes dx
through the whole net but dW only for rank-8 adapters => ~88 GF/img.

Usage:  python tools/bench_train.py [--json TRAIN_r03.json]
        [--modes full lora] [--batch 64] [--iters 8] [--no-augment]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_TFLOPS = 197.0  # bf16
GF_PER_IMG = {"full": 128.0, "lora": 88.0, "lora_pa": 88.0}  # analytic, see docstring


def build_step(mode: str, batch: int, augment: bool,
               tiny: bool = False, fused_block: bool = False) -> dict:
    """Build the flagship train step exactly as the bench times it.

    Returns ``{"step", "state", "images", "labels", "valid", "model"}`` so
    the profiler (tools/profile_train.py) traces the identical program.
    """
    import jax

    if tiny:  # CPU smoke: the env's sitecustomize pins jax_platforms=axon,cpu
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks.common import IMAGENET
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.augment import train_augment
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import optim
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import compile_cache

    compile_cache.enable()
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train.steps import (
        TrainState, make_train_step)

    if tiny:  # CPU smoke of the plumbing (``--tiny``): vit_test at 32 px
        cfg = vit.VIT_TEST.with_classes(5)
        model = "vit_test"
    else:
        cfg = dataclasses.replace(vit.VIT_B16.with_classes(21),
                                  use_fused_attention=True,
                                  unroll_layers=True,
                                  fuse_attn_block=fused_block)
        model = "vitb"
    size = cfg.image_size

    @jax.jit
    def build(rng):
        return vit.init(rng, cfg)

    rng = jax.random.key(0)
    params = build(rng)
    aug = train_augment if augment else None
    step_rng = jax.random.fold_in(rng, 17)

    if mode == "full":
        tx = optim.adamw_steplr(1e-4, weight_decay=1e-4, step_size_epochs=20,
                                gamma=0.1, steps_per_epoch=100)
        forward = lambda p, x, r=None: vit.apply(cfg, p, x)
        step = make_train_step(forward, tx, normalize=IMAGENET,
                               step_rng=step_rng if augment else None,
                               augment=aug)
        state = TrainState.create(params, tx)
    elif mode in ("lora", "lora_pa"):
        # lora_pa: post-split dropout placement (ops/lora.py
        # dropout_mode="post_a") — the r4 candidate for the LoRA-step MFU
        # gap (VERDICT r3 item 5); A/B against PEFT-exact "lora"
        lcfg = lora.LoRAConfig(rank=8, alpha=16.0, dropout=0.1,
                               targets=vit.LORA_TARGETS_DEFAULT,
                               dropout_mode=("post_a" if mode == "lora_pa"
                                             else "input"))
        base = jax.jit(lambda p: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), p))(params)
        adapter = jax.jit(lambda r: lora.init(r, params, lcfg))(
            jax.random.fold_in(rng, 1))

        def forward(frozen, trainable, x, drop_rng=None):
            p = lora.attach(frozen, trainable["adapter"], lcfg,
                            dropout_rng=drop_rng)
            return vit.apply(cfg, p, x)

        tx = optim.lora_adam(1e-4)
        step = make_train_step(forward, tx, normalize=IMAGENET,
                               step_rng=step_rng, augment=aug, frozen=base)
        state = TrainState.create({"adapter": adapter}, tx)
    else:
        raise ValueError(mode)

    images = jax.device_put(jax.random.uniform(
        jax.random.fold_in(rng, 2), (batch, size, size, 3), jnp.float32))
    labels = jax.device_put(jax.random.randint(
        jax.random.fold_in(rng, 3), (batch,), 0, cfg.num_classes))
    valid = jax.device_put(jnp.ones((batch,), jnp.float32))
    return {"step": step, "state": state, "images": images, "labels": labels,
            "valid": valid, "model": model}


def bench_mode(mode: str, batch: int, iters: int, augment: bool,
               tiny: bool = False, fused_block: bool = False) -> dict:
    import jax

    built = build_step(mode, batch, augment, tiny=tiny, fused_block=fused_block)
    step, state = built["step"], built["state"]
    images, labels, valid = built["images"], built["labels"], built["valid"]
    model = built["model"]

    state, m = step(state, images, labels, valid)  # compile + warmup
    float(m["loss_sum"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, images, labels, valid)
    float(m["loss_sum"])  # depends on the final params -> on every step
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    mfu = ips * GF_PER_IMG[mode] * 1e-3 / V5E_PEAK_TFLOPS
    return {
        "metric": f"train_step_images_per_sec_per_chip_{model}_{mode}",
        "device_kind": jax.devices()[0].device_kind,
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "batch": batch,
        "augment": augment,
        # the analytic MFU is against the v5e bf16 peak — meaningless for
        # the --tiny CPU smoke, so omitted there
        "mfu_pct_analytic": None if tiny else round(100 * mfu, 1),
        # what the flag ACTUALLY engaged for this mode: --tiny ignores it
        # (cfg built without the flag); lora mode fuses only the MLP half
        # (adapter leaves on q/k/v/o disable attn_block per-dense)
        "fused_block": fused_block and not tiny,
        "fused_block_scope": (
            "none" if (not fused_block or tiny)
            else "mlp_half_only" if mode.startswith("lora")
            else "both_halves"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--modes", nargs="+", default=["full", "lora"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="vit_test/32px CPU smoke of the plumbing")
    ap.add_argument("--fused-block", action="store_true",
                    help="fully-fused encoder block for the train A/B "
                         "(weight grads via the VJP rule's XLA recompute — "
                         "remat-like). In lora mode only the LN2+MLP half "
                         "engages: the attention denses carry adapter "
                         "leaves, which disable attn_block per-dense, but "
                         "fc1/fc2 are plain and fused_ln_mlp still runs — "
                         "recorded per-mode in fused_block_scope")
    args = ap.parse_args()

    records = []
    for mode in args.modes:
        rec = bench_mode(mode, args.batch, args.iters, not args.no_augment,
                         tiny=args.tiny, fused_block=args.fused_block)
        print(json.dumps(rec), flush=True)
        records.append(rec)

    if args.json:
        with open(args.json, "w") as f:
            # device comes from the records (real device_kind, not assumed)
            json.dump({"unit": "images/sec/chip",
                       "device": records[0]["device_kind"] if records else None,
                       "records": records}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
