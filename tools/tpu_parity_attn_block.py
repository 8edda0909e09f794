"""First-chip-window validation for kernels/attn_block.py on real TPU.

Run when the tunnel is back (see NOTES_NEXT_ROUND.md):

    timeout -k 10 580 python tools/tpu_parity_attn_block.py

Does three things at flagship geometry (B=64, N=197, C=768, H=12, bf16):
1. hardware parity (fwd + dx) of the fused LN1+QKV+MHA+O half-block kernel
   vs the XLA composition — catches Mosaic lowering / VMEM-overflow issues
   interpret mode cannot;
2. chained-iteration microbench of both paths (PGD-shaped fwd+dx), printed
   as one JSON line per path;
3. exits nonzero on parity failure so the A/B isn't run on a broken kernel.

If this passes, run the end-to-end A/B: BENCH_VARIANT=fusedblock python
bench.py (vs the default), and flip ViTConfig.fuse_attn_block's default /
bench config if it wins (PERF.md "Built, unmeasured" section has the
decision rule).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.kernels import (  # noqa: E402
    attn_block as kab,
)

B, N, C, H = 64, 197, 768, 12
EPS = 1e-12
ITERS = 20


def main() -> int:
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"metric": "attn_block_hw_parity", "ok": None,
                          "error": "no TPU backend — run on hardware"}))
        return 2

    @jax.jit
    def build(rng):
        r = lambda i, shape, s=1.0: (jax.random.normal(
            jax.random.fold_in(rng, i), shape) * s)
        x = r(0, (B, N, C), 1.0).astype(jnp.bfloat16)
        g = r(12, (B, N, C), 1.0).astype(jnp.bfloat16)
        ln_scale = 1.0 + 0.1 * r(1, (C,))
        ln_bias = 0.1 * r(2, (C,))
        ws = [r(3 + i, (C, C), 0.03) for i in range(4)]
        bs = [0.05 * r(7 + i, (C,)) for i in range(4)]
        return x, g, ln_scale, ln_bias, ws, bs

    x, g, ln_scale, ln_bias, ws, bs = build(jax.random.key(0))
    args = (ln_scale, ln_bias, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
            ws[3], bs[3])

    fused = jax.jit(lambda x_: kab.fused_attn_block(x_, *args, H, EPS))
    ref = jax.jit(lambda x_: kab.attn_block_reference(x_, *args, H, EPS))
    # dx through a fixed-cotangent loss: the attack-path direction
    fused_dx = jax.jit(jax.grad(
        lambda x_: jnp.sum(kab.fused_attn_block(x_, *args, H, EPS)
                           .astype(jnp.float32) * g.astype(jnp.float32))))
    ref_dx = jax.jit(jax.grad(
        lambda x_: jnp.sum(kab.attn_block_reference(x_, *args, H, EPS)
                           .astype(jnp.float32) * g.astype(jnp.float32))))

    def maxdiff(a, b):
        return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b.astype(jnp.float32))))

    d_fwd = maxdiff(fused(x), ref(x))
    d_dx = maxdiff(fused_dx(x), ref_dx(x))
    # bf16 O(1) values: the packed kernel's hardware-parity experience was
    # <=3.4e-3 fwd / <=8.2e-3 bwd (PERF.md); allow similar headroom.
    ok = d_fwd <= 2e-2 and d_dx <= 5e-2
    print(json.dumps({"metric": "attn_block_hw_parity", "fwd_maxdiff": d_fwd,
                      "dx_maxdiff": d_dx, "ok": ok}))
    if not ok:
        return 1

    def bench(step, label):
        # chained iterations + scalar fetch (axon block_until_ready no-op)
        y = step(x)
        float(jnp.sum(y.astype(jnp.float32)))  # warm/compile
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = step(0.999 * y)
        float(jnp.sum(y.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": f"attn_block_{label}_ms_per_call",
                          "value": round(1e3 * dt / ITERS, 3),
                          "unit": "ms", "batch": B}))

    bench(fused_dx, "fused_fwd_dx")
    bench(ref_dx, "xla_fwd_dx")

    # LN2-fused MLP half (kernels/mlp.py:fused_ln_mlp) — same treatment.
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.kernels import (  # noqa: E402
        mlp as km,
    )

    @jax.jit
    def build_mlp(rng):
        r = lambda i, shape, s=1.0: (jax.random.normal(
            jax.random.fold_in(rng, i), shape) * s)
        return (1.0 + 0.1 * r(0, (C,)), 0.1 * r(1, (C,)),
                r(2, (C, 4 * C), 0.03), 0.05 * r(3, (4 * C,)),
                r(4, (4 * C, C), 0.03), 0.05 * r(5, (C,)))

    margs = build_mlp(jax.random.key(1))
    mfused_dx = jax.jit(jax.grad(
        lambda x_: jnp.sum(km.fused_ln_mlp(x_, *margs, EPS)
                           .astype(jnp.float32) * g.astype(jnp.float32))))
    mref_dx = jax.jit(jax.grad(
        lambda x_: jnp.sum(km.ln_mlp_reference(x_, *margs, EPS)
                           .astype(jnp.float32) * g.astype(jnp.float32))))
    d_mfwd = maxdiff(jax.jit(lambda x_: km.fused_ln_mlp(x_, *margs, EPS))(x),
                     jax.jit(lambda x_: km.ln_mlp_reference(x_, *margs, EPS))(x))
    d_mdx = maxdiff(mfused_dx(x), mref_dx(x))
    mok = d_mfwd <= 2e-2 and d_mdx <= 5e-2
    print(json.dumps({"metric": "ln_mlp_hw_parity", "fwd_maxdiff": d_mfwd,
                      "dx_maxdiff": d_mdx, "ok": mok}))
    if not mok:
        return 1
    bench(mfused_dx, "ln_mlp_fused_fwd_dx")
    bench(mref_dx, "ln_mlp_xla_fwd_dx")
    return 0


if __name__ == "__main__":
    sys.exit(main())
