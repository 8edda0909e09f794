"""Functional Vision Transformer (ViT) — the framework's flagship backbone.

Capability parity with the reference's HF ``ViTForImageClassification``
(``google/vit-base-patch16-224``) factory (reference ``Utils.py:84-90``), but
designed TPU-first rather than translated:

* **Pure function over a param pytree.** ``init`` builds nested dicts of
  arrays; ``apply`` is jit/vmap/grad-transparent. LoRA adapters attach as
  extra leaves (see ``ops/lora.py``) — no module surgery.
* **Stacked blocks + ``lax.scan``.** All encoder blocks' params are stacked on
  a leading layer axis and the encoder is one ``scan``, so compile time is
  O(1) in depth and XLA pipelines the layer loop.
* **Patch embedding as a matmul.** The stride-16 conv is algebraically a
  reshape + dense; expressing it that way feeds the MXU directly.
* **bfloat16 compute / float32 params + accumulation** by default.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.nn import attention, dense, dense_init, gelu, layer_norm, layer_norm_init


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Static (hashable) architecture description."""

    image_size: int = 224
    patch_size: int = 16
    hidden_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 21
    layer_norm_eps: float = 1e-12  # HF ViT default
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    remat: bool = False  # rematerialize each block on the backward pass
    # Pallas whole-head-in-VMEM attention (kernels/attention.py): scores
    # never touch HBM in either direction. TPU only — leave False on CPU.
    use_fused_attention: bool = False
    # Pallas fused MLP (kernels/mlp.py): both weight matrices VMEM-resident,
    # hidden activation never touches HBM in either pass. TPU only; silently
    # falls back to the XLA composition off-TPU, when the weights exceed the
    # VMEM budget, or when the block carries an unmerged LoRA branch.
    use_fused_mlp: bool = False
    # Fully-fused attention half-block (kernels/attn_block.py): LN1 + q/k/v
    # projections + MHA + o-projection in one Pallas program per batch
    # element — h/q/k/v/attn-out never touch HBM. TPU only, engages only for
    # plain (merged / no-quant) attention denses in half-precision compute;
    # falls back to the ``use_fused_attention`` packed path otherwise.
    # Composes with ``remat`` only on hardware: interpret-mode pallas_call
    # carries an OrderedIOEffect that jax.checkpoint's partial-eval rejects,
    # so the remat+fused combination has no off-TPU test path.
    fuse_attn_block: bool = False
    # LN2-fused MLP half-block alone (kernels/mlp.py:fused_ln_mlp), without
    # the attention half. Decoupled because the two halves measured in
    # opposite directions on v5e at kernel level (tools/
    # tpu_parity_attn_block.py, round 3): fused LN-MLP fwd+dx 2.80 ms vs
    # 3.61 ms XLA (1.29x win), fused attn-block 27.2 ms vs 4.66 ms (5.8x
    # loss — its one-program-per-batch-element grid underfills the chip).
    # END-TO-END the LN-MLP fusion still LOSES ~3.6% (PGD-10 ViT-B 152.5 vs
    # 158.2 imgs/s, two runs each): inside the full unrolled program XLA
    # fuses LN2 into neighboring ops and pipelines across layers, which the
    # isolated microbench could not credit. Kept opt-in as the measured
    # record — do not enable for performance. PERF.md "Measured: the
    # fully-fused encoder block". ``fuse_attn_block`` implies this.
    fuse_ln_mlp: bool = False
    # Python-unroll the layer loop instead of lax.scan. The scan's backward
    # saves per-layer residuals via dynamic-update-slice into stacked HBM
    # buffers — profiled at ~26% of PGD runtime on v5e (round-2 trace);
    # unrolled, XLA keeps residuals as individual buffers and PGD throughput
    # jumps ~1.5x (77.9 -> 116.8 imgs/s). Costs O(depth) trace/compile time,
    # so it's off by default and on for the flagship benchmark path.
    unroll_layers: bool = False

    @property
    def num_patches(self) -> int:
        side, p = divmod(self.image_size, self.patch_size)
        if p:
            raise ValueError("image_size must be divisible by patch_size")
        return side * side

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # CLS token

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    def with_classes(self, num_classes: int) -> "ViTConfig":
        return dataclasses.replace(self, num_classes=num_classes)


VIT_B16 = ViTConfig()
VIT_TINY = ViTConfig(hidden_dim=192, depth=12, num_heads=3, mlp_dim=768)
# Miniature config for unit tests / CI: 2 layers, 32px inputs, CPU-fast.
# float32 compute: CPU has no native bf16 and parity tests want tight tolerances.
VIT_TEST = ViTConfig(image_size=32, patch_size=8, hidden_dim=64, depth=2,
                     num_heads=2, mlp_dim=128, num_classes=10,
                     compute_dtype="float32")


def _block_init(rng: jax.Array, cfg: ViTConfig, dtype) -> dict:
    rngs = jax.random.split(rng, 6)
    d, m = cfg.hidden_dim, cfg.mlp_dim
    return {
        "ln1": layer_norm_init(d, dtype=dtype),
        "attn": {
            "q": dense_init(rngs[0], d, d, dtype=dtype),
            "k": dense_init(rngs[1], d, d, dtype=dtype),
            "v": dense_init(rngs[2], d, d, dtype=dtype),
            "o": dense_init(rngs[3], d, d, dtype=dtype),
        },
        "ln2": layer_norm_init(d, dtype=dtype),
        "mlp": {
            "fc1": dense_init(rngs[4], d, m, dtype=dtype),
            "fc2": dense_init(rngs[5], m, d, dtype=dtype),
        },
    }


def init(rng: jax.Array, cfg: ViTConfig) -> dict:
    """Initialise a full parameter pytree (blocks stacked on axis 0)."""
    dtype = jnp.dtype(cfg.param_dtype)
    r_embed, r_blocks, r_head = jax.random.split(rng, 3)
    d = cfg.hidden_dim
    patch_dim = cfg.patch_size * cfg.patch_size * 3

    block_rngs = jax.random.split(r_blocks, cfg.depth)
    blocks = jax.vmap(lambda r: _block_init(r, cfg, dtype))(block_rngs)

    return {
        "embed": {
            "proj": dense_init(r_embed, patch_dim, d, dtype=dtype),
            "cls": jnp.zeros((1, 1, d), dtype),
            "pos": jax.random.normal(jax.random.fold_in(r_embed, 1),
                                     (1, cfg.seq_len, d), dtype) * 0.02,
        },
        "blocks": blocks,
        "final_ln": layer_norm_init(d, dtype=dtype),
        "head": dense_init(r_head, d, cfg.num_classes, dtype=dtype),
    }


def _patchify(cfg: ViTConfig, images: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, N, P*P*C), row-major patch pixels, channel last."""
    b, h, w, c = images.shape
    p = cfg.patch_size
    x = images.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, c)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def _encoder_block(cfg: ViTConfig, bp: dict, x: jax.Array) -> jax.Array:
    """Pre-LN transformer block: x + MHA(LN(x)), then x + MLP(LN(x))."""
    b, n, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    cd = x.dtype

    ap = bp["attn"]
    # Half-precision only: the kernel's hardware validation surface is bf16
    # (tools/tpu_parity_attn_block.py) — enforce the documented invariant
    # rather than relying on f32 happening to fail the VMEM estimate.
    if (cfg.fuse_attn_block and hd % 32 == 0
            and jnp.dtype(cd).itemsize == 2 and all(
                "lora_a" not in ap[t] and "w_q" not in ap[t]
                for t in ("q", "k", "v", "o"))):
        from ..kernels.attn_block import fits_vmem, fused_attn_block

        if jax.default_backend() == "tpu" and fits_vmem(d, nh, n, cd):
            x = x + fused_attn_block(
                x, bp["ln1"]["scale"], bp["ln1"]["bias"],
                ap["q"]["w"], ap["q"]["b"], ap["k"]["w"], ap["k"]["b"],
                ap["v"]["w"], ap["v"]["b"], ap["o"]["w"], ap["o"]["b"],
                nh, eps)
            return _mlp_half(cfg, bp, x)

    h = layer_norm(bp["ln1"], x, eps=eps)
    if cfg.use_fused_attention:
        # Packed layout: the q/k/v dense outputs (B, N, C) feed the kernel
        # directly — no reshape/transpose and no 197->256 pad/unpad pair in
        # the XLA program (round-3 trace: that interface cost ~13% of PGD
        # runtime; see kernels/attention.py packed-kernel comment).
        from ..kernels.attention import attention_packed_auto

        q = dense(bp["attn"]["q"], h, compute_dtype=cd)
        k = dense(bp["attn"]["k"], h, compute_dtype=cd)
        v = dense(bp["attn"]["v"], h, compute_dtype=cd)
        attn_out = attention_packed_auto(q, k, v, nh)
    else:
        q = dense(bp["attn"]["q"], h, compute_dtype=cd).reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        k = dense(bp["attn"]["k"], h, compute_dtype=cd).reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        v = dense(bp["attn"]["v"], h, compute_dtype=cd).reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        attn_out = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, d)
    x = x + dense(bp["attn"]["o"], attn_out, compute_dtype=cd)
    return _mlp_half(cfg, bp, x)


def _mlp_half(cfg: ViTConfig, bp: dict, x: jax.Array) -> jax.Array:
    """x + MLP(LN2(x)) — shared by both attention-path variants."""
    cd = x.dtype
    fc1, fc2 = bp["mlp"]["fc1"], bp["mlp"]["fc2"]
    # Fully-fused block mode (cfg.fuse_attn_block): fold LN2 into the MLP
    # kernel too, so the whole encoder block is two Pallas programs + two
    # residual adds. Same eligibility rules as the attention half.
    if ((cfg.fuse_attn_block or cfg.fuse_ln_mlp)
            and jnp.dtype(cd).itemsize == 2 and all(
            "lora_a" not in f and "w_q" not in f for f in (fc1, fc2))):
        from ..kernels.mlp import fits_vmem_ln, fused_ln_mlp

        if (jax.default_backend() == "tpu"
                and fits_vmem_ln(cfg.hidden_dim, cfg.mlp_dim, cd)):
            return x + fused_ln_mlp(x, bp["ln2"]["scale"], bp["ln2"]["bias"],
                                    fc1["w"], fc1["b"], fc2["w"], fc2["b"],
                                    cfg.layer_norm_eps).astype(cd)
    h = layer_norm(bp["ln2"], x, eps=cfg.layer_norm_eps)
    if (cfg.use_fused_mlp and "lora_a" not in fc1 and "lora_a" not in fc2
            and "w_q" not in fc1 and "w_q" not in fc2):
        from ..kernels.mlp import fits_vmem, fused_mlp

        if (jax.default_backend() == "tpu"
                and fits_vmem(cfg.hidden_dim, cfg.mlp_dim, cd)):
            return x + fused_mlp(h, fc1["w"], fc1["b"], fc2["w"],
                                 fc2["b"]).astype(cd)
    h = gelu(dense(bp["mlp"]["fc1"], h, compute_dtype=cd))
    x = x + dense(bp["mlp"]["fc2"], h, compute_dtype=cd)
    return x


def features(cfg: ViTConfig, params: dict, images: jax.Array) -> jax.Array:
    """Images (B, H, W, 3), normalized floats -> final-LN token features (B, N+1, D)."""
    cd = jnp.dtype(cfg.compute_dtype)
    x = _patchify(cfg, images.astype(cd))
    x = dense(params["embed"]["proj"], x, compute_dtype=cd)
    cls = jnp.broadcast_to(params["embed"]["cls"].astype(cd), (x.shape[0], 1, cfg.hidden_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["embed"]["pos"].astype(cd)

    if cfg.unroll_layers:
        block = _encoder_block
        if cfg.remat:
            block = jax.checkpoint(block, static_argnums=(0,), prevent_cse=False)
        for i in range(cfg.depth):
            bp = jax.tree.map(lambda a: a[i], params["blocks"])
            x = block(cfg, bp, x)
    else:
        block_fn = lambda carry, bp: (_encoder_block(cfg, bp, carry), None)
        if cfg.remat:
            block_fn = jax.checkpoint(block_fn, prevent_cse=False)
        x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    return layer_norm(params["final_ln"], x, eps=cfg.layer_norm_eps)


def apply(cfg: ViTConfig, params: dict, images: jax.Array) -> jax.Array:
    """Forward pass to classification logits (float32, CLS-token head)."""
    toks = features(cfg, params, images)
    logits = dense(params["head"], toks[:, 0], compute_dtype=toks.dtype,
                   accum_dtype=jnp.float32)
    return logits.astype(jnp.float32)


# LoRA target subtrees, addressed relative to the param root. Because blocks
# are stacked, one target path covers every layer at once (factors get a
# leading depth axis). These mirror the reference's PEFT targets
# query/key/value/output.dense (reference train_loras.py:79-95).
LORA_TARGETS_DEFAULT = ("blocks/attn/q", "blocks/attn/k", "blocks/attn/v", "blocks/attn/o")

# Denses carrying ~97% of encoder FLOPs — the W8A8 attack-path targets
# (ops/quant.py). Patch embed and head stay full precision (tiny FLOP share;
# the embed sits before the first LN, where per-tensor activation scales are
# least reliable).
QUANT_TARGETS_DEFAULT = ("blocks/attn/q", "blocks/attn/k", "blocks/attn/v",
                         "blocks/attn/o", "blocks/mlp/fc1", "blocks/mlp/fc2")


def lora_target_paths(targets: tuple[str, ...] = ("q", "k", "v", "o")) -> tuple[str, ...]:
    mapping = {"q": "blocks/attn/q", "k": "blocks/attn/k", "v": "blocks/attn/v",
               "o": "blocks/attn/o", "fc1": "blocks/mlp/fc1", "fc2": "blocks/mlp/fc2",
               "head": "head"}
    return tuple(mapping[t] for t in targets)
