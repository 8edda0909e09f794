"""Primitive neural-net ops over plain param dicts.

Every model in ``models/`` is a pure function over nested dicts built from
these primitives. The central design point is :func:`dense`: a linear layer's
param dict may *optionally* carry low-rank adapter factors (``lora_a``,
``lora_b``, ``lora_s``) injected by :mod:`..ops.lora`. When present, the layer
computes ``x @ W + s * (x @ A) @ B`` — the unmerged LoRA path — so adapter
support is uniform across all backbones without any model knowing about LoRA.

All matmuls run in a configurable compute dtype (bfloat16 on TPU so they tile
onto the MXU) with float32 accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp

Params = Mapping[str, Any]


def dense_init(rng: jax.Array, in_dim: int, out_dim: int, *, dtype=jnp.float32,
               stddev: Optional[float] = None) -> dict:
    """Truncated-normal kernel (LeCun-ish) + zero bias, stored as ``(in, out)``."""
    if stddev is None:
        stddev = (1.0 / in_dim) ** 0.5
    w = jax.random.truncated_normal(rng, -2.0, 2.0, (in_dim, out_dim), dtype) * stddev
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def dense(p: Params, x: jax.Array, *, compute_dtype=None, accum_dtype=jnp.float32) -> jax.Array:
    """Linear layer ``x @ W + b`` with the optional unmerged-LoRA branch.

    ``x``: ``(..., in_dim)``. Param dict keys:
      * ``w``: ``(in_dim, out_dim)``, ``b``: ``(out_dim,)`` (optional)
      * ``lora_a``: ``(in_dim, r)``, ``lora_b``: ``(r, out_dim)``,
        ``lora_s``: scalar ``alpha / r`` — optional, see ``ops/lora.py``.
    """
    cd = compute_dtype or x.dtype
    if "w_q" in p:
        # W8A8 attack-time path (ops/quant.py): both matmul operands int8 on
        # the double-rate MXU. Mirrors the lora_a dispatch below — the model
        # code never knows which precision its denses run at.
        from .quant import int8_matmul

        y = int8_matmul(x.astype(cd), p["w_q"], p["w_s"]).astype(accum_dtype)
        if "b" in p:
            y = y + p["b"].astype(accum_dtype)
        return y.astype(cd)
    w = p["w"]
    y = jnp.dot(x.astype(cd), w.astype(cd), preferred_element_type=accum_dtype)
    if "lora_a" in p:
        a = p["lora_a"].astype(cd)
        b = p["lora_b"].astype(cd)
        xb = x
        if "lora_rng" in p:
            # PEFT lora_dropout: inverted dropout on the adapter-branch input
            # only (the frozen W path sees undropped x). Keys/rates are leaves
            # inserted by ops.lora.attach(dropout_rng=...), training form
            # only. Hardware-RNG masks (not threefry): threefry mask
            # generation cost ~30 of 86 ms per ViT-B LoRA step (PERF.md
            # "LoRA dropout masks") — see _rbg_dropout_scale.
            xb = x * _rbg_dropout_scale(p["lora_rng"], p["lora_p"],
                                        x.shape).astype(x.dtype)
        xa = jnp.dot(xb.astype(cd), a, preferred_element_type=accum_dtype)
        if "lora_rng_pa" in p:
            # POST-SPLIT dropout (ops/lora.py dropout_mode="post_a"): the
            # Bernoulli mask applies to the rank-r projection x@A instead of
            # the C-dim input — the mask tensor shrinks C/r-fold (96x for
            # ViT-B rank 8) and the A-matmul reads clean x, so q/k/v adapter
            # contractions no longer each materialize a masked (B, N, C)
            # copy (r3 trace: the LoRA-vs-full MFU gap's named blocker).
            # DOCUMENTED DIVERGENCE from PEFT's lora_dropout placement: both
            # are unbiased (E[y] identical); the regularization noise lands
            # on the low-rank subspace instead of the input pixels of it.
            # Opt-in; the default "input" mode keeps PEFT-exact placement.
            xa = xa * _rbg_dropout_scale(p["lora_rng_pa"], p["lora_p"],
                                         xa.shape).astype(accum_dtype)
        y = y + p["lora_s"].astype(accum_dtype) * jnp.dot(
            xa.astype(cd), b, preferred_element_type=accum_dtype
        )
    if "b" in p:
        y = y + p["b"].astype(accum_dtype)
    return y.astype(cd)


def _rbg_dropout_scale(rng_leaf, p_leaf, shape):
    """Inverted-dropout multiplier (mask / keep_q) from the backend's native
    counter-based generator (``lax.rng_bit_generator`` — the hardware RNG on
    TPU). The keep probability is quantized to a multiple of 2^-16
    (|error| <= 7.7e-6) and the inverted scale divides by the QUANTIZED
    keep, so the expectation is exact. Streams are seeded from a threefry
    key leaf: independent across targets, deterministic per (seed, step) on
    a given backend; unlike threefry, bit streams are not guaranteed
    identical across backends/XLA versions — a non-issue for dropout."""
    keep = 1.0 - p_leaf
    kd = jax.random.key_data(rng_leaf).astype(jnp.uint32).reshape(-1)
    state = jnp.concatenate([kd, kd ^ jnp.uint32(0x9E3779B9)])
    bits = jax.lax.rng_bit_generator(state, shape, dtype=jnp.uint32)[1]
    thresh = jnp.round(keep * 65536.0).astype(jnp.uint32)
    keep_q = thresh.astype(jnp.float32) * (1.0 / 65536.0)
    mask = (bits >> jnp.uint32(16)) < thresh
    return mask / keep_q


def layer_norm_init(dim: int, *, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x: jax.Array, *, eps: float = 1e-6) -> jax.Array:
    """LayerNorm in float32 for numerical stability, cast back to input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — matches the reference backbones' torch ``nn.GELU``."""
    return jax.nn.gelu(x, approximate=False)


def attention(q: jax.Array, k: jax.Array, v: jax.Array, *, accum_dtype=jnp.float32) -> jax.Array:
    """Multi-head scaled dot-product attention.

    ``q, k, v``: ``(batch, heads, seq, head_dim)``. Softmax runs in float32.
    Sequence length for the 224px backbones is tiny (<=197 tokens), so the
    full ``(seq, seq)`` score matrix is the right TPU strategy — no flash /
    blockwise machinery needed (SURVEY.md §5 long-context entry).
    """
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    # scores are STORED in the input dtype (bf16 on TPU halves the dominant
    # HBM tensor); softmax math stays float32 — identical path for f32 inputs
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=accum_dtype).astype(q.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                     preferred_element_type=accum_dtype)
    return out.astype(q.dtype)
