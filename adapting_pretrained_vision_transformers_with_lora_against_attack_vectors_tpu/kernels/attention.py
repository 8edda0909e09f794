"""Fused multi-head attention Pallas kernel (forward + custom VJP).

ViT sequence lengths are tiny (197 tokens at 224px), so the right TPU
strategy is not blockwise-streaming flash attention but **whole-head
residency**: one grid program per (batch, head) computes the entire
attention — scores, softmax, weighted sum — in VMEM. The (N, N) float32
score matrix never touches HBM, in either direction:

* forward traffic per head: Q,K,V in + O out (~4·N·D·2B) versus the XLA
  composition's extra ~2·N²·4B score/prob round trip;
* backward recomputes the probabilities in-VMEM from Q,K,V (flash-style
  rematerialization) and emits dQ,dK,dV in one kernel — the probs are never
  stored between passes.

Numerics: scores and softmax in float32 (max-subtracted), matmuls on the
MXU with float32 accumulation — same math as ``ops.nn.attention``, which
remains the reference implementation and the CPU/interpret fallback.

Sequence padding to the 128-lane tile is handled inside the kernel with an
additive key mask, so callers pass the raw (B, H, N, D) tensors.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import round_up


# Heads per grid program: amortizes per-program overhead with batched
# dot_generals. Swept on v5e at ViT-B PGD shapes: 12 > 6 > 4 > 1 heads/block
# (82.7 vs 78.3 imgs/s end-to-end at 12); 24+ exceeds VMEM at n_pad=256.
_HEADS_PER_BLOCK = 12


def _softmax_probs(q, k, *, n_real: int, scale: float):
    """(HB, Nq, Nk) float32 probabilities with key-padding mask."""
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    np_ = s.shape[-1]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, np_), 2)
    s = jnp.where(key_ids < n_real, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, n_real: int, scale: float):
    q = q_ref[...]  # (HB, Np, D)
    k = k_ref[...]
    v = v_ref[...]
    p = _softmax_probs(q, k, n_real=n_real, scale=scale)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                n_real: int, scale: float):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]

    p = _softmax_probs(q, k, n_real=n_real, scale=scale)  # (HB, Nq, Nk) f32
    p_lp = p.astype(v.dtype)
    # dV = P^T dO
    dv = jax.lax.dot_general(p_lp, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # dP = dO V^T ; dS = P * (dP - rowsum(dP * P))
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - row)) * scale  # fold the score scale here
    ds_lp = ds.astype(q.dtype)
    # dQ = dS K ; dK = dS^T Q
    dq = jax.lax.dot_general(ds_lp, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds_lp, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)

    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _pad_seq(x: jax.Array, n_pad: int) -> jax.Array:
    n = x.shape[2]
    if n == n_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Pallas fused MHA: ``softmax(q k^T / sqrt(d)) v``.

    ``q, k, v``: (batch, heads, seq, head_dim); returns the same shape.
    Drop-in for ``ops.nn.attention`` on TPU (see ``models.vit`` config flag
    ``use_fused_attention``).
    """
    return _attention_fwd_impl(q, k, v)


def _attention_call(kernel, out_shapes, inputs, n_real: int, scale: float):
    b, h, n_pad, d = inputs[0].shape
    total = b * h
    hb = next(c for c in (_HEADS_PER_BLOCK, 8, 6, 4, 2, 1)
              if total % c == 0)
    grid = (total // hb,)

    def spec():
        return pl.BlockSpec((hb, n_pad, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    flat = [x.reshape(total, n_pad, d) for x in inputs]
    out = pl.pallas_call(
        functools.partial(kernel, n_real=n_real, scale=scale),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[spec() for _ in flat],
        out_specs=(tuple(spec() for _ in out_shapes)
                   if isinstance(out_shapes, (list, tuple)) else spec()),
    )(*flat)
    return out


def _attention_fwd_impl(q, k, v):
    b, h, n, d = q.shape
    scale = d ** -0.5
    n_pad = round_up(n, 128)
    qp, kp, vp = (_pad_seq(x, n_pad) for x in (q, k, v))
    o = _attention_call(
        _fwd_kernel,
        jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        [qp, kp, vp], n, scale)
    return o.reshape(b, h, n_pad, d)[:, :, :n, :]


def _fwd_rule(q, k, v):
    return _attention_fwd_impl(q, k, v), (q, k, v)


def _bwd_rule(res, g):
    q, k, v = res
    b, h, n, d = q.shape
    scale = d ** -0.5
    n_pad = round_up(n, 128)
    qp, kp, vp, gp = (_pad_seq(x, n_pad) for x in (q, k, v, g))
    shapes = tuple(jax.ShapeDtypeStruct((b * h, n_pad, d), t.dtype)
                   for t in (q, k, v))
    dq, dk, dv = _attention_call(_bwd_kernel, shapes, [qp, kp, vp, gp],
                                 n, scale)
    unpad = lambda x: x.reshape(b, h, n_pad, d)[:, :, :n, :]
    return unpad(dq), unpad(dk), unpad(dv)


fused_attention.defvjp(_fwd_rule, _bwd_rule)


def attention_reference(q, k, v):
    """The XLA-composed reference (same numerics) for parity tests."""
    from ..ops.nn import attention

    return attention(q, k, v)


def attention_auto(q, k, v):
    """Backend-aware dispatch: the Pallas kernel on TPU, the XLA composition
    everywhere else (Mosaic won't lower off-TPU outside interpret mode).
    The backend is a trace-time global, so this costs nothing under jit."""
    if jax.default_backend() == "tpu":
        return fused_attention(q, k, v)
    return attention_reference(q, k, v)
