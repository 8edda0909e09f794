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
remains the reference implementation and the CPU/interpret fallback, with
ONE deliberate deviation: ``ops.nn.attention`` rounds the stored scores to
the input dtype before the f32 softmax (halving its dominant HBM tensor —
an XLA-path tradeoff), while here scores never leave VMEM so they stay f32
end-to-end. Identical for f32 inputs; at bf16 the kernel is the *more*
accurate path and probabilities differ from the fallback by up to ~1 bf16
ulp (~0.4%) — pinned by the bf16 parity tests' tolerances
(tests/test_native_kernels.py).

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


def _attn_bwd_core(p, q, k, v, do, scale: float):
    """Softmax-attention VJP on (G, N, hd)-batched operands, f32 accumulate.

    ``p``: f32 probabilities; ``q``/``k``/``v``/``do``: compute-dtype stacks.
    Returns ``(dq, dk, dv)`` in f32 (callers cast to their output refs).
    ONE copy of the dV = P^T dO / dS = P(dP - rowsum(dP*P))*scale / dQ = dS K
    / dK = dS^T Q chain, shared by the whole-head and packed backward kernels
    here and by ``attn_block``'s fused half-block backward.
    """
    p_lp = p.astype(v.dtype)
    dv = jax.lax.dot_general(p_lp, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - row)) * scale  # fold the score scale here
    ds_lp = ds.astype(q.dtype)
    dq = jax.lax.dot_general(ds_lp, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds_lp, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    return dq, dk, dv


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
    dq, dk, dv = _attn_bwd_core(p, q, k, v, do, scale)

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


# --- packed-layout kernel (round 3) -----------------------------------------
#
# The original kernel takes (B, H, N, D) operands, which forces the caller
# through reshape + transpose and the kernel wrapper through pad(197->256) +
# unpad-slice around every layer. The round-3 PGD trace priced that
# interface at ~13% of END-TO-END runtime (pad 32+13 ms, slice 21 ms, layout
# copies inside "data formatting" 37 ms, of 540 ms total). This variant
# consumes the q/k/v DENSE OUTPUTS directly — (B, N, C) with heads as
# contiguous 64-channel slices — so none of those ops exist at the XLA
# level: the grid is (batch,), each program loads one batch element's
# (N, C) q/k/v, builds per-head operands by channel slicing (the lane dim
# cannot be reshaped in Mosaic — same pattern as kernels/window_attention),
# and writes the (N, C) output that feeds the o-projection dense unchanged.
# Sequence stays at its logical length (197): Mosaic masks the internal
# lane/sublane padding, which the parity test pins against the XLA path.


def _head_stack(x, heads: int, hd: int):
    """(N, C) -> (heads, N, hd) by channel slicing (no minor-dim reshape)."""
    parts = [x[:, h * hd:(h + 1) * hd] for h in range(heads)]
    return jnp.concatenate([p[None] for p in parts], axis=0)


def _head_concat(x):
    """(heads, N, hd) -> (N, heads*hd) via channel concatenation."""
    return jnp.concatenate([x[h] for h in range(x.shape[0])], axis=-1)


def _packed_probs(q_ref, k_ref, *, heads: int, scale: float):
    hd = q_ref.shape[-1] // heads
    q = _head_stack(q_ref[0], heads, hd)
    k = _head_stack(k_ref[0], heads, hd)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True), q, k, hd


def _packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    p, _, _, hd = _packed_probs(q_ref, k_ref, heads=heads, scale=scale)
    v = _head_stack(v_ref[0], heads, hd)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = _head_concat(o.astype(o_ref.dtype))


def _packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                       heads: int, scale: float):
    p, q, k, hd = _packed_probs(q_ref, k_ref, heads=heads, scale=scale)
    v = _head_stack(v_ref[0], heads, hd)
    do = _head_stack(do_ref[0], heads, hd)

    dq, dk, dv = _attn_bwd_core(p, q, k, v, do, scale)
    dq_ref[0] = _head_concat(dq.astype(dq_ref.dtype))
    dk_ref[0] = _head_concat(dk.astype(dk_ref.dtype))
    dv_ref[0] = _head_concat(dv.astype(dv_ref.dtype))


def _packed_call(kernel, out_shapes, inputs, heads: int, scale: float):
    b, n, c = inputs[0].shape

    def spec():
        return pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(kernel, heads=heads, scale=scale),
        out_shape=out_shapes,
        grid=(b,),
        in_specs=[spec() for _ in inputs],
        out_specs=(tuple(spec() for _ in out_shapes)
                   if isinstance(out_shapes, (list, tuple)) else spec()),
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           heads: int) -> jax.Array:
    """Pallas MHA over packed (batch, seq, heads*head_dim) operands.

    Drop-in for the reshape/transpose + ``fused_attention`` + untranspose
    composition; the layout ops and the 197->256 pad/unpad pair disappear
    from the XLA program entirely.
    """
    scale = (q.shape[-1] // heads) ** -0.5
    return _packed_call(
        _packed_fwd_kernel, jax.ShapeDtypeStruct(q.shape, q.dtype),
        [q, k, v], heads, scale)


def _packed_fwd_rule(q, k, v, heads):
    return fused_attention_packed(q, k, v, heads), (q, k, v)


def _packed_bwd_rule(heads, res, g):
    q, k, v = res
    scale = (q.shape[-1] // heads) ** -0.5
    shapes = tuple(jax.ShapeDtypeStruct(t.shape, t.dtype) for t in (q, k, v))
    dq, dk, dv = _packed_call(_packed_bwd_kernel, shapes, [q, k, v, g],
                              heads, scale)
    return dq, dk, dv


fused_attention_packed.defvjp(_packed_fwd_rule, _packed_bwd_rule)


def attention_packed_reference(q, k, v, heads: int):
    """XLA composition of the packed layout (parity / CPU fallback)."""
    b, n, c = q.shape
    hd = c // heads
    split = lambda x: x.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    o = attention_reference(split(q), split(k), split(v))
    return o.transpose(0, 2, 1, 3).reshape(b, n, c)


def attention_packed_auto(q, k, v, heads: int):
    """Backend-aware dispatch for the packed layout (TPU kernel vs XLA)."""
    if jax.default_backend() == "tpu" and (q.shape[-1] // heads) % 32 == 0:
        return fused_attention_packed(q, k, v, heads)
    return attention_packed_reference(q, k, v, heads)


def attention_auto(q, k, v):
    """Backend-aware dispatch: the Pallas kernel on TPU, the XLA composition
    everywhere else (Mosaic won't lower off-TPU outside interpret mode).
    The backend is a trace-time global, so this costs nothing under jit."""
    if jax.default_backend() == "tpu":
        return fused_attention(q, k, v)
    return attention_reference(q, k, v)
