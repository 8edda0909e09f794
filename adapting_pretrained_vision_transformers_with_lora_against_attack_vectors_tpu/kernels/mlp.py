"""Fused transformer-MLP Pallas kernel (dense -> exact GELU -> dense).

The XLA composition materializes the (tokens, mlp_dim) hidden activation in
HBM between the two matmuls — at ViT-B PGD shapes that is a 77 MB write +
read per layer forward and the same again for the backward's dh, ~300 MB of
pure HBM traffic per layer per PGD step. Both MLP weight matrices together
are only 9.4 MB in bf16, i.e. they fit VMEM *simultaneously*: this kernel
keeps W1 and W2 resident (constant block index — loaded once per grid
sweep), streams token blocks, and the hidden activation never leaves VMEM.

Backward is a second kernel computing ONLY dx (recomputing the pre-GELU
activation in-VMEM — one extra 2.3 GF matmul instead of a 77 MB HBM read).
Weight/bias gradients are emitted by the custom-VJP rule as plain XLA
matmuls over the saved input; in the attack path (``jax.grad`` wrt images)
those outputs are unused and XLA dead-code-eliminates them, so adversarial
generation pays zero weight-gradient cost — the same property the XLA
composition has.

Numerics: f32 accumulation on the MXU, biases added at f32 (exactly where
``ops.nn.dense`` adds them), exact (erf-based) GELU in f32 — same math as
``ops.nn.dense`` + ``ops.nn.gelu`` up to the A&S erf polynomial (|err| <=
1.5e-7; Mosaic has no erf lowering); parity tested in interpret mode at f32
and bf16, and against the XLA path on TPU.

Used by ``models.vit`` behind ``ViTConfig.use_fused_mlp`` (TPU-only
dispatch, and only when the block's weights fit the VMEM budget and carry
no unmerged-LoRA branch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import VMEM_BUDGET_BYTES, ln_bwd_f32, ln_fwd_f32, round_up

_SQRT_HALF = 0.7071067811865476


def _erf_poly(x: jax.Array) -> jax.Array:
    """Abramowitz-Stegun 7.1.26 erf approximation (|err| <= 1.5e-7, f32).

    Mosaic has no erf lowering (NotImplementedError on real TPU even though
    interpret mode accepts it), so the kernels use this polynomial; exp IS
    lowerable. The XLA-side reference/VJP paths keep jax.lax.erf.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(pre: jax.Array, *, erf=jax.lax.erf) -> jax.Array:
    """Exact GELU on f32 (jax.nn.gelu(approximate=False) numerics)."""
    return 0.5 * pre * (1.0 + erf(pre * _SQRT_HALF))


def _gelu_grad_f32(pre: jax.Array, *, erf=jax.lax.erf) -> jax.Array:
    """d/dx [x * Phi(x)] = Phi(x) + x * phi(x)."""
    phi = jnp.exp(-0.5 * pre * pre) * 0.3989422804014327  # N(0,1) pdf
    cdf = 0.5 * (1.0 + erf(pre * _SQRT_HALF))
    return cdf + pre * phi


# Shared kernel bodies: the plain (fused_mlp) and LN2-fused (fused_ln_mlp)
# kernels run the exact same GELU-MLP math — one copy here so any numerics
# change (erf polynomial, accumulation dtype) applies to both paths.


def _mlp_fwd_f32(x, w1_ref, b1_ref, w2_ref, b2_ref):
    """(RB, D) cd input -> (RB, D) f32 output of dense->gelu->dense."""
    pre = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    pre = pre + b1_ref[...].astype(jnp.float32)
    h = _gelu_f32(pre, erf=_erf_poly).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    return y + b2_ref[...].astype(jnp.float32)


def _mlp_dx_f32(x, dy, w1_ref, b1_ref, w2_ref):
    """f32 gradient wrt the MLP input: dy @ W2^T * gelu'(pre) @ W1^T."""
    pre = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    pre = pre + b1_ref[...].astype(jnp.float32)
    dh = jax.lax.dot_general(dy, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpre = (dh * _gelu_grad_f32(pre, erf=_erf_poly)).astype(x.dtype)
    return jax.lax.dot_general(dpre, w1_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]  # (RB, D)
    o_ref[...] = _mlp_fwd_f32(x, w1_ref, b1_ref, w2_ref,
                              b2_ref).astype(o_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, dy_ref, dx_ref):
    dx = _mlp_dx_f32(x_ref[...], dy_ref[...], w1_ref, b1_ref, w2_ref)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _pad_rows(x: jax.Array, t_pad: int) -> jax.Array:
    t = x.shape[0]
    return x if t == t_pad else jnp.pad(x, ((0, t_pad - t), (0, 0)))


def _call(kernel, x2, dy2, consts, rb: int, **kernel_kwargs):
    """Token-blocked pallas_call shared by both kernel variants.

    ``consts``: 2-D operands (weights / bias rows / LN rows, in kernel
    order) with constant block index — VMEM-resident across the grid sweep;
    ``dy2``: optional token-blocked cotangent appended last (backward)."""
    t_pad, d = x2.shape
    grid = (t_pad // rb,)
    tok = pl.BlockSpec((rb, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    inputs = [x2, *consts] + ([] if dy2 is None else [dy2])
    specs = [tok, *(full(c) for c in consts)] + ([] if dy2 is None else [tok])
    return pl.pallas_call(
        (functools.partial(kernel, **kernel_kwargs) if kernel_kwargs
         else kernel),
        out_shape=jax.ShapeDtypeStruct((t_pad, d), x2.dtype),
        grid=grid,
        in_specs=specs,
        out_specs=tok,
    )(*inputs)


@jax.custom_vjp
def fused_mlp(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array) -> jax.Array:
    """``gelu_exact(x @ w1 + b1) @ w2 + b2`` with VMEM-resident weights.

    ``x``: (..., D); ``w1``: (D, M); ``w2``: (M, D). The hidden activation
    stays in VMEM (never written to HBM) in both passes.
    """
    return _fwd_impl(x, w1, b1, w2, b2)


_RB_FWD = 128
_RB_BWD = 128


def _fwd_impl(x, w1, b1, w2, b2):
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    t_pad = round_up(x2.shape[0], _RB_FWD)
    # Weights in the compute dtype (MXU operands); bias rows stay f32 — the
    # kernel adds them at f32, exactly where ops.nn.dense does, so f32 master
    # biases lose nothing (same convention as fused_ln_mlp and attn_block).
    consts = [w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
              w2.astype(x.dtype), b2.reshape(1, -1).astype(jnp.float32)]
    y = _call(_fwd_kernel, _pad_rows(x2, t_pad), None, consts, _RB_FWD)
    return y[: x2.shape[0]].reshape(*lead, d)


def _fwd_rule(x, w1, b1, w2, b2):
    return _fwd_impl(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd_rule(res, g):
    x, w1, b1, w2, b2 = res
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    g2 = g.reshape(-1, d)
    t_pad = round_up(x2.shape[0], _RB_BWD)
    consts = [w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
              w2.astype(x.dtype)]
    dx = _call(_bwd_kernel, _pad_rows(x2, t_pad), _pad_rows(g2, t_pad),
               consts, _RB_BWD)
    dx = dx[: x2.shape[0]].reshape(*lead, d)

    # Weight/bias grads as plain XLA (recomputed pre/h); DCE'd entirely when
    # the caller only differentiates wrt the input (the attack path). The
    # recompute mirrors the kernel's numerics exactly — f32 bias adds and the
    # A&S erf polynomial — so weight gradients are consistent with the
    # activations the kernel actually produced.
    cd = x.dtype
    pre = jnp.dot(x2, w1.astype(cd), preferred_element_type=jnp.float32)
    pre = pre + b1.astype(jnp.float32)
    h = _gelu_f32(pre, erf=_erf_poly)
    dh = jnp.dot(g2, w2.astype(cd).T, preferred_element_type=jnp.float32)
    dpre = dh * _gelu_grad_f32(pre, erf=_erf_poly)
    dw1 = jnp.dot(x2.T, dpre.astype(cd),
                  preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = jnp.sum(dpre, axis=0).astype(b1.dtype)
    dw2 = jnp.dot(h.astype(cd).T, g2,
                  preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = jnp.sum(g2, axis=0, dtype=jnp.float32).astype(b2.dtype)
    return dx, dw1, db1, dw2, db2


fused_mlp.defvjp(_fwd_rule, _bwd_rule)


# Weights must fit VMEM alongside a token block: W1+W2 plus the larger of
# the forward/backward per-block working sets within the shared budget.
# bf16 ViT-B (768x3072 both ways = 9.4 MB weights + ~2.8 MB blocks at
# RB=128) fits; f32 does not.


def fits_vmem(d: int, m: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    weights = 2 * d * m * itemsize
    fwd = _RB_FWD * (2 * d * itemsize + m * 4 + m * itemsize)
    bwd = _RB_BWD * (3 * d * itemsize + 2 * m * 4 + m * itemsize)
    return weights + max(fwd, bwd) <= VMEM_BUDGET_BYTES


def mlp_reference(x, w1, b1, w2, b2):
    """The XLA composition (same numerics) for parity tests."""
    pre = jnp.dot(x, w1.astype(x.dtype),
                  preferred_element_type=jnp.float32) + b1
    h = _gelu_f32(pre).astype(x.dtype)
    return (jnp.dot(h, w2.astype(x.dtype),
                    preferred_element_type=jnp.float32) + b2).astype(x.dtype)


# --- LN2-fused variant (round-3 continuation) --------------------------------
#
# Companion to kernels/attn_block.py: with the attention half-block fused,
# the only remaining per-layer elementwise HBM round trips are LN2 and its
# (tokens, D) output h feeding fc1. This variant folds the LayerNorm into
# the same token-blocked kernel (LN is row-local, so it fits the streaming
# structure unchanged); together the encoder block becomes exactly two
# Pallas programs + two residual adds. Same backward contract as fused_mlp:
# the kernel computes ONLY dx (recomputing LN + pre in-VMEM, then chaining
# MLP-bwd -> LN-bwd); weight/bias/LN-parameter grads are XLA recomputes in
# the VJP rule, dead-code-eliminated in the attack path.
#
# Token blocks are halved (RB=64) versus fused_mlp: the in-kernel f32
# xf/normed rows add ~RB*D*8 bytes to the working set, and D*M weights plus
# the block must stay inside the same ~14 MB budget (bf16 ViT-B: 9.4 MB
# weights + ~2.6 MB block working set).

_RB_LN = 64


def _ln_fwd_kernel(x_ref, s_ref, t_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, *, eps: float):
    x = x_ref[...]  # (RB, D)
    _, _, h = ln_fwd_f32(x.astype(jnp.float32), s_ref[...], t_ref[...], eps)
    o_ref[...] = _mlp_fwd_f32(h.astype(x.dtype), w1_ref, b1_ref, w2_ref,
                              b2_ref).astype(o_ref.dtype)


def _ln_bwd_kernel(x_ref, s_ref, t_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                   dx_ref, *, eps: float):
    x = x_ref[...]
    normed, rstd, h = ln_fwd_f32(x.astype(jnp.float32), s_ref[...],
                                 t_ref[...], eps)
    dh = _mlp_dx_f32(h.astype(x.dtype), dy_ref[...], w1_ref, b1_ref, w2_ref)
    dx = ln_bwd_f32(dh, s_ref[...], normed, rstd)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _ln_prep(x, ln_scale, ln_bias, w1, b1, w2, b2):
    cd = x.dtype
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    return (row(ln_scale), row(ln_bias), w1.astype(cd), row(b1),
            w2.astype(cd), row(b2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_mlp(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                 w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
                 eps: float) -> jax.Array:
    """``gelu_exact(LN(x) @ w1 + b1) @ w2 + b2`` — the pre-residual MLP
    half-block with the LayerNorm folded in. ``x``: (..., D)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    t_pad = round_up(x2.shape[0], _RB_LN)
    consts = _ln_prep(x, ln_scale, ln_bias, w1, b1, w2, b2)
    y = _call(_ln_fwd_kernel, _pad_rows(x2, t_pad), None, consts, _RB_LN,
              eps=eps)
    return y[: x2.shape[0]].reshape(*lead, d)


def _ln_fwd_rule(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    return (fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps),
            (x, ln_scale, ln_bias, w1, b1, w2, b2))


def _ln_bwd_rule(eps, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    cd = x.dtype
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    g2 = g.reshape(-1, d).astype(cd)
    t_pad = round_up(x2.shape[0], _RB_LN)
    scale, bias, w1c, b1r, w2c, b2r = _ln_prep(x, ln_scale, ln_bias, w1, b1,
                                               w2, b2)
    dx = _call(_ln_bwd_kernel, _pad_rows(x2, t_pad), _pad_rows(g2, t_pad),
               [scale, bias, w1c, b1r, w2c], _RB_LN, eps=eps)
    dx = dx[: x2.shape[0]].reshape(x.shape)

    # Parameter grads: XLA recompute with the kernel's exact numerics (f32
    # LN, cd casts, A&S erf); DCE'd when only dx is consumed (attack path).
    normed, _, h = ln_fwd_f32(x2.astype(jnp.float32), scale, bias, eps)
    h_cd = h.astype(cd)
    pre = jnp.dot(h_cd, w1c, preferred_element_type=jnp.float32)
    pre = pre + b1r.astype(jnp.float32)
    a = _gelu_f32(pre, erf=_erf_poly)
    dh2 = jnp.dot(g2, w2c.T, preferred_element_type=jnp.float32)
    dpre = dh2 * _gelu_grad_f32(pre, erf=_erf_poly)
    dw1 = jnp.dot(h_cd.T, dpre.astype(cd),
                  preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = jnp.sum(dpre, axis=0).astype(b1.dtype)
    dw2 = jnp.dot(a.astype(cd).T, g2,
                  preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = jnp.sum(g2.astype(jnp.float32), axis=0).astype(b2.dtype)
    dh_full = jnp.dot(dpre.astype(cd), w1c.T,
                      preferred_element_type=jnp.float32)
    dscale = jnp.sum(dh_full * normed, axis=0).astype(ln_scale.dtype)
    dbias = jnp.sum(dh_full, axis=0).astype(ln_bias.dtype)
    return dx, dscale, dbias, dw1, db1, dw2, db2


fused_ln_mlp.defvjp(_ln_fwd_rule, _ln_bwd_rule)


def fits_vmem_ln(d: int, m: int, dtype) -> bool:
    """VMEM estimate for the LN-fused variant (RB=64 token blocks)."""
    itemsize = jnp.dtype(dtype).itemsize
    weights = 2 * d * m * itemsize
    # x/dy/dx blocks + f32 xf/normed/dh rows + f32 pre/da + cd hidden
    block = _RB_LN * (3 * d * itemsize + 3 * d * 4 + 2 * m * 4 + m * itemsize)
    return weights + block <= VMEM_BUDGET_BYTES


def ln_mlp_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    """XLA composition (ops.nn numerics) for parity tests."""
    from ..ops.nn import layer_norm

    h = layer_norm({"scale": ln_scale, "bias": ln_bias}, x, eps=eps)
    lead = x.shape[:-1]
    d = x.shape[-1]
    return mlp_reference(h.reshape(-1, d), w1, b1, w2, b2).reshape(*lead, d)
