"""Fully-fused ViT attention half-block Pallas kernel (round-3 follow-up).

MEASURED NEGATIVE on v5e hardware (round 3, tools/tpu_parity_attn_block.py):
27.2 ms fwd+dx per call vs 4.66 ms for the XLA composition at flagship
geometry (B=64, N=197, C=768, H=12, bf16) — the one-program-per-batch-
element grid underfills the chip and the ~13.5 MB VMEM residency blocks
double-buffering, costing far more MXU utilization than the saved HBM
traffic is worth. Hardware parity PASSES (fwd 2.0e-3 / dx 3.9e-3), so the
kernel is kept as a correct, pinned, documented-negative record; do not
enable it for performance. The MLP half of the fused-block idea measured
POSITIVE and ships separately (``ViTConfig.fuse_ln_mlp`` ->
``kernels/mlp.py:fused_ln_mlp``). See PERF.md "Measured: the fully-fused
encoder block".

Fuses ``LN1 -> q/k/v projections -> multi-head attention -> o-projection``
into ONE grid program per batch element, so the five intermediates the
status-quo path round-trips through HBM every layer (``h`` after LN, the
``q``/``k``/``v`` dense outputs, and the pre-o-projection attention output)
never leave VMEM. At ViT-B PGD shapes that is ~5 x (64, 197, 768) bf16
tensors (~97 MB) of forward HBM traffic per layer removed, plus the f32
LayerNorm elementwise pass; the round-3 trace priced the remaining non-matmul
forward time mostly in exactly these seams (PERF.md "remaining headroom":
QKVO-adjacent elementwise + layout).

Backward follows the ``kernels/mlp.py`` pattern: a second kernel computes
ONLY ``dx`` — recomputing LN/q/k/v/probs in-VMEM (flash-style) and chaining
attention-bwd -> projection-bwd -> LayerNorm-bwd without materializing
``dq``/``dk``/``dv``/``dh`` in HBM. Weight / bias / LN-parameter gradients
are emitted by the custom-VJP rule as plain XLA matmuls over the saved
input; in the attack path (``jax.grad`` wrt images — reference
whitebox_attacks.py's only gradient) those are dead code and XLA eliminates
them, so adversarial generation pays zero weight-gradient cost.

Numerics match the XLA composition leaf-for-leaf (LayerNorm in f32,
projections bf16 x bf16 -> f32 accumulate + f32 bias, per-head operands
cast exactly where ``ops.nn.dense`` / the packed kernel cast), with the
same ONE deliberate deviation as ``kernels/attention``: scores stay f32 in
VMEM, while ``ops.nn.attention`` rounds its stored scores to the input
dtype before the f32 softmax (an HBM-size tradeoff that does not apply in
VMEM). Identical at f32; at bf16 — the only dtype the model dispatch
permits — probabilities differ from the XLA fallback by up to ~1 bf16 ulp
(~0.4%), the kernel being the more accurate side. Parity + VJP parity are
pinned in interpret mode at f32 (exact) and bf16 (toleranced)
(tests/test_native_kernels.py).

VMEM: all four (C, C) weight matrices stay resident (constant block index —
fetched once per grid sweep). bf16 ViT-B: 4.7 MB weights + ~7 MB peak
working set (two (12, 197, 197) f32 score-shaped buffers live at once in
the backward) — inside the ~14 MB budget; f32 ViT-B is not, so the model
dispatch (``models.vit``) only takes this path in half-precision compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import VMEM_BUDGET_BYTES, ln_bwd_f32, ln_fwd_f32
from .attention import _attn_bwd_core, _head_concat, _head_stack


def _proj(h_cd, w_ref, b_ref):
    """``ops.nn.dense`` numerics: cd x cd -> f32 accumulate, f32 bias, -> cd."""
    y = jnp.dot(h_cd, w_ref[...], preferred_element_type=jnp.float32)
    return (y + b_ref[...].astype(jnp.float32)).astype(h_cd.dtype)


def _qkv_probs(h_cd, wq_ref, bq_ref, wk_ref, bk_ref, heads: int):
    """Recompute q/k head stacks and f32 attention probabilities."""
    hd = h_cd.shape[-1] // heads
    qh = _head_stack(_proj(h_cd, wq_ref, bq_ref), heads, hd)  # (H, N, hd)
    kh = _head_stack(_proj(h_cd, wk_ref, bk_ref), heads, hd)
    s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True), qh, kh, hd


def _fwd_kernel(x_ref, scale_ref, bias_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, o_ref, *, heads: int,
                eps: float):
    cd = x_ref.dtype
    _, _, h = ln_fwd_f32(x_ref[0].astype(jnp.float32), scale_ref[...],
                         bias_ref[...], eps)
    h_cd = h.astype(cd)
    p, _, _, hd = _qkv_probs(h_cd, wq_ref, bq_ref, wk_ref, bk_ref, heads)
    vh = _head_stack(_proj(h_cd, wv_ref, bv_ref), heads, hd)
    oh = jax.lax.dot_general(p.astype(cd), vh, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    a = _head_concat(oh.astype(cd))  # pre-o-projection attention out (N, C)
    o_ref[0] = _proj(a, wo_ref, bo_ref)


def _bwd_kernel(x_ref, scale_ref, bias_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, dy_ref, dx_ref, *, heads: int,
                eps: float):
    cd = x_ref.dtype
    normed, rstd, h = ln_fwd_f32(x_ref[0].astype(jnp.float32), scale_ref[...],
                                 bias_ref[...], eps)
    h_cd = h.astype(cd)
    p, qh, kh, hd = _qkv_probs(h_cd, wq_ref, bq_ref, wk_ref, bk_ref, heads)
    vh = _head_stack(_proj(h_cd, wv_ref, bv_ref), heads, hd)

    # o-projection backward: da = dy @ Wo^T
    da = jax.lax.dot_general(dy_ref[0], wo_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dah = _head_stack(da.astype(cd), heads, hd)  # (H, N, hd)

    # attention backward: the shared softmax-VJP core (ONE copy with
    # kernels/attention's whole-head and packed kernels)
    dqh, dkh, dvh = _attn_bwd_core(p, qh, kh, vh, dah, hd ** -0.5)

    # projection backward into dh: dh = dq Wq^T + dk Wk^T + dv Wv^T
    dq = _head_concat(dqh.astype(cd))  # (N, C)
    dk = _head_concat(dkh.astype(cd))
    dv = _head_concat(dvh.astype(cd))
    t = lambda d, w_ref: jax.lax.dot_general(
        d, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = t(dq, wq_ref) + t(dk, wk_ref) + t(dv, wv_ref)  # (N, C) f32

    # LayerNorm backward (shared VJP helper)
    dx = ln_bwd_f32(dh, scale_ref[...], normed, rstd)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _call(kernel, x, consts, dy, heads: int, eps: float):
    """Grid over batch; weights/LN params constant-index (VMEM-resident).

    ``consts``: 2-D non-token operands in kernel order; ``dy``: optional
    token-blocked cotangent appended last (backward kernel).
    """
    b, n, c = x.shape
    tok = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)

    inputs = [x, *consts] + ([] if dy is None else [dy])
    specs = [tok, *(mat(a) for a in consts)] + ([] if dy is None else [tok])
    return pl.pallas_call(
        functools.partial(kernel, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=specs,
        out_specs=tok,
    )(*inputs)


def _prep(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo=None):
    """Kernel-order const operands: weights cast to the compute dtype,
    LN params / biases as f32 rows."""
    cd = x.dtype
    c = x.shape[-1]
    row = lambda v: v.reshape(1, c).astype(jnp.float32)
    consts = [row(ln_scale), row(ln_bias),
              wq.astype(cd), row(bq), wk.astype(cd), row(bk),
              wv.astype(cd), row(bv), wo.astype(cd)]
    if bo is not None:
        consts.append(row(bo))
    return consts


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_attn_block(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                     wq: jax.Array, bq: jax.Array, wk: jax.Array,
                     bk: jax.Array, wv: jax.Array, bv: jax.Array,
                     wo: jax.Array, bo: jax.Array, heads: int,
                     eps: float) -> jax.Array:
    """``(LN(x) Wq,k,v -> MHA -> Wo)`` — the pre-residual attention half-block.

    ``x``: (B, N, C) in the compute dtype; weights (C, C) / vectors (C,) in
    the parameter dtype (cast inside). Returns (B, N, C) in ``x.dtype``;
    the caller adds the residual.
    """
    consts = _prep(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)
    return _call(_fwd_kernel, x, consts, None, heads, eps)


def _fwd_rule(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, heads,
              eps):
    out = fused_attn_block(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo,
                           bo, heads, eps)
    return out, (x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)


def _bwd_rule(heads, eps, res, g):
    x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo = res
    cd = x.dtype
    consts = _prep(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo)
    dx = _call(_bwd_kernel, x, consts, g.astype(cd), heads, eps)

    # Parameter grads as plain XLA over the saved input — recomputing the
    # forward with the kernel's exact casts, so they are consistent with the
    # activations the kernel produced. All of this is dead code (eliminated
    # by XLA) when the caller differentiates only wrt x — the attack path.
    b, n, c = x.shape
    hd = c // heads
    normed, _, h_f32 = ln_fwd_f32(x.astype(jnp.float32), ln_scale, ln_bias,
                                  eps)
    h = h_f32.astype(cd)

    def attn_from_h(h_, wq_, bq_, wk_, bk_, wv_, bv_, wo_, bo_):
        proj = lambda w, bias: (jnp.dot(h_, w, preferred_element_type=jnp.float32)
                                + bias.astype(jnp.float32)).astype(cd)
        split = lambda y: y.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
        qh, kh, vh = (split(proj(w, bias)) for w, bias in
                      ((wq_, bq_), (wk_, bk_), (wv_, bv_)))
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        oh = jnp.einsum("bhqk,bhkd->bhqd", p.astype(cd), vh,
                        preferred_element_type=jnp.float32)
        a = oh.astype(cd).transpose(0, 2, 1, 3).reshape(b, n, c)
        return (jnp.dot(a, wo_, preferred_element_type=jnp.float32)
                + bo_.astype(jnp.float32)).astype(cd)

    wq_c, wk_c, wv_c, wo_c = consts[2], consts[4], consts[6], consts[8]
    _, vjp = jax.vjp(attn_from_h, h, wq_c, bq, wk_c, bk, wv_c, bv, wo_c, bo)
    dh, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo = vjp(g)

    dhf = dh.astype(jnp.float32)
    dscale = jnp.sum(dhf * normed, axis=(0, 1)).astype(ln_scale.dtype)
    dbias = jnp.sum(dhf, axis=(0, 1)).astype(ln_bias.dtype)
    cast = lambda d, ref: d.astype(ref.dtype)
    return (dx, dscale, dbias, cast(dwq, wq), cast(dbq, bq), cast(dwk, wk),
            cast(dbk, bk), cast(dwv, wv), cast(dbv, bv), cast(dwo, wo),
            cast(dbo, bo))


fused_attn_block.defvjp(_fwd_rule, _bwd_rule)


# Four (C, C) weights + LN/bias rows + peak working set. The backward's
# peak-liveness moment (computing ds from p and dp) holds two (H, N, N) f32
# score buffers with ds able to reuse p's slot once p dies — the estimate
# below ASSUMES Mosaic's liveness-based buffer reuse delivers that; it is
# an estimate, not a proof, which is why the first hardware run goes through
# tools/tpu_parity_attn_block.py (a VMEM overflow is a loud compile error on
# an opt-in path, never silent corruption). Same shared budget as
# kernels/mlp.py. bf16 ViT-B totals ~13.8 MB; f32 ViT-B is far out.


def fits_vmem(c: int, heads: int, n: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    weights = 4 * c * c * itemsize
    scores = 2 * heads * n * n * 4  # p + dp f32 (ds reuses p, see above)
    # q/k/v + dq/dk/dv + dah head stacks + x and dy token blocks
    stacks = 9 * n * c * itemsize
    f32_rows = 5 * n * c * 4  # normed, h, da, dh, dx in f32
    return weights + scores + stacks + f32_rows <= VMEM_BUDGET_BYTES


def attn_block_reference(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo,
                         bo, heads: int, eps: float):
    """The XLA composition (ops.nn numerics) for parity tests / CPU path."""
    from ..ops.nn import attention, layer_norm

    b, n, c = x.shape
    hd = c // heads
    cd = x.dtype
    h = layer_norm({"scale": ln_scale, "bias": ln_bias}, x, eps=eps)
    proj = lambda w, bias: (jnp.dot(h, w.astype(cd),
                                    preferred_element_type=jnp.float32)
                            + bias.astype(jnp.float32)).astype(cd)
    split = lambda y: y.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    o = attention(split(proj(wq, bq)), split(proj(wk, bk)),
                  split(proj(wv, bv)))
    a = o.transpose(0, 2, 1, 3).reshape(b, n, c)
    return (jnp.dot(a, wo.astype(cd), preferred_element_type=jnp.float32)
            + bo.astype(jnp.float32)).astype(cd)
