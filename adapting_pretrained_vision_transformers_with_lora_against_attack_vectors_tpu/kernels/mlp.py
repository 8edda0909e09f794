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

Numerics: f32 accumulation on the MXU, exact (erf-based) GELU in f32 —
same math as ``ops.nn.dense`` + ``ops.nn.gelu``; parity tested in interpret
mode and against the XLA path on TPU.

Used by ``models.vit`` behind ``ViTConfig.use_fused_mlp`` (TPU-only
dispatch, and only when the block's weights fit the VMEM budget and carry
no unmerged-LoRA branch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import round_up

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


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]  # (RB, D)
    pre = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    pre = pre + b1_ref[...].astype(jnp.float32)
    h = _gelu_f32(pre, erf=_erf_poly).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, dy_ref, dx_ref):
    x = x_ref[...]
    dy = dy_ref[...]
    pre = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    pre = pre + b1_ref[...].astype(jnp.float32)
    # dh = dy @ W2^T ; dpre = dh * gelu'(pre) ; dx = dpre @ W1^T
    dh = jax.lax.dot_general(dy, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpre = (dh * _gelu_grad_f32(pre, erf=_erf_poly)).astype(x.dtype)
    dx = jax.lax.dot_general(dpre, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _pad_rows(x: jax.Array, t_pad: int) -> jax.Array:
    t = x.shape[0]
    return x if t == t_pad else jnp.pad(x, ((0, t_pad - t), (0, 0)))


def _call(x2, dy2, w1, b1, w2, b2, rb: int):
    t_pad, d = x2.shape
    m = w1.shape[1]
    grid = (t_pad // rb,)
    tok = lambda ch: pl.BlockSpec((rb, ch), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    if dy2 is None:
        return pl.pallas_call(
            _fwd_kernel,
            out_shape=jax.ShapeDtypeStruct((t_pad, d), x2.dtype),
            grid=grid,
            in_specs=[tok(d), full(d, m), full(1, m), full(m, d), full(1, d)],
            out_specs=tok(d),
        )(x2, w1, b1, w2, b2)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, d), x2.dtype),
        grid=grid,
        in_specs=[tok(d), full(d, m), full(1, m), full(m, d), tok(d)],
        out_specs=tok(d),
    )(x2, w1, b1, w2, dy2)


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
    y = _call(_pad_rows(x2, t_pad), None, w1.astype(x.dtype),
              b1.reshape(1, -1).astype(x.dtype), w2.astype(x.dtype),
              b2.reshape(1, -1).astype(x.dtype), _RB_FWD)
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
    dx = _call(_pad_rows(x2, t_pad), _pad_rows(g2, t_pad), w1.astype(x.dtype),
               b1.reshape(1, -1).astype(x.dtype), w2.astype(x.dtype), None,
               _RB_BWD)
    dx = dx[: x2.shape[0]].reshape(*lead, d)

    # Weight/bias grads as plain XLA (recomputed pre/h); DCE'd entirely when
    # the caller only differentiates wrt the input (the attack path). The
    # recompute mirrors the kernel's numerics exactly — biases cast to the
    # compute dtype and the A&S erf polynomial — so weight gradients are
    # consistent with the activations the kernel actually produced.
    cd = x.dtype
    pre = jnp.dot(x2, w1.astype(cd), preferred_element_type=jnp.float32)
    pre = pre + b1.astype(cd).astype(jnp.float32)
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
# the forward/backward per-block working sets within ~16 MB. bf16 ViT-B
# (768x3072 both ways = 9.4 MB weights + ~2.8 MB blocks at RB=128) fits;
# f32 does not.
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def fits_vmem(d: int, m: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    weights = 2 * d * m * itemsize
    fwd = _RB_FWD * (2 * d * itemsize + m * 4 + m * itemsize)
    bwd = _RB_BWD * (3 * d * itemsize + 2 * m * 4 + m * itemsize)
    return weights + max(fwd, bwd) <= _VMEM_BUDGET_BYTES


def mlp_reference(x, w1, b1, w2, b2):
    """The XLA composition (same numerics) for parity tests."""
    pre = jnp.dot(x, w1.astype(x.dtype),
                  preferred_element_type=jnp.float32) + b1
    h = _gelu_f32(pre).astype(x.dtype)
    return (jnp.dot(h, w2.astype(x.dtype),
                    preferred_element_type=jnp.float32) + b2).astype(x.dtype)
