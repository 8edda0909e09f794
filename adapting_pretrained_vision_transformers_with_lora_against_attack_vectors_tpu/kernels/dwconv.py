"""Pallas depthwise 7x7 convolution (NHWC, stride 1, SAME) for ConvNeXt.

Why: the round-3 ConvNeXt PGD trace (tools/profile_pgd.py --backbone
convnext) attributes 178 of 642 ms (27.7%) to ``lax.conv_general_dilated``
with ``feature_group_count=dim`` — XLA's TPU lowering of the depthwise convs
runs at ~3.4 TF/s aggregate, far below the VPU's elementwise throughput,
while carrying only ~0.46 GF/img of useful work (vs the reference's cuDNN
depthwise path, which this layer replaces; reference role: the 7x7 dwconv in
ConvNeXt per README.md:49-57's promised zoo).

A depthwise conv has no contraction to feed the MXU (each output channel
touches one input channel), so the right TPU formulation is pure VPU work
over lanes=C: pad the image once in XLA, keep one padded image per grid
program resident in VMEM, and accumulate the 49 taps as statically-unrolled
shifted multiply-adds in f32. H sits in the un-tiled major dims (slices are
free); the W-tap offsets are sublane shifts Mosaic handles natively. One
grid program per batch element — ConvNeXt's per-image working set is tiny
(stage 1: 62x62x128 bf16 ~ 1 MB padded input + 1.6 MB f32 accumulator), so
every stage fits VMEM with room to double-buffer across programs.

Backward: dx of a stride-1 SAME correlation is the same correlation with the
spatially flipped filter — the forward kernel reused with ``w[::-1, ::-1]``.
The filter gradient goes through ``jax.vjp`` of the XLA reference in the VJP
rule: exact native conv-grad numerics, and dead-code-eliminated entirely in
the attack path (``jax.grad`` wrt images), which is where the kernel's
traffic matters.

Numerics: f32 accumulation over bf16-exact upcasts, identical math to the
XLA conv up to f32 tap-summation order (the hardware conv also accumulates
in f32 — models/convnext.py:100-112). Parity pinned in interpret mode and on
TPU hardware (tests/test_native_kernels.py, tools/tpu_parity_attn_block.py
methodology).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import VMEM_BUDGET_BYTES

_K = 7  # fixed 7x7 taps (ConvNeXt); pad = _K // 2 each side
_PAD = _K // 2


def _dw_kernel(x_ref, w_ref, o_ref):
    """One padded image -> one output image, 49 unrolled f32 tap FMAs.

    ``x_ref``: (1, H+6, W+6, C) compute dtype; ``w_ref``: (7, 7, C) f32;
    ``o_ref``: (1, H, W, C).
    """
    _, hp, wp, c = x_ref.shape
    h, w = hp - 2 * _PAD, wp - 2 * _PAD
    xf = x_ref[0].astype(jnp.float32)  # (H+6, W+6, C) upcast once
    # W sits on the sublane axis, so a W-offset slice is a real vector-shift
    # pass; do the 7 shifts ONCE up front and let the 49 tap slices move only
    # along H (a major dim — free), 7x fewer shift passes than slicing W
    # inside the tap loop.
    cols = [xf[:, dj:dj + w, :] for dj in range(_K)]
    acc = jnp.zeros((h, w, c), jnp.float32)
    for di in range(_K):
        for dj in range(_K):
            acc = acc + cols[dj][di:di + h] * w_ref[di, dj, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _impl(x: jax.Array, w: jax.Array) -> jax.Array:
    """(B, H, W, C) x (7, 7, C) -> (B, H, W, C); pad once in XLA."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (0, 0)))
    img = pl.BlockSpec((1, h + 2 * _PAD, wd + 2 * _PAD, c),
                       lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    wf = pl.BlockSpec(w.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dw_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        grid=(b,),
        in_specs=[img, wf],
        out_specs=out,
    )(xp, w.astype(jnp.float32))


@jax.custom_vjp
def dwconv7(x: jax.Array, w: jax.Array) -> jax.Array:
    """Depthwise 7x7 stride-1 SAME convolution, bias-free.

    ``x``: (B, H, W, C); ``w``: (7, 7, C) (the model's HWIO (7, 7, 1, C)
    filter squeezed). The caller adds bias in f32 exactly as
    ``models.convnext._conv`` does for the XLA path.
    """
    return _impl(x, w)


def _ref(x: jax.Array, w: jax.Array) -> jax.Array:
    """XLA composition (models.convnext._conv numerics, bias-free)."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.reshape(_K, _K, 1, c).astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _fwd_rule(x, w):
    return _impl(x, w), (x, w)


def _bwd_rule(res, g):
    x, w = res
    g = g.astype(x.dtype)
    # dx: correlate the cotangent with the spatially flipped filter — the
    # same kernel (stride 1 + SAME + odd taps keep the geometry identical).
    dx = _impl(g, w[::-1, ::-1, :])
    # dw: XLA's native conv filter-grad (exact, efficient), DCE'd whenever
    # only dx is consumed — every attack program and LoRA training (the
    # depthwise filter is frozen there).
    _, vjp = jax.vjp(lambda wv: _ref(x, wv), w)
    (dw,) = vjp(g)
    return dx, dw


dwconv7.defvjp(_fwd_rule, _bwd_rule)


def fits_vmem(h: int, w: int, c: int, dtype) -> bool:
    """Padded input + f32 accumulator + f32 upcast + output per program."""
    itemsize = jnp.dtype(dtype).itemsize
    hp, wp = h + 2 * _PAD, w + 2 * _PAD
    xin = hp * wp * c * itemsize
    xf = hp * wp * c * 4
    acc = h * w * c * 4
    out = h * w * c * itemsize
    return xin + xf + acc + out + _K * _K * c * 4 <= VMEM_BUDGET_BYTES
