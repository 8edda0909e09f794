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

The kernel self-blocks over output rows: each grid program processes its
image in row chunks of ``hb`` rows so the seven pre-shifted column copies
(the dominant VMEM intermediate, 7 x (hb+6) x W x C x 4 bytes) stay bounded
regardless of stage geometry — at full height, ConvNeXt-B stage 1 would need
~12.4 MB of column copies alone (ADVICE r3). ``_pick_hb`` chooses the
largest divisor of H whose honest footprint fits the budget.

Numerics: f32 accumulation over taps; the filter is first rounded to the
activation dtype (exactly ``models.convnext._conv``'s
``w.astype(x.dtype)``) and then upcast, so flipping ``use_dw_kernel``
changes results only by f32 tap-summation order (the XLA conv also
accumulates in f32 — models/convnext.py:100-112). Parity pinned in
interpret mode (tests/test_native_kernels.py); hardware parity + the A/B
are ``tools/tpu_ab_convnext.py``'s job and gate the flag's default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import VMEM_BUDGET_BYTES

_K = 7  # fixed 7x7 taps (ConvNeXt); pad = _K // 2 each side
_PAD = _K // 2


def _make_dw_kernel(hb: int):
    """Kernel over one padded image, output rows processed in ``hb``-chunks.

    ``x_ref``: (1, H+6, W+6, C) compute dtype; ``w_ref``: (7, 7, C) f32;
    ``o_ref``: (1, H, W, C). Per chunk: the seven W-shifted column copies
    cover only (hb+6) rows, bounding live VMEM; W sits on the sublane axis,
    so a W-offset slice is a real vector-shift pass — doing the 7 shifts
    once per chunk and letting the 49 tap slices move only along H (a major
    dim — free) is 7x fewer shift passes than slicing W inside the tap loop.
    """

    def kernel(x_ref, w_ref, o_ref):
        _, hp, wp, c = x_ref.shape
        h, w = hp - 2 * _PAD, wp - 2 * _PAD
        for rb in range(0, h, hb):
            cols = [x_ref[0, rb:rb + hb + 2 * _PAD, dj:dj + w, :]
                    .astype(jnp.float32) for dj in range(_K)]
            acc = jnp.zeros((hb, w, c), jnp.float32)
            for di in range(_K):
                for dj in range(_K):
                    acc = acc + cols[dj][di:di + hb] * w_ref[di, dj, :]
            o_ref[0, rb:rb + hb] = acc.astype(o_ref.dtype)

    return kernel


def _vmem_bytes(h: int, w: int, c: int, itemsize: int, hb: int) -> int:
    """Honest per-program footprint: padded input block + the seven live
    column copies of one chunk + chunk accumulator + output block + taps."""
    hp, wp = h + 2 * _PAD, w + 2 * _PAD
    xin = hp * wp * c * itemsize
    cols = _K * (hb + 2 * _PAD) * w * c * 4
    acc = hb * w * c * 4
    out = h * w * c * itemsize
    return xin + cols + acc + out + _K * _K * c * 4


def _pick_hb(h: int, w: int, c: int, itemsize: int) -> int | None:
    """Largest divisor of H whose chunked footprint fits the VMEM budget."""
    for hb in sorted((d for d in range(1, h + 1) if h % d == 0), reverse=True):
        if _vmem_bytes(h, w, c, itemsize, hb) <= VMEM_BUDGET_BYTES:
            return hb
    return None


def _impl(x: jax.Array, w: jax.Array) -> jax.Array:
    """(B, H, W, C) x (7, 7, C) -> (B, H, W, C); pad once in XLA."""
    b, h, wd, c = x.shape
    hb = _pick_hb(h, wd, c, jnp.dtype(x.dtype).itemsize)
    if hb is None:  # caller gates on fits_vmem; belt-and-braces fallback
        return _ref(x, w)
    xp = jnp.pad(x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (0, 0)))
    img = pl.BlockSpec((1, h + 2 * _PAD, wd + 2 * _PAD, c),
                       lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    wf = pl.BlockSpec(w.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    # round the filter to the activation dtype FIRST — exactly _conv's
    # ``w.astype(x.dtype)`` rounding — then upcast for f32 tap accumulation,
    # so flipping use_dw_kernel never changes which filter bits are used
    # (ADVICE r3 low: f32 params previously kept full-precision taps here).
    return pl.pallas_call(
        _make_dw_kernel(hb),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        grid=(b,),
        in_specs=[img, wf],
        out_specs=out,
    )(xp, w.astype(x.dtype).astype(jnp.float32))


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
    """True iff some row-chunk size keeps the honest per-program footprint
    (padded input + live column copies + accumulator + output) in budget."""
    return _pick_hb(h, w, c, jnp.dtype(dtype).itemsize) is not None
