"""Fused Swin window-attention Pallas kernel (forward + custom VJP).

Swin's attention is many tiny (49x49) problems — the XLA composition pays
fusion-breaking materializations around each one: slicing q/k/v out of the
fused qkv projection (3 map-sized copies), layout moves for the head-batched
einsums, and the scores/probs HBM round trip. The round-2 Swin-B trace
showed ~25% of PGD runtime in plain copies even after the window-resident
restructure (models/swin.py).

This kernel takes the qkv projection's RAW output (B, nW, n, 3C) plus the
COMPACT relative-position bias (heads, Np, Np) and shift mask (nW, Np, Np)
— not the (B, nW, heads, n, n) broadcasts — and emits the attention output
(B, nW, n, C) in one pass: per-head q/k/v slicing, scores, bias+mask,
softmax, and the probability-weighted sum all happen in VMEM. Scores never
touch HBM in either direction; the backward kernel rematerializes them
(flash-style) and emits dqkv in one pass.

Grid: one program per (batch element, window chunk); the mask block is
indexed by the window-chunk coordinate so each window sees its own shift
mask without any broadcast materialization (the round-1 prototype's
mistake, NOTES_NEXT_ROUND.md §1).

Numerics match ``models.swin._window_attention`` (f32 scores/softmax math,
bf16 storage): parity tested in interpret mode on CPU and against the HF
Swin fixture on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import round_up


def _head_major(x, heads, hd, base=0):
    """Stack per-head channel SLICES of ``x`` (GW, Np, C...) onto a new
    leading axis -> (heads*GW, Np, hd). Mosaic cannot reshape the minor/lane
    dimension, so x.reshape(..., heads, hd) does not lower; slicing the
    channel axis does."""
    gw, np_, _ = x.shape
    parts = [x[:, :, base + h * hd: base + (h + 1) * hd]
             for h in range(heads)]
    return jnp.concatenate([pt[None] for pt in parts], axis=0).reshape(
        heads * gw, np_, hd)


def _split_heads(qkv, heads):
    """(GW, Np, 3C) -> q, k, v each (heads*GW, Np, hd) — ONE batched-dot
    operand per tensor instead of a per-head Python loop of tiny dots."""
    c = qkv.shape[2] // 3
    hd = c // heads
    return (_head_major(qkv, heads, hd, 0), _head_major(qkv, heads, hd, c),
            _head_major(qkv, heads, hd, 2 * c), hd)


def _pack_rows(x, p):
    """(I, Np, hd) -> (I/p, p*Np, hd): concatenate each group of ``p``
    consecutive instances along the sublane (token) axis so the batched dots
    see MXU-sized M/N. Static unrolled copies — Np=49 is not a sublane
    multiple, so a plain reshape would need a relayout anyway; doing it as
    explicit concats keeps the data movement visible and tiny."""
    ii, np_, hd = x.shape
    return jnp.concatenate(
        [jnp.concatenate([x[g * p + j] for j in range(p)], axis=0)[None]
         for g in range(ii // p)], axis=0)


def _unpack_rows(x, p, np_):
    """(I/p, p*Np, ...) -> (I, Np, ...) — inverse of _pack_rows."""
    return jnp.concatenate(
        [x[g, j * np_:(j + 1) * np_][None]
         for g in range(x.shape[0]) for j in range(p)], axis=0)


def _packed_addmask(bias, shift, *, heads, gw, p, n_real, np_):
    """Block-diagonal additive mask (I/p, p*Np, p*Np): diagonal block j of
    group g carries bias[head of instance g*p+j] + shift[window of it];
    off-diagonal blocks are -1e30 so the row softmax never mixes windows.
    Instance order is head-major (h*gw + w), matching _split_heads."""
    neg = jnp.full((np_, np_), -1e30, jnp.float32)
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    pad = jnp.where(key_ids < n_real, 0.0, -1e30)
    groups = []
    for g in range((heads * gw) // p):
        rows = []
        for j in range(p):
            inst = g * p + j
            h, w = inst // gw, inst % gw
            diag = bias[h] + shift[w] + pad
            rows.append(jnp.concatenate(
                [diag if i == j else neg for i in range(p)], axis=-1))
        groups.append(jnp.concatenate(rows, axis=-2)[None])
    return jnp.concatenate(groups, axis=0)


def _probs(qkv, bias_ref, mask_ref, *, heads, n_real, scale, pack=1):
    """Batched probabilities + q,k,v (each (heads*GW, Np, hd)).

    ``pack=1``: one batched-dot instance per (head, window) — (49, hd)
    matmuls that underfill the MXU. ``pack=p``: groups of p instances are
    concatenated along tokens and the scores become (p*49, p*49) with a
    block-diagonal additive mask — p× raw FLOPs for much better systolic
    utilization (PERF.md round-4 Swin packing experiment; distinct from the
    round-3 measured-negative (49k, 32k) *operand* packing, which cost k²).
    Probabilities return PACKED when pack>1; q/k/v return unpacked."""
    gw, np_, _ = qkv.shape
    q, k, v, hd = _split_heads(qkv, heads)
    bias = bias_ref[...].astype(jnp.float32)  # (heads, Np, Np)
    shift = mask_ref[...].astype(jnp.float32)  # (GW, Np, Np)
    if pack > 1:
        qp, kp = _pack_rows(q, pack), _pack_rows(k, pack)
        s = jax.lax.dot_general(qp, kp, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        s = s + _packed_addmask(bias, shift, heads=heads, gw=gw, p=pack,
                                n_real=n_real, np_=np_)
    else:
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        s = s + jnp.repeat(bias, gw, axis=0)
        s = s + jnp.tile(shift, (heads, 1, 1))
        key_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, np_), 2)
        s = s + jnp.where(key_ids < n_real, 0.0, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True), q, k, v, hd


def _merge_heads(o, heads, gw, np_, hd):
    """(heads*GW, Np, hd) -> (GW, Np, heads*hd) via per-head concatenation
    on the channel axis (minor-dim reshape is not lowerable)."""
    x = o.reshape(heads, gw, np_, hd)
    return jnp.concatenate([x[h] for h in range(heads)], axis=-1)


def _fwd_kernel(qkv_ref, bias_ref, mask_ref, o_ref, *, heads: int,
                n_real: int, scale: float, pack: int = 1):
    qkv = qkv_ref[0]  # (GW, Np, 3C)
    gw, np_, _ = qkv.shape
    p, q, k, v, hd = _probs(qkv, bias_ref, mask_ref, heads=heads,
                            n_real=n_real, scale=scale, pack=pack)
    if pack > 1:
        vp = _pack_rows(v, pack)
        o = jax.lax.dot_general(p.astype(v.dtype), vp,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = _unpack_rows(o, pack, np_)
    else:
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
    o_ref[0] = _merge_heads(o.astype(o_ref.dtype), heads, gw, np_, hd)


def _bwd_kernel(qkv_ref, bias_ref, mask_ref, do_ref, dqkv_ref, *,
                heads: int, n_real: int, scale: float, pack: int = 1):
    """dqkv only. The bias-table gradient is computed by the VJP rule in
    plain XLA (recomputed probs) so the attack path — grad wrt images only —
    dead-code-eliminates it entirely; the previous in-kernel grid-resident
    accumulation charged every caller for it."""
    qkv = qkv_ref[0]
    gw, np_, c3 = qkv.shape
    p, q, k, v, hd = _probs(qkv, bias_ref, mask_ref, heads=heads,
                            n_real=n_real, scale=scale, pack=pack)
    do = _split_do(do_ref[0], heads, hd)  # (heads*GW, Np, hd)

    if pack > 1:
        # packed math throughout: p rows/cols outside the diagonal blocks
        # carry probs ~0, so dv/dp/ds are exact (ds = p*(dp-row) vanishes
        # off-diagonal with p).
        do, q, k, v = (_pack_rows(t, pack) for t in (do, q, k, v))
    p_lp = p.astype(v.dtype)
    dv = jax.lax.dot_general(p_lp, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds_u = p * (dp - row)  # dL/ds (bias/mask enter s additively)
    ds_lp = (ds_u * scale).astype(q.dtype)
    dq = jax.lax.dot_general(ds_lp, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds_lp, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    if pack > 1:
        dq, dk, dv = (_unpack_rows(t, pack, np_) for t in (dq, dk, dv))

    dqkv_ref[0] = jnp.concatenate(
        [_merge_heads(t, heads, gw, np_, hd) for t in (dq, dk, dv)],
        axis=-1).astype(dqkv_ref.dtype)


def _split_do(do_full, heads, hd):
    return _head_major(do_full, heads, hd)


def _pick_gw(n_windows: int, heads: int, pack: int = 1) -> int:
    # One program holds heads*gw batched (Np, Np) f32 score/probability
    # buffers in both passes; cap heads*gw so the backward's working set
    # stays inside the ~16 MB VMEM budget across all Swin stages. Packed
    # scores cost p x the bytes ((I/p)·(p·Np)² = I·p·Np²) — that IS the
    # traded FLOP/byte waste — so the cap applies to heads*gw*pack, and
    # heads*gw must tile into whole groups of `pack`.
    budget = 64 if pack <= 1 else 128 // pack  # pack=1 keeps r3's tuned cap
    for cand in (32, 16, 8, 4, 2, 1):
        if (n_windows % cand == 0 and heads * cand <= budget
                and (heads * cand) % pack == 0):
            return cand
    # pack<=1 keeps the historical gw=1 fallback (budget is advisory there);
    # pack>1 returns 0 = "no gw fits the cap" so _resolve_pack drops to
    # pack=1 instead of blowing past the heads*gw*pack VMEM budget.
    return 1 if pack <= 1 else 0


def _pad_tokens(x: jax.Array, n_pad: int) -> jax.Array:
    n = x.shape[2]
    if n == n_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))


def _specs(qkv, bias, mask, heads, pack=1):
    b, nw, n_pad, _ = qkv.shape
    gw = _pick_gw(nw, heads, pack)
    grid = (b, nw // gw)
    qkv_spec = pl.BlockSpec((1, gw, n_pad, qkv.shape[-1]),
                            lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, n_pad, n_pad), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((gw, n_pad, n_pad), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM)

    def map_spec(channels):
        return pl.BlockSpec((1, gw, n_pad, channels), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    return grid, [qkv_spec, bias_spec, mask_spec], map_spec


def _resolve_pack(pack, nw, heads):
    """Clamp the requested pack factor to one that divides some heads*gw."""
    if pack <= 1:
        return 1
    gw = _pick_gw(nw, heads, pack)
    return pack if gw > 0 and (heads * gw) % pack == 0 else 1


def _call_fwd(qkv, bias, mask, *, heads: int, n_real: int, scale: float,
              pack: int = 1):
    b, nw, n_pad, c3 = qkv.shape
    c = c3 // 3
    grid, in_specs, map_spec = _specs(qkv, bias, mask, heads, pack)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, n_real=n_real,
                          scale=scale, pack=pack),
        out_shape=jax.ShapeDtypeStruct((b, nw, n_pad, c), qkv.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=map_spec(c),
    )(qkv, bias, mask)


def _call_bwd(qkv, bias, mask, do, *, heads: int, n_real: int, scale: float,
              pack: int = 1):
    b, nw, n_pad, c3 = qkv.shape
    c = c3 // 3
    grid, in_specs, map_spec = _specs(qkv, bias, mask, heads, pack)
    in_specs.append(map_spec(c))  # do (cotangent) shares the output layout
    return pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, n_real=n_real,
                          scale=scale, pack=pack),
        out_shape=jax.ShapeDtypeStruct((b, nw, n_pad, c3), qkv.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=map_spec(c3),
    )(qkv, bias, mask, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_window_attention(qkv: jax.Array, bias: jax.Array, mask: jax.Array,
                           heads: int, pack: int = 1) -> jax.Array:
    """``softmax(q k^T / sqrt(hd) + bias + mask) v`` over Swin windows.

    ``qkv``: (B, nW, n, 3C) — the raw fused projection output (head-major
    slices q|k|v on the channel axis, head h at channels [h*hd, (h+1)*hd)).
    ``bias``: (heads, n, n) relative-position bias (table already gathered
    through the static rel-index — compact, not broadcast).
    ``mask``: (nW, n, n) additive shift mask (zeros for unshifted blocks).
    Returns (B, nW, n, C). Gradients flow to ``qkv`` (Pallas backward
    kernel) and ``bias`` (XLA recompute in the VJP rule — DCE'd entirely on
    the attack path, where only image gradients are consumed); the shift
    mask is a constant (zero grad).

    ``pack``: group this many (head, window) instances into one score
    matmul with a block-diagonal mask (p*49-token M/N, contraction stays
    hd) — p× raw score/PV FLOPs bought back as systolic utilization. 1
    disables (default; flip via SwinConfig.pack_windows after a hardware
    A/B — tools/tpu_ab_swin.py).
    """
    return _fwd_impl(qkv, bias, mask, heads, pack)


def _prep(qkv, bias, mask):
    # Round 3: no XLA-level token padding (was round_up(n, 64)). Mosaic
    # masks the internal sublane/lane padding of the logical 49-token dims
    # itself (same as the packed ViT kernel at N=197, kernels/attention.py),
    # so the pad/slice interface copies around every block disappear from
    # the XLA program. n_real masking in-kernel becomes a no-op but is kept
    # for generality.
    n = qkv.shape[2]
    return qkv, bias, mask, n, n


def _fwd_impl(qkv, bias, mask, heads, pack=1):
    qkv_p, bias_p, mask_p, n, n_pad = _prep(qkv, bias, mask)
    c = qkv.shape[-1] // 3
    scale = (c // heads) ** -0.5
    pack = _resolve_pack(pack, qkv.shape[1], heads)
    o = _call_fwd(qkv_p, bias_p, mask_p, heads=heads, n_real=n, scale=scale,
                  pack=pack)
    return o[:, :, :n, :]


def _fwd_rule(qkv, bias, mask, heads, pack=1):
    return _fwd_impl(qkv, bias, mask, heads, pack), (qkv, bias, mask)


def _bwd_rule(heads, pack, res, g):
    qkv, bias, mask = res
    qkv_p, bias_p, mask_p, n, n_pad = _prep(qkv, bias, mask)
    c = qkv.shape[-1] // 3
    scale = (c // heads) ** -0.5
    g_p = _pad_tokens(g, n_pad)
    dqkv = _call_bwd(qkv_p, bias_p, mask_p, g_p, heads=heads,
                     n_real=n, scale=scale,
                     pack=_resolve_pack(pack, qkv.shape[1], heads))
    n_real = qkv.shape[2]
    dbias = _dbias_xla(qkv, bias, mask, g, heads, scale)
    return dqkv[:, :, :n_real, :], dbias, jnp.zeros_like(mask)


def _dbias_xla(qkv, bias, mask, g, heads, scale):
    """Bias-table gradient via XLA recompute (train path only; the attack
    path consumes no bias cotangent, so XLA dead-code-eliminates this)."""
    b, nw, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    x = qkv.reshape(b, nw, n, 3, heads, hd)
    q = x[..., 0, :, :].transpose(0, 1, 3, 2, 4)  # (B, nW, h, n, hd)
    k = x[..., 1, :, :].transpose(0, 1, 3, 2, 4)
    v = x[..., 2, :, :].transpose(0, 1, 3, 2, 4)
    s = jnp.einsum("bwhqd,bwhkd->bwhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias[None, None].astype(jnp.float32)
    s = s + mask[None, :, None].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    do = g.reshape(b, nw, n, heads, hd).transpose(0, 1, 3, 2, 4)
    dp = jnp.einsum("bwhqd,bwhkd->bwhqk", do.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row)
    return jnp.sum(ds, axis=(0, 1)).astype(bias.dtype)


fused_window_attention.defvjp(_fwd_rule, _bwd_rule)
