"""Functional Swin Transformer (Swin-B flagship) — windowed attention backbone.

The reference README promises a timm Swin backbone (README.md:49-57) that was
never implemented (SURVEY.md §2.4 item 1); this is the real thing, designed
for XLA:

* **Scan over shift pairs.** Swin alternates unshifted/shifted blocks; each
  stage's params are stacked as (pairs, 2, ...) and the stage runs as one
  ``lax.scan`` over pairs — compile time is O(stages), not O(depth) (Swin-B
  has 24 blocks).
* **Static window geometry.** Window partition/reverse are reshapes;
  the shifted-window attention mask per stage is a compile-time constant;
  cyclic shift is ``jnp.roll`` (an XLA collective-permute-friendly op).
* **Relative position bias** gathers from the (2W-1)^2 table with a static
  index — one take per stage per scan step.
* LoRA targets the per-window qkv/proj denses exactly like ViT's.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import dense, dense_init, gelu, layer_norm, layer_norm_init


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    window: int = 7
    embed_dim: int = 128
    depths: tuple[int, ...] = (2, 2, 18, 2)
    num_heads: tuple[int, ...] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    num_classes: int = 21
    layer_norm_eps: float = 1e-5
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Python-unroll the per-stage pair loop instead of lax.scan: the scan
    # backward saves per-pair residuals via dynamic-update-slice into stacked
    # HBM buffers (same finding as models/vit.py round-2 trace). Costs
    # O(depth) compile time; on for the flagship benchmark path.
    unroll_layers: bool = False
    # Pallas fused window attention (kernels/window_attention.py): consumes
    # the raw fused-qkv projection, gathers compact bias/mask in-kernel, and
    # keeps the (49, 49) scores in VMEM. TPU only — XLA path elsewhere.
    use_fused_attention: bool = False
    # Pallas fused MLP (kernels/mlp.py) for blocks whose weight pair fits
    # the VMEM budget (stages 1-3 of Swin-B in bf16; stage 4's 1024x4096
    # pair does not and falls back). TPU only.
    use_fused_mlp: bool = False
    # Pack this many (head, window) instances into one block-masked score
    # matmul inside the fused kernel (kernels/window_attention.py) — p*49
    # M/N against the 128x128 MXU at p x raw-FLOP cost. 0/1 = off; gate any
    # default flip on the tools/tpu_ab_swin.py hardware A/B.
    pack_windows: int = 0

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    def stage_dim(self, s: int) -> int:
        return self.embed_dim * (2 ** s)

    def stage_res(self, s: int) -> int:
        return self.image_size // self.patch_size // (2 ** s)

    def with_classes(self, num_classes: int) -> "SwinConfig":
        return dataclasses.replace(self, num_classes=num_classes)


SWIN_B = SwinConfig()
SWIN_T = SwinConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24))
# CI-sized config: 32px input, 2 stages, one pair each, window 4.
SWIN_TEST = SwinConfig(image_size=32, patch_size=4, window=4, embed_dim=32,
                       depths=(2, 2), num_heads=(2, 4), num_classes=10,
                       compute_dtype="float32")


def _rel_pos_index(window: int) -> np.ndarray:
    """(W^2, W^2) indices into the (2W-1)^2 bias table (static)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, W^2, W^2)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return rel[..., 0] * (2 * window - 1) + rel[..., 1]


def _window_layout_order(res: int, window: int) -> np.ndarray:
    """(res^2,) spatial flat index held at each window-layout position."""
    nw = res // window
    return (np.arange(res * res).reshape(nw, window, nw, window)
            .transpose(0, 2, 1, 3).reshape(-1))


def _shift_perms(res: int, window: int, shift: int) -> tuple[np.ndarray, np.ndarray]:
    """Static permutations folding ``roll(-s) ∘ partition`` into ONE gather.

    Round-2 Swin-B trace: 25% of PGD runtime was plain ``copy`` ops — the
    per-block roll / window-partition / unpartition shuffles of the feature
    map. Keeping the map window-resident across a stage and expressing the
    cyclic shift as a single precomputed row permutation replaces the
    roll+partition+unpartition triple (3 full-map copies each way) with one
    gather each way.

    Returns ``(perm, inv)`` over window-layout token positions (nW*W^2,):
    ``x_shifted_layout = x_layout[perm]``, ``x_layout = x_shifted_layout[inv]``.
    """
    base = _window_layout_order(res, window)
    spatial_to_pos = np.argsort(base)
    rolled = np.roll(np.arange(res * res).reshape(res, res),
                     (-shift, -shift), (0, 1)).reshape(-1)
    # shifted-layout position j holds spatial index rolled[base[j]]
    perm = spatial_to_pos[rolled[base]]
    return perm, np.argsort(perm)


def _shift_attn_mask(res: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, W^2, W^2) additive mask for shifted windows (static).

    The slice labels describe the ALREADY-rolled feature map (the wrapped
    strips live in the last ``window``/``shift`` rows/cols after the cyclic
    shift), so the labeled image is partitioned directly — no extra roll
    (verified numerically against the HF Swin mask)."""
    img = np.zeros((res, res), np.int32)
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    nw = res // window
    wins = img.reshape(nw, window, nw, window).transpose(0, 2, 1, 3)
    wins = wins.reshape(nw * nw, window * window)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _block_init(rng: jax.Array, dim: int, mlp_dim: int, window: int,
                heads: int, dtype) -> dict:
    rngs = jax.random.split(rng, 5)
    table = jax.random.normal(rngs[4], ((2 * window - 1) ** 2, heads),
                              dtype) * 0.02
    return {
        "ln1": layer_norm_init(dim, dtype=dtype),
        "attn": {
            "qkv": dense_init(rngs[0], dim, 3 * dim, dtype=dtype),
            "proj": dense_init(rngs[1], dim, dim, dtype=dtype),
            "bias_table": table,
        },
        "ln2": layer_norm_init(dim, dtype=dtype),
        "mlp": {
            "fc1": dense_init(rngs[2], dim, mlp_dim, dtype=dtype),
            "fc2": dense_init(rngs[3], mlp_dim, dim, dtype=dtype),
        },
    }


def init(rng: jax.Array, cfg: SwinConfig) -> dict:
    dtype = jnp.dtype(cfg.param_dtype)
    r_embed, r_stages, r_head = jax.random.split(rng, 3)
    patch_dim = cfg.patch_size * cfg.patch_size * 3

    stages = {}
    for s, depth in enumerate(cfg.depths):
        dim = cfg.stage_dim(s)
        heads = cfg.num_heads[s]
        mlp_dim = int(dim * cfg.mlp_ratio)
        assert depth % 2 == 0, "Swin stages must have even depth (shift pairs)"
        pair_rngs = jax.random.split(jax.random.fold_in(r_stages, s), depth)
        blocks = jax.vmap(jax.vmap(
            lambda r: _block_init(r, dim, mlp_dim, cfg.window, heads, dtype)))(
            pair_rngs.reshape(depth // 2, 2))
        stage = {"blocks": blocks}
        if s < cfg.num_stages - 1:
            stage["merge"] = {
                "norm": layer_norm_init(4 * dim, dtype=dtype),
                "reduce": {"w": dense_init(jax.random.fold_in(r_stages, 100 + s),
                                           4 * dim, 2 * dim, dtype=dtype)["w"]},
            }
        stages[str(s)] = stage

    return {
        "embed": {
            "proj": dense_init(r_embed, patch_dim, cfg.embed_dim, dtype=dtype),
            "norm": layer_norm_init(cfg.embed_dim, dtype=dtype),
        },
        "stages": stages,
        "final_ln": layer_norm_init(cfg.stage_dim(cfg.num_stages - 1), dtype=dtype),
        "head": dense_init(r_head, cfg.stage_dim(cfg.num_stages - 1),
                           cfg.num_classes, dtype=dtype),
    }


def _window_attention(bp: dict, x: jax.Array, *, heads: int, window: int,
                      rel_index: jax.Array, mask, eps: float,
                      fused: bool = False, pack: int = 0) -> jax.Array:
    """x: (B, nW, W^2, C) -> same. ``mask``: (nW, W^2, W^2) or None."""
    b, nw, n, c = x.shape
    hd = c // heads
    h = layer_norm(bp["ln1"], x, eps=eps)
    qkv = dense(bp["attn"]["qkv"], h, compute_dtype=x.dtype)
    if fused and jax.default_backend() == "tpu":
        from ..kernels.window_attention import fused_window_attention

        bias = bp["attn"]["bias_table"][rel_index].astype(jnp.float32)
        bias = bias.transpose(2, 0, 1)  # (heads, W^2, W^2), compact
        m = (mask if mask is not None
             else jnp.zeros((nw, n, n), jnp.float32))
        out = fused_window_attention(qkv, bias, m, heads, max(1, pack))
        return dense(bp["attn"]["proj"], out, compute_dtype=x.dtype)
    # Keep (B, nW, W^2, heads, hd) layout and let the einsums carry the head
    # axis — the explicit 6-axis transpose copied ~150 MB per block and
    # measured ~2x slower end-to-end at batch 64 on v5e.
    qkv = qkv.reshape(b, nw, n, 3, heads, hd)
    q = qkv[..., 0, :, :]
    k = qkv[..., 1, :, :]
    v = qkv[..., 2, :, :]

    # Scores are STORED in the compute dtype (bf16 on TPU) — the
    # (B, nW, heads, W^2, W^2) tensors dominate Swin's HBM traffic and
    # storing them in f32 measured 2.6x slower end-to-end. Softmax math
    # still runs in f32; in f32 compute configs (tests/CPU) this is exactly
    # the original path.
    scores = jnp.einsum("bwqhd,bwkhd->bwhqk", q, k,
                        preferred_element_type=jnp.float32).astype(x.dtype)
    scores = scores * jnp.asarray(hd ** -0.5, x.dtype)
    bias = bp["attn"]["bias_table"][rel_index]  # (W^2, W^2, heads)
    scores = scores + bias.transpose(2, 0, 1).astype(x.dtype)[None, None]
    if mask is not None:
        scores = scores + mask[None, :, None].astype(x.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bwhqk,bwkhd->bwqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, nw, n, c)
    return dense(bp["attn"]["proj"], out, compute_dtype=x.dtype)


def _partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B, nW, window^2, C)."""
    b, h, w, c = x.shape
    nh, nw = h // window, w // window
    x = x.reshape(b, nh, window, nw, window, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, nh * nw, window * window, c)


def _unpartition(x: jax.Array, window: int, res: int) -> jax.Array:
    b, _, _, c = x.shape
    nh = res // window
    x = x.reshape(b, nh, nh, window, window, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, res, res, c)


def _block(cfg: SwinConfig, bp: dict, x: jax.Array, *, heads: int,
           rel_index: jax.Array, mask) -> jax.Array:
    """One Swin block in WINDOW layout: x (B, nW, W^2, C) -> same.

    The caller owns the shift: for shifted blocks it permutes the token rows
    into shifted-window layout first (``_shift_perms``) and passes the shift
    mask; the whole block (attention, residuals, MLP — all position-
    independent) then runs in that layout. No roll/partition copies here."""
    eps = cfg.layer_norm_eps
    attn = _window_attention(bp, x, heads=heads, window=cfg.window,
                             rel_index=rel_index, mask=mask, eps=eps,
                             fused=cfg.use_fused_attention,
                             pack=cfg.pack_windows)
    x = x + attn
    h = layer_norm(bp["ln2"], x, eps=eps)
    fc1, fc2 = bp["mlp"]["fc1"], bp["mlp"]["fc2"]
    if (cfg.use_fused_mlp and all(
            "lora_a" not in f and "w_q" not in f for f in (fc1, fc2))):
        from ..kernels.mlp import fits_vmem, fused_mlp

        if (jax.default_backend() == "tpu"
                and fits_vmem(fc1["w"].shape[0], fc1["w"].shape[1], x.dtype)):
            return x + fused_mlp(h, fc1["w"], fc1["b"], fc2["w"],
                                 fc2["b"]).astype(x.dtype)
    h = gelu(dense(fc1, h, compute_dtype=x.dtype))
    return x + dense(fc2, h, compute_dtype=x.dtype)


def features(cfg: SwinConfig, params: dict, images: jax.Array) -> jax.Array:
    """-> (B, res^2, C_last) final-norm tokens."""
    cd = jnp.dtype(cfg.compute_dtype)
    p = cfg.patch_size
    b, hh, ww, c = images.shape
    x = images.astype(cd).reshape(b, hh // p, p, ww // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh // p, ww // p, p * p * c)
    x = dense(params["embed"]["proj"], x, compute_dtype=cd)
    x = layer_norm(params["embed"]["norm"], x, eps=cfg.layer_norm_eps)

    shift = cfg.window // 2
    for s in range(cfg.num_stages):
        res = cfg.stage_res(s)
        heads = cfg.num_heads[s]
        rel_index = jnp.asarray(_rel_pos_index(cfg.window))
        windowed = res > cfg.window
        mask = (jnp.asarray(_shift_attn_mask(res, cfg.window, shift))
                if windowed else None)
        if windowed:
            perm_np, inv_np = _shift_perms(res, cfg.window, shift)
            perm, inv = jnp.asarray(perm_np), jnp.asarray(inv_np)
        else:
            perm = inv = None

        # the whole stage runs window-resident: partition once, shift via one
        # static row gather per direction (see _shift_perms), unpartition once
        x = _partition(x, cfg.window)
        b_, nw_, n_, d_ = x.shape

        def reperm(h, p):
            return h.reshape(b_, nw_ * n_, -1)[:, p].reshape(h.shape)

        def pair_fn(h, pair_bp, _heads=heads, _mask=mask, _ri=rel_index,
                    _windowed=windowed, _perm=perm, _inv=inv):
            bp0 = jax.tree.map(lambda v: v[0], pair_bp)
            bp1 = jax.tree.map(lambda v: v[1], pair_bp)
            h = _block(cfg, bp0, h, heads=_heads, rel_index=_ri, mask=None)
            if _windowed:
                h = reperm(h, _perm)
                h = _block(cfg, bp1, h, heads=_heads, rel_index=_ri,
                           mask=_mask)
                h = reperm(h, _inv)
            else:
                h = _block(cfg, bp1, h, heads=_heads, rel_index=_ri, mask=None)
            return h, None

        stage_blocks = params["stages"][str(s)]["blocks"]
        if cfg.unroll_layers:
            for i in range(cfg.depths[s] // 2):
                pair_bp = jax.tree.map(lambda v: v[i], stage_blocks)
                x, _ = pair_fn(x, pair_bp)
        else:
            x, _ = jax.lax.scan(pair_fn, x, stage_blocks)
        x = _unpartition(x, cfg.window, res)

        if s < cfg.num_stages - 1:
            mp = params["stages"][str(s)]["merge"]
            b_, r, _, d = x.shape
            x = x.reshape(b_, r // 2, 2, r // 2, 2, d)
            # timm concat order: (0,0), (1,0), (0,1), (1,1)
            x = jnp.concatenate([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                                 x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
            x = layer_norm(mp["norm"], x, eps=cfg.layer_norm_eps)
            x = dense(mp["reduce"], x, compute_dtype=cd)

    b_, r, _, d = x.shape
    x = x.reshape(b_, r * r, d)
    return layer_norm(params["final_ln"], x, eps=cfg.layer_norm_eps)


def apply(cfg: SwinConfig, params: dict, images: jax.Array) -> jax.Array:
    """-> (B, num_classes) logits; Swin pools by global token average."""
    toks = features(cfg, params, images)
    pooled = toks.mean(axis=1)
    logits = dense(params["head"], pooled, compute_dtype=toks.dtype,
                   accum_dtype=jnp.float32)
    return logits.astype(jnp.float32)


# LoRA targets: every stage's qkv + proj (stacked on (pairs, 2) axes).
def lora_target_paths(cfg: SwinConfig) -> tuple[str, ...]:
    out = []
    for s in range(cfg.num_stages):
        out.append(f"stages/{s}/blocks/attn/qkv")
        out.append(f"stages/{s}/blocks/attn/proj")
    return tuple(out)
