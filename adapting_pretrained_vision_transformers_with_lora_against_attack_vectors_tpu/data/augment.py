"""On-device train-time augmentation — one fused program per batch.

Capability parity with the reference's torchvision train pipeline
(train.py:128-135: ``RandomRotation(15) -> RandomResizedCrop(224) ->
RandomHorizontalFlip -> ColorJitter(0.2, 0.2, 0.2)``), re-designed for TPU:

* The three geometric ops compose into a **single inverse affine** per image
  (rotation ∘ crop-resize ∘ flip), sampled once with ``jax.random`` and
  applied with one gather-free bilinear resample (separable soft-one-hot
  contractions on the MXU — see ``_warp_one``) — one resample instead of
  torchvision's three sequential PIL passes (which also triple
  interpolation blur). Out-of-bounds pixels fill 0 like torchvision's
  rotation fill.
* Color jitter multiplies brightness and interpolates contrast/saturation
  around the per-image mean / luma in fixed order (torchvision randomizes
  the order per sample; the factor distributions match: U(1-v, 1+v)).
* Everything is elementwise/gather work fused by XLA into the training
  step; the host ships the same uint8 eval-geometry batch either way.

Runs inside the jitted train step via ``make_train_step(step_rng=...)`` —
each step draws fresh parameters from the folded step key.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    rotation_deg: float = 15.0
    crop_scale: tuple[float, float] = (0.08, 1.0)   # RandomResizedCrop default
    crop_ratio: tuple[float, float] = (3 / 4, 4 / 3)
    hflip_p: float = 0.5
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2


DEFAULT = AugmentConfig()


def _sample_affine(rng: jax.Array, n: int, size: int, cfg: AugmentConfig):
    """Per-image inverse-affine params: 2x2 matrix + translation (pixels)."""
    r_rot, r_area, r_ratio, r_pos, r_flip = jax.random.split(rng, 5)

    theta = jnp.deg2rad(jax.random.uniform(
        r_rot, (n,), minval=-cfg.rotation_deg, maxval=cfg.rotation_deg))

    # RandomResizedCrop: area fraction + log-uniform aspect ratio
    area = jax.random.uniform(r_area, (n,), minval=cfg.crop_scale[0],
                              maxval=cfg.crop_scale[1])
    log_r = jax.random.uniform(r_ratio, (n,),
                               minval=math.log(cfg.crop_ratio[0]),
                               maxval=math.log(cfg.crop_ratio[1]))
    ratio = jnp.exp(log_r)
    crop_w = jnp.sqrt(area * ratio) * size
    crop_h = jnp.sqrt(area / ratio) * size
    crop_w = jnp.minimum(crop_w, size)
    crop_h = jnp.minimum(crop_h, size)
    # top-left corner uniform within bounds
    uv = jax.random.uniform(r_pos, (2, n))
    x0 = uv[0] * (size - crop_w)
    y0 = uv[1] * (size - crop_h)

    flip = jax.random.bernoulli(r_flip, cfg.hflip_p, (n,))

    # Inverse mapping out -> in. Output pixel (ox, oy) in [0, size):
    #   crop coords: cx = x0 + ox * crop_w/size (flip: mirror ox first)
    #   rotation (about image center c): src = R(theta) @ (crop - c) + c
    sx = crop_w / size
    sy = crop_h / size
    sign = jnp.where(flip, -1.0, 1.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    c = (size - 1) / 2.0

    # affine: src = A @ [ox, oy] + t
    a00 = cos * sx * sign
    a01 = -sin * sy
    a10 = sin * sx * sign
    a11 = cos * sy
    # crop offset relative to center, with flip folding into the ox term
    ox_off = x0 + jnp.where(flip, crop_w - sx, 0.0) - c
    oy_off = y0 - c
    t_x = cos * ox_off - sin * oy_off + c
    t_y = sin * ox_off + cos * oy_off + c
    return (a00, a01, a10, a11, t_x, t_y)


def _warp_one(image: jax.Array, affine,
              rot_bound_deg: float = 90.0) -> jax.Array:
    """Inverse-affine bilinear warp, gather-free.

    map_coordinates' dynamic gathers serialize on TPU (~12 ms per 224px
    image — 10x the whole ViT-B train-step cost at batch 32). Order-1
    interpolation is separable and linear in the source, so the warp is a
    row-weight matmul plus a column-weight contraction with soft one-hot
    weights relu(1-|coord-index|) — identical numerics to
    map_coordinates(order=1, mode='constant', cval=0), including the edge
    decay to the zero fill (parity-tested in tests/test_augment.py).
    Output rows are processed in chunks under ``lax.map`` to bound the
    per-chunk intermediate; the matmuls ride the MXU.

    Channels ride the einsum BATCH dim (``ckq``), not the contraction's
    minor dim: with the original ``(s, s*3)`` flattening the row-matmul
    output interleaved q (the column to be reduced next) with channel in
    the minor dim, and XLA inserted a full layout copy of the (r*s, s*3)
    intermediate every chunk — 26 ms/step at B=64/224px, 44% of the whole
    warp. Batching channels keeps q minor through both contractions:
    same FLOPs, zero copies, bit-identical output, 6.8x faster on v5e
    (62.3 -> 9.2 ms per 64-image batch; see PERF.md "train augmentation").

    The row contraction is additionally **band-limited**: within one chunk
    of ``r`` output rows the source rows ``src_y`` span at most
    ``sin(rot_bound)*(s-1) + (r-1)`` pixels (``|a10| <= sin(rot_bound)``
    because the crop never upscales, ``|a11| <= 1``), yet the dense weight
    matrix contracts over all ``s`` source rows — >2/3 of the matmul
    multiplies weights that are exactly zero. A per-chunk dynamic window of
    static width ``w`` over the source rows keeps every nonzero weight
    (bilinear support is 2 rows) so the output stays bit-identical while
    the dominant einsum shrinks ``s/w``-fold (224 -> 72 at the default 15
    degrees). ``rot_bound_deg`` is the *static* bound the window is sized
    from; callers pass their ``AugmentConfig.rotation_deg``.
    """
    a00, a01, a10, a11, t_x, t_y = affine
    s = image.shape[0]
    n_chunks = next(c for c in (28, 16, 8, 4, 2, 1) if s % c == 0)
    r = s // n_chunks
    idx = jnp.arange(s, dtype=jnp.float32)
    imgc = image.transpose(2, 0, 1)  # (channel, src_row, src_col)

    a10_bound = (1.0 if abs(rot_bound_deg) >= 90.0
                 else math.sin(math.radians(abs(rot_bound_deg))))
    needed = int(math.ceil(a10_bound * (s - 1) + (r - 1))) + 3
    w = min(s, -(-needed // 8) * 8)

    def chunk(cy):
        oy = cy.astype(jnp.float32) * r + jnp.arange(r, dtype=jnp.float32)
        ox = jnp.arange(s, dtype=jnp.float32)
        oyg, oxg = jnp.meshgrid(oy, ox, indexing="ij")  # (r, s)
        src_x = (a00 * oxg + a01 * oyg + t_x).reshape(-1)  # (r*s,)
        src_y = (a10 * oxg + a11 * oyg + t_y).reshape(-1)
        if w < s:
            lo = jnp.clip(jnp.floor(jnp.min(src_y)), 0, s - w)
            idx_k = lo + jnp.arange(w, dtype=jnp.float32)
            img_k = jax.lax.dynamic_slice(
                imgc, (0, lo.astype(jnp.int32), 0), (3, w, s))
        else:
            idx_k, img_k = idx, imgc
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(src_y[:, None] - idx_k))  # (p, w)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(src_x[:, None] - idx))  # (p, q)
        t = jnp.einsum("pk,ckq->cpq", wy, img_k)  # rows sampled at src_y
        out = jnp.einsum("pq,cpq->pc", wx, t)  # columns sampled at src_x
        return out.reshape(r, s, 3)

    return jax.lax.map(chunk, jnp.arange(n_chunks)).reshape(s, s, 3)


def _color_jitter(images: jax.Array, rng: jax.Array,
                  cfg: AugmentConfig) -> jax.Array:
    n = images.shape[0]
    r_b, r_c, r_s = jax.random.split(rng, 3)
    shape = (n, 1, 1, 1)

    def factor(r, v):
        return jax.random.uniform(r, shape, minval=max(0.0, 1 - v),
                                  maxval=1 + v)

    x = images
    if cfg.brightness > 0:
        x = x * factor(r_b, cfg.brightness)
    if cfg.contrast > 0:
        # torchvision: blend with the mean of the grayscale image
        luma = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        mean = luma.mean(axis=(1, 2)).reshape(n, 1, 1, 1)
        x = mean + (x - mean) * factor(r_c, cfg.contrast)
    if cfg.saturation > 0:
        luma = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])[..., None]
        x = luma + (x - luma) * factor(r_s, cfg.saturation)
    return jnp.clip(x, 0.0, 1.0)


def train_augment(images: jax.Array, rng: jax.Array,
                  cfg: AugmentConfig = DEFAULT) -> jax.Array:
    """(B, S, S, 3) [0,1] floats -> augmented batch, fresh draws per call."""
    n, size = images.shape[0], images.shape[1]
    r_geom, r_color = jax.random.split(rng)
    affine = _sample_affine(r_geom, n, size, cfg)
    out = jax.vmap(
        lambda im, af: _warp_one(im, af, cfg.rotation_deg))(images, affine)
    return _color_jitter(out, r_color, cfg)
