"""RP2 (Robust Physical Perturbations) — per-class sign-constrained patches.

The reference's ``rp2_attack.py`` is broken at HEAD (missing Utils imports,
an ART class that doesn't exist in ART 1.20.1 — SURVEY.md §2.4 item 10); this
module implements the *documented intent* (reference README.md:124-141 and
rp2_attack.py:33-91): per-class circular patch pinned at the sign center
(patch_location (0.5, 0.5), rp2_attack.py:49), physical-world EOT over
brightness U(0.8, 1.2) and scale U(0.4, 1.0), Adam lr 0.1, 500 iterations,
untargeted, composited only *inside a sign mask* so the perturbation stays on
the physical sign surface (``apply_sign_constrained_patch``,
rp2_attack.py:65-72).

TPU design: reuses :mod:`attacks.patch`'s in-graph EOT machinery — each
class's patch trains as one ``lax.scan`` program; the per-class sweep is a
host loop over one compiled program (class data as arguments)."""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import IMAGENET, Normalizer, to_unit_floats
from .patch import PatchConfig, make_apply_patch, make_train_patch, patch_mask


def rp2_config(*, patch_size: int = 32, image_size: int = 224,
               iters: int = 500, learning_rate: float = 0.1,
               batch_size: int = 16) -> PatchConfig:
    """Reference RP2 hyperparameters (rp2_attack.py:47-60).

    ART's ``patch_scale=(P/224, P/224)`` with ``scale_range=(0.4, 1.0)``
    means the on-image footprint is U(0.4, 1.0)·P/S of the image side."""
    base = patch_size / image_size
    return PatchConfig(
        patch_size=patch_size,
        shape="circle",
        rotation_max_deg=0.0,  # rotation_weights=[1.0, 0, 0]: no rotation
        scale_min=0.4 * base,
        scale_max=1.0 * base,
        brightness_range=(0.8, 1.2),
        learning_rate=learning_rate,
        iters=iters,
        batch_size=batch_size,
        targeted=False,
    )


def sign_mask(image_size: int, *, radius_frac: float = 0.45) -> jax.Array:
    """(H, W, 1) disk mask approximating the sign surface: unified-dataset
    crops center the sign (Process.py pads-and-centers every crop), so a
    centered disk is the documented constraint region."""
    yy, xx = jnp.mgrid[0:image_size, 0:image_size].astype(jnp.float32)
    c = (image_size - 1) / 2.0
    r = radius_frac * image_size
    return (((xx - c) ** 2 + (yy - c) ** 2) < r ** 2).astype(jnp.float32)[..., None]


def make_sign_constrained_apply(cfg: PatchConfig, *,
                                radius_frac: float = 0.45) -> Callable:
    """Jitted ``(images, patch, rng, scale) -> patched`` with the composite
    confined to the sign mask (rp2_attack.py:65-72 semantics:
    ``images·(1-mask) + patched·mask``)."""
    apply_fn = make_apply_patch(cfg, fixed_location=(0.5, 0.5))

    @jax.jit
    def run(images, patch, rng, scale):
        images = to_unit_floats(images)
        patched = apply_fn(images, patch, rng, scale)
        m = sign_mask(images.shape[1], radius_frac=radius_frac)
        return images * (1.0 - m) + patched * m

    return run


def train_rp2_patches(
    entry_apply: Callable,
    model_cfg,
    params,
    images: np.ndarray,
    labels: np.ndarray,
    *,
    cfg: Optional[PatchConfig] = None,
    classes: Optional[list[int]] = None,
    min_samples: int = 2,
    normalize: Normalizer = IMAGENET,
    rng: Optional[jax.Array] = None,
    log: Callable[[str], None] = print,
) -> dict[int, np.ndarray]:
    """Train one patch per class (reference per-class loop, rp2_attack.py:94-160).

    ``images``/``labels``: the training subset ([0,1] NHWC floats / int).
    Returns ``{class_index: (P, P, 3) patch}``. One compiled program serves
    every class — per-class sample counts are padded to the largest class so
    shapes stay static."""
    cfg = cfg or rp2_config(image_size=images.shape[1])
    rng = rng if rng is not None else jax.random.key(0)
    train_fn = make_train_patch(entry_apply, model_cfg, cfg,
                                normalize=normalize,
                                fixed_location=(0.5, 0.5))

    present = classes if classes is not None else sorted(set(int(l) for l in labels))
    counts = {c: int((labels == c).sum()) for c in present}
    eligible = [c for c in present if counts[c] >= min_samples]
    if not eligible:
        return {}
    pad_to = max(counts[c] for c in eligible)

    patches: dict[int, np.ndarray] = {}
    for c in eligible:
        idx = np.nonzero(labels == c)[0]
        take = np.resize(idx, pad_to)  # repeat to the static shape
        cls_images = jnp.asarray(images[take])
        cls_labels = jnp.asarray(labels[take])
        patch, losses = train_fn(params, cls_images, cls_labels,
                                 jax.random.fold_in(rng, c))
        patches[c] = np.asarray(jax.device_get(patch))
        log(f"rp2 class {c}: {counts[c]} samples, "
            f"final loss {float(jax.device_get(losses)[-1]):.4f}")
    return patches


def save_class_patches(patches: Mapping[int, np.ndarray], out_dir: str,
                       *, cfg: Optional[PatchConfig] = None,
                       class_names: Optional[Mapping[int, str]] = None) -> None:
    """Per-class patch PNG dump (reference rp2_attack.py:156-160), with the
    circular mask applied so the saved artifact is the physical sticker."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for c, patch in patches.items():
        img = patch
        if cfg is not None:
            img = patch * np.asarray(patch_mask(cfg))[..., None]
        name = (class_names or {}).get(c, f"class_{c}")
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(out_dir, f"rp2_patch_{name}.png"))
