"""Shared attack machinery.

Attacks in this framework operate on **unnormalized [0,1] NHWC images** and
fold the model's preprocessing normalization into the differentiated loss —
the convention the reference establishes via its ``NormalizedModel`` wrappers
and ``set_normalization_used`` (whitebox_attacks.py:104-113, 169;
patch_attack.py:16-25; auto_attack.py:47-54). Keeping the attack variable in
pixel space makes the Linf ball, the [0,1] clamp, and the uint8 PNG
quantization exact.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Normalizer:
    """Per-channel mean/std normalization folded into attack losses."""

    mean: tuple[float, float, float]
    std: tuple[float, float, float]

    def __call__(self, images: jax.Array) -> jax.Array:
        mean = jnp.asarray(self.mean, images.dtype)
        std = jnp.asarray(self.std, images.dtype)
        return (images - mean) / std

    def inverse(self, images: jax.Array) -> jax.Array:
        mean = jnp.asarray(self.mean, images.dtype)
        std = jnp.asarray(self.std, images.dtype)
        return images * std + mean


IMAGENET = Normalizer((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))


def to_unit_floats(images: jax.Array) -> jax.Array:
    """Trace-time dtype branch: uint8 batches (shipped over the wire at 1/4
    the f32 bytes) become [0,1] floats ON DEVICE; float inputs — already
    [0,1], e.g. adversarial tensors mid-pipeline — pass through unchanged.
    Every jitted attack/train/eval entry point applies this, so loaders can
    always hand uint8 to ``jax.device_put``."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def linf_project(x: jax.Array, origin: jax.Array, eps: float) -> jax.Array:
    """Project onto the Linf ball around ``origin`` intersected with [0,1]."""
    return jnp.clip(x, jnp.maximum(origin - eps, 0.0), jnp.minimum(origin + eps, 1.0))


def sum_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Summed CE — per-example input gradients are independent, so summing
    (instead of averaging) gives each example its full-magnitude gradient in
    a single batched backward pass."""
    import optax

    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).sum()


def uint8_quantize(images) -> np.ndarray:
    """[0,1] float -> uint8 with the reference's exact truncation semantics
    (``(img * 255).astype(np.uint8)``, Utils.py:106-113). Attacks evaluated
    downstream see images quantized to this grid, so parity evaluation must
    reproduce it (SURVEY.md §2.4 item 6).

    Device arrays are fetched with checksum verification (utils/transfer,
    defense-in-depth): an adversarial-image artifact written from a bad
    fetch would silently poison every downstream stage."""
    import jax

    if isinstance(images, jax.Array):
        from ..utils.transfer import verified_get

        images = verified_get(images)
    arr = np.clip(np.asarray(images), 0.0, 1.0)
    return (arr * 255.0).astype(np.uint8)


def from_uint8(images: np.ndarray) -> np.ndarray:
    return images.astype(np.float32) / 255.0
