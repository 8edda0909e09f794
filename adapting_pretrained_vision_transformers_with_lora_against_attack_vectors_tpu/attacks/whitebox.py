"""White-box gradient attacks: FGSM and PGD as single compiled XLA programs.

Capability parity with the reference's attack factory
(whitebox_attacks.py:22-38 custom FGSM; :108-113 torchattacks PGD with
eps=8/255, alpha=3/255, 30 iters, random start), re-designed TPU-first:

* The whole PGD budget is **one jitted program** — a ``lax.scan`` over attack
  steps, each a fused forward+backward on the MXU. The reference pays a
  Python-loop dispatch per step inside torchattacks; here step count is
  static and XLA pipelines the loop (SURVEY.md §3.2 "HOT LOOP #3").
* Attacks are **model-agnostic**: they close over any registry entry's pure
  ``apply`` — including LoRA-attached or LoRA-merged params — so
  adversarial generation against adapted models needs no wrapper classes.
* Batch axis shards over the data mesh; running under ``jit`` with sharded
  inputs turns the attack into an SPMD program with zero code change.

Semantics:
* FGSM: single signed-gradient step of size eps from the clean image,
  clamped to [0,1] (matches whitebox_attacks.py:22-38 — no ball projection
  beyond the single step).
* PGD: optional uniform random start in the eps-ball, ``steps`` iterations
  of ``x += alpha * sign(grad)`` each projected onto the Linf ball around
  the clean image intersected with [0,1] (torchattacks.PGD semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .common import (IMAGENET, Normalizer, linf_project, sum_cross_entropy,
                     to_unit_floats)

# apply_fn: (params, images_normalized) -> logits. Factories below take the
# registry-style (entry_apply, cfg) pair and a Normalizer and build this.


def _loss_grad(apply_fn: Callable, normalize: Normalizer):
    def loss(x, params, labels):
        logits = apply_fn(params, normalize(x))
        return sum_cross_entropy(logits, labels)

    return jax.grad(loss, argnums=0)


def fgsm(apply_fn: Callable, params, images: jax.Array, labels: jax.Array, *,
         eps: float, normalize: Normalizer = IMAGENET) -> jax.Array:
    """One signed-gradient ascent step; output in [0,1]."""
    g = _loss_grad(apply_fn, normalize)(images, params, labels)
    return jnp.clip(images + eps * jnp.sign(g), 0.0, 1.0)


def pgd(apply_fn: Callable, params, images: jax.Array, labels: jax.Array, *,
        eps: float, alpha: float, steps: int, random_start: bool = True,
        rng: Optional[jax.Array] = None,
        normalize: Normalizer = IMAGENET) -> jax.Array:
    """Projected gradient descent, the whole budget as one ``lax.scan``."""
    grad_fn = _loss_grad(apply_fn, normalize)

    x = images
    if random_start:
        if rng is None:
            rng = jax.random.key(0)
        noise = jax.random.uniform(rng, images.shape, images.dtype, -eps, eps)
        x = linf_project(images + noise, images, eps)

    def step(x, _):
        g = grad_fn(x, params, labels)
        x = linf_project(x + alpha * jnp.sign(g), images, eps)
        return x, None

    x, _ = jax.lax.scan(step, x, None, length=steps)
    return x


def make_fgsm(entry_apply: Callable, cfg, *, eps: float,
              normalize: Normalizer = IMAGENET) -> Callable:
    """Jitted ``(params, images, labels) -> adv`` FGSM program."""
    apply_fn = partial(entry_apply, cfg)

    @jax.jit
    def run(params, images, labels):
        return fgsm(apply_fn, params, to_unit_floats(images), labels, eps=eps,
                    normalize=normalize)

    return run


def make_pgd(entry_apply: Callable, cfg, *, eps: float, alpha: float, steps: int,
             random_start: bool = True, normalize: Normalizer = IMAGENET) -> Callable:
    """Jitted ``(params, images, labels, rng) -> adv`` PGD program.

    The returned callable is the north-star benchmark unit (BASELINE.md):
    `steps` fused forward/backward passes per batch, compiled once.
    """
    apply_fn = partial(entry_apply, cfg)

    @jax.jit
    def run(params, images, labels, rng):
        return pgd(apply_fn, params, to_unit_floats(images), labels, eps=eps,
                   alpha=alpha, steps=steps, random_start=random_start,
                   rng=rng, normalize=normalize)

    return run
