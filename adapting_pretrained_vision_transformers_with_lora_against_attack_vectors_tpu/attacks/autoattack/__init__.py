"""AutoAttack 'standard' suite: APGD-CE -> APGD-T -> FAB-T -> Square.

Parity with the reference's ``AutoAttack(..., norm='Linf', eps=0.031,
version='standard', seed=42)`` usage (auto_attack.py:94-108), rebuilt as
four jitted JAX programs (see :mod:`apgd`, :mod:`fab`, :mod:`square`).

Execution model differs from the upstream library deliberately: upstream
shrinks the batch to still-robust examples between stages (dynamic shapes);
here every stage runs the full static-shape batch and a vectorized
first-success merge keeps each example's earliest adversarial — identical
robust-accuracy semantics, XLA-friendly shapes, and the stages pipeline
without host synchronization. The reference also re-instantiated the
adversary per batch with a fixed seed (auto_attack.py:94-108, SURVEY.md §2.4
item 5); here the caller passes one rng and each batch folds in its index.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..common import IMAGENET, Normalizer
from .apgd import APGDConfig, make_apgd, make_apgd_targeted
from .fab import FABConfig, make_fab_targeted
from .square import SquareConfig, make_square

__all__ = [
    "APGDConfig", "FABConfig", "SquareConfig", "AutoAttackConfig",
    "make_apgd", "make_apgd_targeted", "make_fab_targeted", "make_square",
    "make_autoattack",
]


@dataclasses.dataclass(frozen=True)
class AutoAttackConfig:
    """Standard-version hyperparameters (upstream defaults; reference
    eps=0.031, auto_attack.py:19)."""

    eps: float = 0.031
    n_iter: int = 100
    n_target_classes: int = 9
    square_queries: int = 5000
    attacks: tuple[str, ...] = ("apgd-ce", "apgd-t", "fab-t", "square")


def make_autoattack(
    entry_apply: Callable,
    model_cfg,
    cfg: AutoAttackConfig = AutoAttackConfig(),
    *,
    normalize: Normalizer = IMAGENET,
) -> Callable:
    """Build ``run(params, images, labels, rng) -> x_adv``.

    Each stage only replaces pixels of examples that are still correctly
    classified after all previous stages (first-success merge)."""
    apply_fn = partial(entry_apply, model_cfg)

    stages: list[tuple[str, Callable]] = []
    for name in cfg.attacks:
        if name == "apgd-ce":
            a = make_apgd(entry_apply, model_cfg,
                          APGDConfig(eps=cfg.eps, n_iter=cfg.n_iter, loss="ce"),
                          normalize=normalize)
            stages.append((name, lambda p, x, y, r, _a=a: _a(p, x, y, r)[0]))
        elif name == "apgd-t":
            a = make_apgd_targeted(
                entry_apply, model_cfg,
                APGDConfig(eps=cfg.eps, n_iter=cfg.n_iter,
                           n_target_classes=cfg.n_target_classes),
                normalize=normalize)
            stages.append((name, a))
        elif name == "fab-t":
            a = make_fab_targeted(
                entry_apply, model_cfg,
                FABConfig(eps=cfg.eps, n_iter=cfg.n_iter,
                          n_target_classes=cfg.n_target_classes),
                normalize=normalize)
            stages.append((name, a))
        elif name == "square":
            a = make_square(entry_apply, model_cfg,
                            SquareConfig(eps=cfg.eps,
                                         n_queries=cfg.square_queries),
                            normalize=normalize)
            stages.append((name, a))
        else:
            raise ValueError(f"unknown attack {name!r}")

    @jax.jit
    def misclassified(params, x, labels):
        return jnp.argmax(apply_fn(params, normalize(x)), axis=-1) != labels

    # NOT jitted as one program on purpose: each stage is already a single
    # compiled scan; fusing all four (APGD x2 + FAB + 5000-query Square)
    # into one XLA computation would explode compile time for zero runtime
    # benefit. The inter-stage merges below are a handful of cheap ops.
    def run(params, images, labels, rng):
        expand = (slice(None),) + (None,) * (images.ndim - 1)
        x_adv = images
        broken = misclassified(params, images, labels)  # clean errors count
        for i, (name, attack) in enumerate(stages):
            x_k = attack(params, images, labels, jax.random.fold_in(rng, i))
            newly = misclassified(params, x_k, labels) & (~broken)
            x_adv = jnp.where(newly[expand], x_k, x_adv)
            broken = broken | newly
        return x_adv

    return run


def robust_accuracy(entry_apply, model_cfg, params, x_adv, labels, *,
                    normalize: Normalizer = IMAGENET) -> float:
    logits = entry_apply(model_cfg, params, normalize(x_adv))
    return float(jnp.mean(jnp.argmax(logits, axis=-1) == labels))
