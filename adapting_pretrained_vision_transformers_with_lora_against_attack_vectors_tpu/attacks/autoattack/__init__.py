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

from ..common import IMAGENET, Normalizer, to_unit_floats
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

    # uint8 wire batches (attacks/common.to_unit_floats): the suite is a
    # host orchestrator, so convert once on device at entry rather than in
    # every stage program
    to_floats = jax.jit(to_unit_floats)

    # NOT jitted as one program on purpose: each stage is already a single
    # compiled scan; fusing all four (APGD x2 + FAB + 5000-query Square)
    # into one XLA computation would explode compile time for zero runtime
    # benefit. The inter-stage orchestration below runs on host so later
    # stages can COMPACT to the surviving examples (round 3): upstream
    # re-batches to idx_to_fool with fully dynamic shapes; here survivors
    # gather into the next power-of-two bucket (compile cache stays bounded
    # at log2(B) variants per stage) and scatter back with out-of-range pad
    # indices dropped. In the flagship run APGD-CE breaks ~95% of examples,
    # so stages 2-4 previously re-attacked a full batch to move a handful of
    # rows — the dominant cost of the suite (ROBUSTNESS.md: 1292 s).
    def run(params, images, labels, rng):
        import numpy as np
        import time

        if images.dtype == jnp.uint8:
            images = to_floats(images)
        expand = (slice(None),) + (None,) * (images.ndim - 1)
        b = images.shape[0]
        x_adv = images
        broken = np.array(misclassified(params, images, labels))  # writable copy
        for i, (name, attack) in enumerate(stages):
            remaining = np.nonzero(~broken)[0]
            if remaining.size == 0:
                break
            bucket = min(b, 1 << max(3, int(remaining.size - 1).bit_length()))
            # pad with out-of-range index b: gathers clamp (wasted rows),
            # scatters drop (mode="drop") — no duplicate-index write races
            idx = np.full((bucket,), b, np.int64)
            idx[: remaining.size] = remaining[:bucket]
            jidx = jnp.asarray(idx)
            x_sub = jnp.asarray(images)[jidx]
            y_sub = jnp.asarray(labels)[jidx]
            t0 = time.perf_counter()
            x_k = attack(params, x_sub, y_sub, jax.random.fold_in(rng, i))
            newly = misclassified(params, x_k, y_sub)
            newly_h = np.asarray(newly)  # host fetch syncs the stage's work
            run.stats.setdefault((name, bucket), []).append(
                time.perf_counter() - t0)
            x_adv = jnp.asarray(x_adv).at[jidx].set(
                jnp.where(newly[expand], x_k, jnp.asarray(x_adv)[jidx]),
                mode="drop")
            broken[idx[: remaining.size][newly_h[: remaining.size]]] = True
        return x_adv

    # Per-(stage, bucket) wall seconds, one entry per call; the first entry
    # of each key is compile+run (every new bucket size is a fresh XLA
    # program), the rest are warm. cli `autoattack` prints the summary so
    # flagship stage wall-clock (ROBUSTNESS_r03 attack-autoattack) is
    # attributed, not guessed.
    run.stats = {}
    return run


def robust_accuracy(entry_apply, model_cfg, params, x_adv, labels, *,
                    normalize: Normalizer = IMAGENET) -> float:
    logits = entry_apply(model_cfg, params, normalize(x_adv))
    return float(jnp.mean(jnp.argmax(logits, axis=-1) == labels))
