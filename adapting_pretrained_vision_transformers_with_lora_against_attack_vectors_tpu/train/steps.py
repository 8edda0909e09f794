"""Jitted train/eval steps — the framework's hot loops.

Replaces the reference's per-batch Python train loop (train.py:25-53: H2D
copy, forward, backward, ``.item()`` metric sync every batch) with:

* one compiled ``train_step`` with **donated** state (no buffer churn),
* **on-device metric accumulation** (loss sum / correct count / confusion
  matrix) — metrics cross to host once per epoch, not once per batch,
* a ``valid`` mask so padded final batches keep shapes static (XLA traces
  one program per shape),
* batch axes sharded over the data mesh: under jit the same step is the
  SPMD multi-chip program; gradient reduction is XLA's inserted ``psum``.

The same factories serve full fine-tuning (trainable = whole param tree,
reference train.py) and LoRA-adapter training (trainable = adapter pytree,
frozen base closed over via ``ops.lora.attach``, reference
train_loras.py:284-351) — "what is trainable" is just "what is in
``state.params``".
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..attacks.common import IMAGENET, Normalizer
from ..attacks.common import to_unit_floats as _to_unit_floats


class TrainState(NamedTuple):
    """Pytree of everything a step mutates (donate-friendly)."""

    params: Any  # trainable pytree (full model params OR a LoRA adapter)
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    forward: Callable[..., jax.Array],
    tx: optax.GradientTransformation,
    *,
    normalize: Optional[Normalizer] = IMAGENET,
    step_rng: Optional[jax.Array] = None,
    augment: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    frozen: Any = None,
) -> Callable:
    """Build the jitted ``(state, images, labels, valid) -> (state, metrics)``.

    ``forward(trainable, normalized_images) -> logits``. For base training
    pass ``lambda p, x: entry.apply(cfg, p, x)``.

    ``frozen``: optional non-trainable pytree (e.g. the frozen base params of
    LoRA training). When given, ``forward`` is called as
    ``forward(frozen, trainable, x, ...)`` and the tree is threaded through
    jit as a real ARGUMENT — closing over 344 MB of ViT-B base params would
    embed them in the lowered module, which the axon backend's remote-compile
    upload rejects (HTTP 413) and which re-uploads with every recompile on
    any backend.

    ``step_rng``: optional base PRNG key — when given, ``forward`` is called
    as ``forward(trainable, x, rng)`` with ``rng = fold_in(step_rng, step)``
    (stochastic training-time branches such as LoRA dropout).

    ``augment``: optional ``(images_01, rng) -> images_01`` applied on device
    *before* normalization (``data.augment.train_augment``); requires
    ``step_rng``. The whole augmentation fuses into the compiled step.

    ``valid``: float mask (B,) — 1 for real samples, 0 for padding.
    Metrics are *sums* (loss_sum, correct, count) so they accumulate across
    batches and reduce exactly.
    """
    if augment is not None and step_rng is None:
        raise ValueError("augment requires step_rng")

    def loss_fn(trainable, frozen_tree, rng_base, images, labels, valid, step):
        images = _to_unit_floats(images)
        rng = (jax.random.fold_in(rng_base, step)
               if step_rng is not None else None)
        if augment is not None:
            r_aug, rng = jax.random.split(rng)
            images = augment(images, r_aug)
        x = normalize(images) if normalize is not None else images
        args = (trainable, x) if frozen is None else (frozen_tree, trainable, x)
        logits = forward(*args, rng) if step_rng is not None else forward(*args)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        loss = (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        preds = jnp.argmax(logits, axis=-1)
        correct = ((preds == labels) * valid).sum()
        return loss, correct

    @partial(jax.jit, donate_argnums=(0,))
    def train_step_impl(state: TrainState, frozen_tree, rng_base, images,
                        labels, valid):
        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen_tree, rng_base, images, labels, valid,
            state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        metrics = {
            "loss_sum": loss * valid.sum(),
            "correct": correct,
            "count": valid.sum(),
        }
        return new_state, metrics

    def train_step(state: TrainState, images, labels, valid):
        # frozen and step_rng ride through jit as ARGUMENTS: big frozen trees
        # must not be embedded in the module (axon 413 — see docstring), and a
        # closed-over rng key would change the program hash per run, forcing
        # a full recompile for every adapter in a sweep.
        return train_step_impl(state, frozen, step_rng, images, labels, valid)

    return train_step


def make_eval_step(
    forward: Callable[[Any, jax.Array], jax.Array],
    num_classes: int,
    *,
    normalize: Optional[Normalizer] = IMAGENET,
    frozen: Any = None,
) -> Callable:
    """Jitted ``(params, images, labels, valid) -> (loss_sum, confusion)``.

    The confusion matrix (C×C, accumulated on device) carries everything the
    reference computes via sklearn on host-gathered predictions
    (train.py:85-110: accuracy + weighted F1) — see
    ``train.metrics.confusion_matrix_metrics``.

    ``frozen``: see ``make_train_step`` — threaded through jit as a real
    argument, with ``forward(frozen, params, x)`` calling convention.
    """

    @jax.jit
    def eval_step_impl(params, frozen_tree, images, labels, valid):
        images = _to_unit_floats(images)
        x = normalize(images) if normalize is not None else images
        logits = (forward(params, x) if frozen is None
                  else forward(frozen_tree, params, x))
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        preds = jnp.argmax(logits, axis=-1)
        conf = jnp.zeros((num_classes, num_classes), jnp.float32)
        conf = conf.at[labels, preds].add(valid)
        return (ce * valid).sum(), conf

    def eval_step(params, images, labels, valid):
        return eval_step_impl(params, frozen, images, labels, valid)

    return eval_step
