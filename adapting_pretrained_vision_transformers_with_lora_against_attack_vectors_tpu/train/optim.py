"""Optimizer factories matching the reference's training recipes.

* Base fine-tune: AdamW(lr=1e-4, weight_decay=1e-4) + StepLR(step=20,
  gamma=0.1) stepped per epoch (reference train.py:203-204).
* LoRA defense: Adam(lr=1e-4), no schedule (reference train_loras.py:284).
"""

from __future__ import annotations

import optax


def steplr_schedule(base_lr: float, *, step_size_epochs: int, gamma: float,
                    steps_per_epoch: int) -> optax.Schedule:
    """torch ``StepLR`` semantics: lr · gamma^(epoch // step_size)."""

    def schedule(count):
        import jax.numpy as jnp

        epoch = count // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size_epochs).astype(jnp.float32)

    return schedule


def adamw_steplr(lr: float = 1e-4, *, weight_decay: float = 1e-4,
                 step_size_epochs: int = 20, gamma: float = 0.1,
                 steps_per_epoch: int = 1) -> optax.GradientTransformation:
    sched = steplr_schedule(lr, step_size_epochs=step_size_epochs, gamma=gamma,
                            steps_per_epoch=steps_per_epoch)
    return optax.adamw(sched, weight_decay=weight_decay)


def lora_adam(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.adam(lr)
