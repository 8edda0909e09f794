"""Common-corruption generators (non-adversarial robustness data).

The reference's sequential-LoRA study trains a second adapter on
Gaussian-noise-corrupted data (infLora.ipynb cells f47dcfcf/9713f297,
sigma=0.3). These are jittable pixel-space corruptions in [0,1]."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_noise(images: jax.Array, rng: jax.Array, *,
                   sigma: float = 0.3) -> jax.Array:
    """x + N(0, sigma^2), clipped to [0,1] (notebook parity)."""
    noise = sigma * jax.random.normal(rng, images.shape, images.dtype)
    return jnp.clip(images + noise, 0.0, 1.0)


def salt_and_pepper(images: jax.Array, rng: jax.Array, *,
                    amount: float = 0.05) -> jax.Array:
    r1, r2 = jax.random.split(rng)
    u = jax.random.uniform(r1, images.shape[:-1] + (1,))
    salt = jax.random.uniform(r2, images.shape[:-1] + (1,)) > 0.5
    out = jnp.where(u < amount, jnp.where(salt, 1.0, 0.0), images)
    return out.astype(images.dtype)


def brightness(images: jax.Array, rng: jax.Array, *,
               max_delta: float = 0.3) -> jax.Array:
    d = jax.random.uniform(rng, (images.shape[0], 1, 1, 1),
                           minval=-max_delta, maxval=max_delta)
    return jnp.clip(images + d, 0.0, 1.0)


CORRUPTIONS = {
    "gaussian_noise": gaussian_noise,
    "salt_and_pepper": salt_and_pepper,
    "brightness": brightness,
}
