"""Pallas TPU kernels — the framework's hand-written native compute layer.

The reference has no native code of its own (SURVEY.md §2: CUDA lives inside
torch wheels); here the "native layer" for the compute path is Mosaic/Pallas.
Kernels are opt-in per model config and always have an XLA-composed
reference implementation to fall back to (and to test against).

This package root holds the numerics shared by several kernels — the f32
LayerNorm forward/backward used by both halves of the fused encoder block
(``attn_block`` and ``mlp.fused_ln_mlp``) and the VMEM budget every
``fits_vmem`` estimate is checked against — ONE copy each, so a numerics or
budget change cannot silently desynchronize the fused paths.
"""

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``x`` (shared tile-padding helper)."""
    return ((x + m - 1) // m) * m


# Per-program VMEM budget the kernels size themselves against: ~16 MB
# physical minus headroom for Mosaic's own scratch. Shared by every
# fits_vmem estimate.
VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def ln_fwd_f32(xf: jax.Array, scale: jax.Array, bias: jax.Array, eps: float):
    """f32 row LayerNorm (``ops.nn.layer_norm`` numerics, two-pass mean/var).

    ``xf``: (..., D) float32; ``scale``/``bias``: broadcastable rows (any
    dtype — upcast here). Returns ``(normed, rstd, h_f32)`` so backward
    kernels can reuse the normalized rows without recomputing.
    """
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    normed = xc * rstd
    h = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return normed, rstd, h


def ln_bwd_f32(dh: jax.Array, scale: jax.Array, normed: jax.Array,
               rstd: jax.Array) -> jax.Array:
    """Input gradient of :func:`ln_fwd_f32` (all-f32 LayerNorm VJP):
    ``dx = rstd * (dn - mean(dn) - normed * mean(dn * normed))``."""
    dn = dh * scale.astype(jnp.float32)
    m1 = jnp.mean(dn, axis=-1, keepdims=True)
    m2 = jnp.mean(dn * normed, axis=-1, keepdims=True)
    return rstd * (dn - m1 - normed * m2)


from .attention import fused_attention  # noqa: E402,F401
