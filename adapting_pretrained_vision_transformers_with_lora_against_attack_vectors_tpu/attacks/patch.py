"""EOT adversarial patch attack — the whole optimization in one XLA program.

Capability parity with the reference's ART ``AdversarialPatchPyTorch`` usage
(patch_attack.py:47-75: circle/square patches, rotation <=22.5 deg, train
scale U(0.05, 1.0), Adam lr 5.0, 500 iters, untargeted by default; :196-208:
application at per-batch random scale U(0.1, 0.5)), re-designed TPU-first:

* ART bounces torch<->numpy every batch and drives EOT sampling from Python
  (SURVEY.md §3.3 "HOT LOOP #4"). Here random rotation/scale/translation/
  brightness are drawn with ``jax.random`` *inside* the program, the patch
  composite is a gather-free bilinear resample (separable einsum
  contractions on the MXU — see ``_composite_one``), and the full
  iteration budget is a ``lax.scan`` — patch training never leaves HBM.
* Gradients flow only into the patch (a single (P, P, 3) tensor); the model
  is closed over, so any registry backbone / LoRA-adapted variant works.
* The same composite primitive serves training, application, and RP2's
  sign-constrained variant (``attacks/rp2.py``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .common import IMAGENET, Normalizer, to_unit_floats


@dataclasses.dataclass(frozen=True)
class PatchConfig:
    """Static patch-attack hyperparameters (reference patch_attack.py:79-110)."""

    patch_size: int = 24
    shape: str = "circle"  # 'circle' | 'square'
    rotation_max_deg: float = 22.5
    scale_min: float = 0.05
    scale_max: float = 1.0
    brightness_range: tuple[float, float] = (1.0, 1.0)  # RP2: (0.8, 1.2)
    learning_rate: float = 5.0
    iters: int = 500
    batch_size: int = 16
    targeted: bool = False
    target_class: int = 0


def patch_mask(cfg: PatchConfig) -> jax.Array:
    """(P, P) float mask: inscribed disk for 'circle', ones for 'square'."""
    p = cfg.patch_size
    if cfg.shape == "square":
        return jnp.ones((p, p), jnp.float32)
    yy, xx = jnp.mgrid[0:p, 0:p].astype(jnp.float32)
    c = (p - 1) / 2.0
    r = p / 2.0
    return ((xx - c) ** 2 + (yy - c) ** 2 < r ** 2).astype(jnp.float32)


def init_patch(cfg: PatchConfig) -> jax.Array:
    """Mid-gray start (ART's default initialisation is the clip midpoint)."""
    return jnp.full((cfg.patch_size, cfg.patch_size, 3), 0.5, jnp.float32)


def _composite_one(image: jax.Array, patch: jax.Array, mask: jax.Array,
                   scale: jax.Array, theta: jax.Array, tx: jax.Array,
                   ty: jax.Array, brightness: jax.Array) -> jax.Array:
    """Overlay ``patch`` on ``image`` under an affine EOT sample.

    ``scale`` is the patch footprint as a fraction of the image side; the
    patch center lands at image center + (tx, ty) pixels; ``theta`` rotates
    the patch; ``brightness`` multiplies patch pixels (RP2 physical
    lighting augmentation). Bilinear resample via ``map_coordinates``;
    out-of-footprint pixels keep the image. Bilinear resample expressed as
    einsum contractions (MXU-friendly; see inline note below).
    """
    s = image.shape[0]
    p = patch.shape[0]
    yy, xx = jnp.mgrid[0:s, 0:s].astype(jnp.float32)
    cy = cx = (s - 1) / 2.0
    # image-plane offsets from the (translated) patch center
    dx = xx - cx - tx
    dy = yy - cy - ty
    # inverse-rotate and un-scale into patch coordinates
    cos, sin = jnp.cos(-theta), jnp.sin(-theta)
    k = scale * s / p  # image pixels per patch pixel
    u = (cos * dx - sin * dy) / k + (p - 1) / 2.0
    v = (sin * dx + cos * dy) / k + (p - 1) / 2.0

    # Bilinear sampling as two einsum contractions instead of gathers.
    # map_coordinates' dynamic gathers serialize on TPU (~0.7 s per EOT
    # iteration at batch 24 — slow enough that a 500-iter scan trips the
    # device watchdog); but order-1 interpolation is separable and linear in
    # the patch, so sample[y,x] = sum_pq A[yx,p] B[yx,q] patch[p,q] with the
    # soft one-hot weights A = relu(1-|v-p|), B = relu(1-|u-q|). Rows whose
    # coordinate falls outside the patch decay to zero weight — exactly
    # `mode='constant', cval=0` semantics (parity-tested against
    # map_coordinates in tests/test_attacks.py). All MXU/VPU work, no
    # gathers: ~70x faster end-to-end per EOT iteration.
    n = s * s
    idx = jnp.arange(p, dtype=jnp.float32)
    wv = jnp.maximum(0.0, 1.0 - jnp.abs(v.reshape(n)[:, None] - idx))  # (n,P)
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(u.reshape(n)[:, None] - idx))  # (n,P)
    planes = jnp.concatenate([patch, mask[..., None]], axis=-1)  # (P,P,4)
    t = jnp.einsum("nq,pqc->npc", wu, planes)
    samp = jnp.einsum("np,npc->nc", wv, t)  # (n, 4)
    patch_rgb = samp[:, :3].reshape(s, s, 3)
    m = samp[:, 3].reshape(s, s, 1)
    patched = jnp.clip(patch_rgb * brightness, 0.0, 1.0)
    return image * (1.0 - m) + patched * m


def _sample_eot(rng: jax.Array, n: int, cfg: PatchConfig, image_size: int,
                *, scale_min: Optional[float] = None,
                scale_max: Optional[float] = None) -> tuple:
    """Per-sample EOT parameters: scale, rotation, in-bounds translation,
    brightness."""
    r_s, r_t, r_xy, r_b = jax.random.split(rng, 4)
    lo = cfg.scale_min if scale_min is None else scale_min
    hi = cfg.scale_max if scale_max is None else scale_max
    scale = jax.random.uniform(r_s, (n,), minval=lo, maxval=hi)
    rot = jnp.deg2rad(cfg.rotation_max_deg)
    theta = jax.random.uniform(r_t, (n,), minval=-rot, maxval=rot)
    # keep the (rotation-safe, sqrt(2)-inflated) footprint inside the image
    half_extent = scale * image_size * jnp.sqrt(2.0) / 2.0
    max_shift = jnp.maximum(image_size / 2.0 - half_extent, 0.0)
    txy = jax.random.uniform(r_xy, (2, n), minval=-1.0, maxval=1.0) * max_shift
    b_lo, b_hi = cfg.brightness_range
    brightness = jax.random.uniform(r_b, (n,), minval=b_lo, maxval=b_hi)
    return scale, theta, txy[0], txy[1], brightness


def composite_batch(images: jax.Array, patch: jax.Array, mask: jax.Array,
                    eot_params: tuple) -> jax.Array:
    scale, theta, tx, ty, brightness = eot_params
    return jax.vmap(_composite_one, in_axes=(0, None, None, 0, 0, 0, 0, 0))(
        images, patch, mask, scale, theta, tx, ty, brightness)


def make_train_patch(
    entry_apply: Callable,
    model_cfg,
    cfg: PatchConfig,
    *,
    normalize: Normalizer = IMAGENET,
    fixed_location: Optional[tuple[float, float]] = None,
) -> Callable:
    """Build the jitted patch-training program.

    Returns ``run(params, images, labels, rng) -> (patch, loss_history)``:
    ``images`` is the training subset (reference ``patch_sample_size``
    random samples, patch_attack.py:178-194); each of ``cfg.iters``
    iterations draws a minibatch + fresh EOT samples and takes one Adam
    step on the patch. ``fixed_location``: optional (x, y) center in [0,1]
    image coordinates (RP2 pins the patch at the sign center,
    rp2_attack.py:49).

    The returned ``run`` accepts an optional ``mask`` argument (default:
    ``patch_mask(cfg)``). The mask is a *runtime argument* of the jitted
    program, not a baked-in constant — so the circle and square patch types
    (reference patch_attack.py:148 loop) share ONE compiled program instead
    of recompiling the whole iteration scan per shape (each fresh ViT-B
    compile is minutes on the remote backend; the round-2 flagship run's
    879 s patch stage was mostly these compiles)."""
    apply_fn = partial(entry_apply, model_cfg)
    default_mask = patch_mask(cfg)
    tx_opt = optax.adam(cfg.learning_rate)

    def loss_fn(patch, params, images, labels, eot, mask):
        patched = composite_batch(images, patch, mask, eot)
        logits = apply_fn(params, normalize(patched))
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        return -ce if not cfg.targeted else ce

    @jax.jit
    def run_impl(params, images, labels, rng, mask):
        n = images.shape[0]
        image_size = images.shape[1]

        def step(carry, rng_i):
            patch, opt_state = carry
            r_idx, r_eot = jax.random.split(rng_i)
            idx = jax.random.randint(r_idx, (cfg.batch_size,), 0, n)
            mb_images = images[idx]
            mb_labels = labels[idx]
            if cfg.targeted:
                mb_labels = jnp.full_like(mb_labels, cfg.target_class)
            eot = _sample_eot(r_eot, cfg.batch_size, cfg, image_size)
            if fixed_location is not None:
                fx, fy = fixed_location
                tx = jnp.full((cfg.batch_size,), (fx - 0.5) * image_size)
                ty = jnp.full((cfg.batch_size,), (fy - 0.5) * image_size)
                eot = (eot[0], eot[1], tx, ty, eot[4])
            loss, grads = jax.value_and_grad(loss_fn)(patch, params, mb_images,
                                                      mb_labels, eot, mask)
            updates, opt_state = tx_opt.update(grads, opt_state, patch)
            patch = jnp.clip(optax.apply_updates(patch, updates), 0.0, 1.0)
            return (patch, opt_state), loss

        patch0 = init_patch(cfg)
        (patch, _), losses = jax.lax.scan(
            step, (patch0, tx_opt.init(patch0)), jax.random.split(rng, cfg.iters))
        return patch, losses

    def run(params, images, labels, rng, mask=None):
        return run_impl(params, images, labels, rng,
                        default_mask if mask is None else mask)

    run.jitted = run_impl  # introspection: tests assert one-compile reuse
    return run


def make_apply_patch(cfg: PatchConfig, *,
                     fixed_location: Optional[tuple[float, float]] = None
                     ) -> Callable:
    """Jitted ``(images, patch, rng, scale) -> patched`` application program.

    Scale is a runtime scalar so the reference's per-batch
    ``U(scale_min_apply, scale_max_apply)`` draw (patch_attack.py:199-208)
    costs no recompile; rotation/translation are random per image. ``mask``
    is likewise a runtime argument (default ``patch_mask(cfg)``) so
    circle/square application shares one compiled program."""
    default_mask = patch_mask(cfg)

    @jax.jit
    def run_impl(images, patch, rng, scale, mask):
        images = to_unit_floats(images)
        n, image_size = images.shape[0], images.shape[1]
        r_t, r_xy, r_b = jax.random.split(rng, 3)
        scale_b = jnp.full((n,), scale)
        rot = jnp.deg2rad(cfg.rotation_max_deg)
        theta = jax.random.uniform(r_t, (n,), minval=-rot, maxval=rot)
        half_extent = scale_b * image_size * jnp.sqrt(2.0) / 2.0
        max_shift = jnp.maximum(image_size / 2.0 - half_extent, 0.0)
        txy = jax.random.uniform(r_xy, (2, n), minval=-1.0, maxval=1.0) * max_shift
        tx, ty = txy[0], txy[1]
        if fixed_location is not None:
            fx, fy = fixed_location
            tx = jnp.full((n,), (fx - 0.5) * image_size)
            ty = jnp.full((n,), (fy - 0.5) * image_size)
        b_lo, b_hi = cfg.brightness_range
        brightness = jax.random.uniform(r_b, (n,), minval=b_lo, maxval=b_hi)
        return composite_batch(images, patch, mask,
                               (scale_b, theta, tx, ty, brightness))

    def run(images, patch, rng, scale, mask=None):
        return run_impl(images, patch, rng, scale,
                        default_mask if mask is None else mask)

    run.jitted = run_impl  # introspection: tests assert one-compile reuse
    return run
