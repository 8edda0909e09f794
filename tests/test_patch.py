"""EOT patch + RP2 attack tests: composite geometry invariants, in-graph
training effectiveness on a toy model, sign-mask constraint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import patch as patch_mod
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import rp2
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks.common import Normalizer
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry

NORM = Normalizer((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
IDENT = Normalizer((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))


def small_cfg(**kw):
    kw.setdefault("patch_size", 8)
    kw.setdefault("iters", 30)
    kw.setdefault("batch_size", 4)
    return patch_mod.PatchConfig(**kw)


def test_patch_mask_shapes():
    circle = patch_mod.patch_mask(small_cfg(shape="circle"))
    square = patch_mod.patch_mask(small_cfg(shape="square"))
    assert square.sum() == 64
    assert 0 < circle.sum() < 64  # inscribed disk
    # disk is centered: symmetric under flips
    np.testing.assert_array_equal(np.asarray(circle), np.asarray(circle)[::-1])
    np.testing.assert_array_equal(np.asarray(circle), np.asarray(circle)[:, ::-1])


def test_composite_centered_no_rotation():
    """Patch at center, known scale: center pixel becomes the patch color,
    far corners stay image."""
    cfg = small_cfg(shape="square")
    image = jnp.zeros((32, 32, 3))
    patch = jnp.ones((8, 8, 3)) * 0.8
    mask = patch_mod.patch_mask(cfg)
    eot = (jnp.array([0.25]), jnp.array([0.0]), jnp.array([0.0]),
           jnp.array([0.0]), jnp.array([1.0]))
    out = patch_mod.composite_batch(image[None], patch, mask, eot)[0]
    out = np.asarray(out)
    assert abs(out[16, 16, 0] - 0.8) < 1e-5  # footprint 8px at center
    assert out[0, 0, 0] == 0.0 and out[31, 31, 0] == 0.0
    foot = (out[..., 0] > 0.4).sum()
    assert 36 <= foot <= 100  # ~8x8 = 64 pixels


def test_composite_translation_and_brightness():
    cfg = small_cfg(shape="square")
    image = jnp.zeros((32, 32, 3))
    patch = jnp.ones((8, 8, 3))
    mask = patch_mod.patch_mask(cfg)
    eot = (jnp.array([0.25]), jnp.array([0.0]), jnp.array([8.0]),
           jnp.array([-8.0]), jnp.array([0.5]))
    out = np.asarray(patch_mod.composite_batch(image[None], patch, mask, eot)[0])
    # moved to (+8, -8): brightest region centered near (8, 24)
    assert abs(out[8, 24, 0] - 0.5) < 1e-5
    assert out[24, 8, 0] == 0.0


def test_composite_matches_map_coordinates_reference():
    """The einsum-contraction bilinear composite (TPU-native, gather-free)
    must match a straight map_coordinates(order=1, constant, cval=0)
    implementation to float tolerance under arbitrary rotation/scale/
    translation/brightness."""
    cfg = small_cfg(shape="circle")
    rng = jax.random.key(7)
    image = jax.random.uniform(rng, (3, 32, 32, 3))
    patch = jax.random.uniform(jax.random.fold_in(rng, 1), (8, 8, 3))
    mask = patch_mod.patch_mask(cfg)
    eot = patch_mod._sample_eot(jax.random.fold_in(rng, 2), 3, cfg, 32)

    def reference_one(image, patch, mask, scale, theta, tx, ty, brightness):
        s, p = image.shape[0], patch.shape[0]
        yy, xx = jnp.mgrid[0:s, 0:s].astype(jnp.float32)
        cy = cx = (s - 1) / 2.0
        dx, dy = xx - cx - tx, yy - cy - ty
        cos, sin = jnp.cos(-theta), jnp.sin(-theta)
        k = scale * s / p
        u = (cos * dx - sin * dy) / k + (p - 1) / 2.0
        v = (sin * dx + cos * dy) / k + (p - 1) / 2.0
        coords = jnp.stack([v, u])
        patch_rgb = jnp.stack([
            jax.scipy.ndimage.map_coordinates(patch[..., c], coords, order=1,
                                              mode="constant", cval=0.0)
            for c in range(3)], axis=-1)
        m = jax.scipy.ndimage.map_coordinates(mask, coords, order=1,
                                              mode="constant", cval=0.0)[..., None]
        patched = jnp.clip(patch_rgb * brightness, 0.0, 1.0)
        return image * (1.0 - m) + patched * m

    got = patch_mod.composite_batch(image, patch, mask, eot)
    want = jax.vmap(reference_one, in_axes=(0, None, None, 0, 0, 0, 0, 0))(
        image, patch, mask, *eot)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_composite_stays_in_range():
    cfg = small_cfg()
    rng = jax.random.key(0)
    image = jax.random.uniform(rng, (2, 32, 32, 3))
    patch = jax.random.uniform(jax.random.fold_in(rng, 1), (8, 8, 3)) * 2.0
    mask = patch_mod.patch_mask(cfg)
    eot = patch_mod._sample_eot(jax.random.fold_in(rng, 2), 2, cfg, 32)
    out = np.asarray(patch_mod.composite_batch(image, patch, mask, eot))
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6


def test_patch_training_fools_model():
    """On vit_test, an untargeted patch trained in-graph must raise the CE
    loss of the true class (monotone-ish attack progress)."""
    entry = registry.get_model("vit_test")
    cfg = entry.config(5)
    params = entry.init(jax.random.key(0), cfg)
    pcfg = small_cfg(iters=40, scale_min=0.4, scale_max=0.7, learning_rate=0.5)

    rng = jax.random.key(1)
    images = jax.random.uniform(rng, (8, 32, 32, 3))
    labels = jnp.zeros((8,), jnp.int32)

    train = patch_mod.make_train_patch(entry.apply, cfg, pcfg, normalize=IDENT)
    patch, losses = train(params, images, labels, jax.random.fold_in(rng, 1))
    losses = np.asarray(losses)
    assert patch.shape == (8, 8, 3)
    assert float(np.asarray(patch).min()) >= 0.0
    assert float(np.asarray(patch).max()) <= 1.0
    # loss = -CE: Adam minimizes it, so late mean < early mean
    assert losses[-10:].mean() < losses[:10].mean()


def test_apply_patch_scale_is_runtime():
    cfg = small_cfg()
    apply_fn = patch_mod.make_apply_patch(cfg)
    images = jnp.zeros((2, 32, 32, 3))
    patch = jnp.ones((8, 8, 3))
    out1 = apply_fn(images, patch, jax.random.key(0), 0.2)
    out2 = apply_fn(images, patch, jax.random.key(0), 0.5)  # no recompile
    # bigger scale -> bigger footprint
    assert np.asarray(out2).sum() > np.asarray(out1).sum()


def test_rp2_sign_constraint():
    cfg = rp2.rp2_config(patch_size=8, image_size=32, iters=5)
    apply_fn = rp2.make_sign_constrained_apply(cfg, radius_frac=0.3)
    images = jnp.full((2, 32, 32, 3), 0.25)
    patch = jnp.ones((8, 8, 3))
    out = np.asarray(apply_fn(images, patch, jax.random.key(0), cfg.scale_max))
    m = np.asarray(rp2.sign_mask(32, radius_frac=0.3))[..., 0]
    # outside the sign mask nothing changes
    np.testing.assert_allclose(out[0][m < 0.5], 0.25, atol=1e-6)
    # inside, the centered patch shows up
    assert out[0][m > 0.5].max() > 0.5


def test_rp2_per_class_training():
    entry = registry.get_model("vit_test")
    cfg = entry.config(5)
    params = entry.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    images = rng.random((12, 32, 32, 3)).astype(np.float32)
    labels = np.array([0] * 5 + [1] * 5 + [2] * 2, np.int32)

    pcfg = rp2.rp2_config(patch_size=8, image_size=32, iters=10, batch_size=4)
    patches = rp2.train_rp2_patches(
        entry.apply, cfg, params, images, labels, cfg=pcfg,
        min_samples=3, normalize=IDENT, log=lambda s: None)
    assert set(patches) == {0, 1}  # class 2 below min_samples
    for p in patches.values():
        assert p.shape == (8, 8, 3)
        assert p.min() >= 0.0 and p.max() <= 1.0


def test_rp2_patch_png_dump(tmp_path):
    cfg = rp2.rp2_config(patch_size=8, image_size=32)
    patches = {0: np.full((8, 8, 3), 0.7, np.float32)}
    rp2.save_class_patches(patches, str(tmp_path), cfg=cfg,
                           class_names={0: "stop"})
    assert (tmp_path / "rp2_patch_stop.png").exists()


def test_patch_types_share_one_compiled_program():
    """Circle and square masks are runtime arguments: running both patch
    types must hit ONE jit cache entry for training and application (the
    reference's per-shape loop, patch_attack.py:148, would otherwise pay a
    full iteration-scan recompile per shape)."""
    entry = registry.get_model("vit_test")
    cfg = entry.config(5)
    params = entry.init(jax.random.key(0), cfg)
    pcfg_circle = small_cfg(iters=3, shape="circle")
    pcfg_square = small_cfg(iters=3, shape="square")

    images = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
    labels = jnp.zeros((4,), jnp.int32)

    train = patch_mod.make_train_patch(entry.apply, cfg, pcfg_circle,
                                       normalize=IDENT)
    p_circle, _ = train(params, images, labels, jax.random.key(2),
                        patch_mod.patch_mask(pcfg_circle))
    p_square, _ = train(params, images, labels, jax.random.key(2),
                        patch_mod.patch_mask(pcfg_square))
    assert train.jitted._cache_size() == 1
    # different masks genuinely flowed through the shared program
    assert not np.allclose(np.asarray(p_circle), np.asarray(p_square))

    apply_fn = patch_mod.make_apply_patch(pcfg_circle)
    apply_fn(images, p_circle, jax.random.key(3), 0.4,
             patch_mod.patch_mask(pcfg_circle))
    apply_fn(images, p_square, jax.random.key(3), 0.4,
             patch_mod.patch_mask(pcfg_square))
    assert apply_fn.jitted._cache_size() == 1
