"""On-device augmentation tests: geometry invariants of the fused affine,
color-jitter ranges, determinism per key, and train-step integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import augment


def _imgs(n=4, size=32):
    return jax.random.uniform(jax.random.key(0), (n, size, size, 3))


def test_warp_matches_map_coordinates_reference():
    """The gather-free separable warp must match a straight
    map_coordinates(order=1, constant, cval=0) warp to float tolerance for
    random affines (including out-of-bounds coordinates)."""
    rng = jax.random.key(3)
    n, size = 3, 32
    images = jax.random.uniform(rng, (n, size, size, 3))
    affine = augment._sample_affine(jax.random.fold_in(rng, 1), n, size,
                                    augment.DEFAULT)

    def reference_one(image, aff):
        a00, a01, a10, a11, t_x, t_y = aff
        s = image.shape[0]
        oy, ox = jnp.mgrid[0:s, 0:s].astype(jnp.float32)
        coords = jnp.stack([a10 * ox + a11 * oy + t_y,
                            a00 * ox + a01 * oy + t_x])
        return jnp.stack([
            jax.scipy.ndimage.map_coordinates(image[..., ch], coords, order=1,
                                              mode="constant", cval=0.0)
            for ch in range(3)], axis=-1)

    got = jax.vmap(augment._warp_one)(images, affine)
    want = jax.vmap(reference_one)(images, affine)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_banded_warp_matches_full_contraction():
    """The band-limited row contraction (static window sized from the
    rotation bound) must be exactly equivalent to contracting over every
    source row: all weights outside the window are exact zeros, so the
    outputs are bit-identical — including affines that push the sample
    window against (and past) the image boundary, where the window start
    clamps."""
    size = 112  # 28 | 112, so the banded path engages (w=40 < s)
    n = 6
    images = jax.random.uniform(jax.random.key(5), (n, size, size, 3))
    affine = list(augment._sample_affine(jax.random.key(6), n, size,
                                         augment.DEFAULT))
    # Push two images' sample windows off the image: one far above, one
    # straddling the bottom edge (translation beyond the source extent).
    t_y = np.array(affine[5])
    t_y[0] = -1.5 * size
    t_y[1] = size - 3.0
    affine[5] = jnp.asarray(t_y)
    affine = tuple(affine)

    banded = jax.vmap(lambda im, af: augment._warp_one(im, af, 15.0))(
        images, affine)
    full = jax.vmap(lambda im, af: augment._warp_one(im, af, 90.0))(
        images, affine)
    np.testing.assert_array_equal(np.asarray(banded), np.asarray(full))
    # sanity: the boundary-straddling image really does fill with zeros
    assert float(jnp.abs(banded[0]).sum()) == 0.0


def test_augment_shapes_and_range():
    x = _imgs()
    out = augment.train_augment(x, jax.random.key(1))
    assert out.shape == x.shape
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0


def test_augment_deterministic_per_key():
    x = _imgs()
    a = augment.train_augment(x, jax.random.key(1))
    b = augment.train_augment(x, jax.random.key(1))
    c = augment.train_augment(x, jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_identity_config_is_near_identity():
    """No rotation, full crop, no flip, no jitter -> the affine resample is
    the identity mapping."""
    cfg = augment.AugmentConfig(rotation_deg=0.0, crop_scale=(1.0, 1.0),
                                crop_ratio=(1.0, 1.0), hflip_p=0.0,
                                brightness=0.0, contrast=0.0, saturation=0.0)
    x = _imgs()
    out = augment.train_augment(x, jax.random.key(3), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_hflip_only():
    cfg = augment.AugmentConfig(rotation_deg=0.0, crop_scale=(1.0, 1.0),
                                crop_ratio=(1.0, 1.0), hflip_p=1.0,
                                brightness=0.0, contrast=0.0, saturation=0.0)
    x = _imgs()
    out = augment.train_augment(x, jax.random.key(4), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[:, :, ::-1],
                               atol=1e-4)


def test_crop_zooms_in():
    """A tight crop (small area) must magnify content: the output equals some
    sub-window of the input resampled, so its per-image std stays comparable
    and corners differ from the original."""
    cfg = augment.AugmentConfig(rotation_deg=0.0, crop_scale=(0.25, 0.25),
                                crop_ratio=(1.0, 1.0), hflip_p=0.0,
                                brightness=0.0, contrast=0.0, saturation=0.0)
    x = _imgs(size=64)
    out = augment.train_augment(x, jax.random.key(5), cfg)
    assert out.shape == x.shape
    assert np.abs(np.asarray(out) - np.asarray(x)).mean() > 0.05


def test_rotation_fills_corners_with_zero():
    cfg = augment.AugmentConfig(rotation_deg=45.0, crop_scale=(1.0, 1.0),
                                crop_ratio=(1.0, 1.0), hflip_p=0.0,
                                brightness=0.0, contrast=0.0, saturation=0.0)
    x = jnp.ones((1, 64, 64, 3))
    # force near-max rotation by trying keys until rotation is large
    for k in range(20):
        out = np.asarray(augment.train_augment(x, jax.random.key(k), cfg))
        if out[0, 0, 0].sum() < 0.1:  # corner fell outside the source
            break
    else:
        pytest.fail("no key produced a corner fill (rotation too small?)")
    assert out[0, 32, 32].sum() > 2.9  # center still inside


def test_train_step_with_augmentation():
    import optax

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import steps

    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    tx = optax.adam(1e-3)
    train = steps.make_train_step(
        lambda p, x, rng=None: vit.apply(cfg, p, x), tx, normalize=None,
        step_rng=jax.random.key(7), augment=augment.train_augment)
    state = steps.TrainState.create(params, tx)
    imgs = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
    labels = jnp.zeros((4,), jnp.int32)
    valid = jnp.ones((4,))
    state, m = train(state, imgs, labels, valid)
    assert np.isfinite(float(m["loss_sum"]))

    with pytest.raises(ValueError, match="augment requires step_rng"):
        steps.make_train_step(lambda p, x: vit.apply(cfg, p, x), tx,
                              augment=augment.train_augment)
