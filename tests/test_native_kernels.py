"""Native layer tests: the C++ image-ops library (ctypes) and the Pallas
fused-attention kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# --- C++ image ops -----------------------------------------------------------

native = pytest.importorskip(
    "adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.native")


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no g++/make?)")
    return native


def test_native_resize_center_crop_matches_pil(lib):
    from PIL import Image

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.transforms import eval_transform_pil

    rng = np.random.default_rng(0)
    for h, w in ((300, 400), (400, 300), (224, 224), (257, 123)):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ours = lib.resize_center_crop(img, 256, 224)
        ref = eval_transform_pil(Image.fromarray(img), resize=256, crop=224)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # antialiased separable resampling matches PIL to rounding noise
        assert diff.max() <= 2, (h, w, diff.max())
        assert diff.mean() < 0.5


def test_native_batch_resize(lib):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (6, 120, 160, 3), dtype=np.uint8)
    out = lib.batch_resize_center_crop(imgs, 64, 48)
    assert out.shape == (6, 48, 48, 3)
    single = lib.resize_center_crop(imgs[3], 64, 48)
    np.testing.assert_array_equal(out[3], single)


def test_native_resize_with_padding(lib):
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import process

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (50, 100, 3), dtype=np.uint8)
    out = lib.resize_with_padding(img, 224)
    assert out.shape == (224, 224, 3)
    # 2:1 aspect -> vertical padding, zero rows top and bottom
    assert out[0].sum() == 0 and out[-1].sum() == 0
    assert out[112].sum() > 0


def test_native_normalize(lib):
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = lib.batch_normalize(imgs, mean, std)
    exp = (imgs.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    np.testing.assert_allclose(out, exp, atol=1e-5)


# --- Pallas fused attention (interpret mode) ---------------------------------

def test_fused_attention_interpret_parity():
    from jax.experimental.pallas import tpu as pltpu

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.kernels import attention as ka
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops.nn import attention as ref_attn

    rng = jax.random.key(0)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (2, 3, 37, 16))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (2, 3, 37, 16))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (2, 3, 37, 16))

    with pltpu.force_tpu_interpret_mode():
        o = ka.fused_attention(q, k, v)
        ref = ref_attn(q, k, v)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

        def loss(f):
            return lambda q, k, v: jnp.sum(f(q, k, v) ** 2)

        g = jax.grad(loss(ka.fused_attention), argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss(ref_attn), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-3)


def test_fused_attention_vit_flag_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit
    import dataclasses

    cfg = dataclasses.replace(vit.VIT_TEST, use_fused_attention=True)
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    with pltpu.force_tpu_interpret_mode():
        out = vit.apply(cfg, params, x)
        ref = vit.apply(vit.VIT_TEST, params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-3)
