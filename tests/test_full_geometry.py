"""Full-production-geometry parity tests (VERDICT r2 item 2).

The round-1/2 parity fixtures are tiny (32px, 2-layer) — they pin the math
but not the production geometry, where the 197-token sequence, pos-embed
layout, 7x7-window shift masks at 224px, and preprocessing resampling
actually engage. These tests build the REAL 224px/12-layer ViT-B/16 and
224px Swin-B torch fixtures (random weights — no downloads in this image)
and assert forward parity, plus pin the eval preprocessing chain against a
hand-rolled fixture implementing torchvision's documented semantics
(torchvision itself is not installed here; the fixture cites the exact
source lines it mirrors).

Reference: Utils.py:84-90 (create_vit_model = ViT-B/16 @224),
train.py:137-142 / train_loras.py:187-191 (Resize(256)+CenterCrop(224) eval
chain), README.md:49-57 (Swin-B row). PARITY.md documents the protocol.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import transforms
from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import (
    hf_import, swin, vit)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _photo_like(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Structured scene: gradients + blocks + mild noise (decodes/resamples
    like a photo, not like incompressible noise)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack([(yy * 255 // max(h, 1)) % 256, (xx * 2) % 256,
                    ((yy + xx) // 2) % 256], -1).astype(np.uint8)
    arr[h // 4: h // 2, w // 4: 3 * w // 4] = rng.integers(
        0, 255, 3, dtype=np.uint8)
    return np.clip(arr + rng.integers(0, 8, arr.shape, dtype=np.uint8),
                   0, 255).astype(np.uint8)


# --- preprocessing chain ----------------------------------------------------

def _torchvision_eval_golden(img: Image.Image, resize: int, crop: int) -> np.ndarray:
    """Independent reimplementation of torchvision's eval chain semantics:

    * Resize(short=resize): ``new_long = int(resize * long / short)`` —
      TRUNCATION, torchvision/transforms/functional.py
      ``_compute_resized_output_size``; PIL bilinear resample on the PIL
      path (InterpolationMode.BILINEAR is the Resize default).
    * CenterCrop(crop): ``top = int(round((H - crop) / 2.0))``,
      ``left = int(round((W - crop) / 2.0))`` —
      torchvision/transforms/functional.py ``center_crop``.
    """
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    new_short, new_long = resize, int(resize * long / short)
    new_w, new_h = (new_short, new_long) if w <= h else (new_long, new_short)
    resized = img.resize((new_w, new_h), Image.BILINEAR)
    top = int(round((new_h - crop) / 2.0))
    left = int(round((new_w - crop) / 2.0))
    return np.asarray(resized.crop((left, top, left + crop, top + crop)),
                      np.uint8)


# includes shapes where long-side truncation != rounding (100x101: tv 258
# vs rounded 259) and odd aspect ratios in both orientations
PREPROC_SHAPES = [(101, 100), (100, 101), (500, 375), (456, 123), (97, 301),
                  (224, 224), (256, 341)]


@pytest.mark.parametrize("h,w", PREPROC_SHAPES)
def test_eval_preprocess_matches_torchvision_semantics(h, w):
    """Loader PIL path must be BIT-EXACT against the torchvision-semantics
    golden — same resample filter, same size arithmetic, same crop offsets."""
    img = Image.fromarray(_photo_like(h, w))
    golden = _torchvision_eval_golden(img, 256, 224)
    ours = transforms.eval_transform_pil(img)
    np.testing.assert_array_equal(ours, golden)


@pytest.mark.parametrize("h,w", PREPROC_SHAPES)
def test_native_eval_preprocess_matches_golden(h, w):
    """Native C++ resampler: same geometry decisions, <=2 uint8 LSB from the
    PIL filter (separable bilinear-AA differs only in accumulation order)."""
    from apvt_lora.utils import native

    if not native.available():
        pytest.skip("native library unavailable")
    arr = _photo_like(h, w)
    golden = _torchvision_eval_golden(Image.fromarray(arr), 256, 224)
    ours = native.resize_center_crop(arr, 256, 224)
    assert ours.shape == golden.shape
    diff = np.abs(ours.astype(int) - golden.astype(int))
    assert diff.max() <= 2, f"native resampler off by {diff.max()} LSB"


# --- full-geometry model parity ---------------------------------------------

def test_vitb_224_full_geometry_forward_parity():
    """Production ViT-B/16 @224 (12 layers, 197 tokens): converted weights
    must reproduce the torch forward. This is where pos-embed layout and the
    full-depth error accumulation engage — the 32px/2-layer fixture cannot
    catch a transposed pos-embed or a wrong CLS-token concat order."""
    jax.config.update("jax_default_matmul_precision", "highest")
    torch.manual_seed(0)
    hf = transformers.ViTForImageClassification(
        transformers.ViTConfig(num_labels=21)).eval()  # defaults = ViT-B/16 @224
    cfg = vit.VIT_B16.with_classes(21)
    cfg = type(cfg)(**{**cfg.__dict__, "compute_dtype": "float32"})
    params = hf_import.vit_params_from_hf(hf.state_dict(), cfg)

    x = np.stack([_photo_like(224, 224, s) for s in range(2)]) / 255.0
    x = x.astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(vit.apply(cfg, params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)
    # random-init logits are O(1); require meaningful agreement, not 0~=0
    assert np.abs(ref).max() > 1e-3


def test_convnextb_224_full_geometry_forward_parity():
    """Production ConvNeXt-B @224 (depths 3/3/27/3, dims 128..1024): the
    full 27-block stage-3 accumulates depthwise-conv + layer-scale error the
    2-stage/32px fixture (test_backbones.py) cannot; 224px engages the real
    4x downsample chain 56->28->14->7."""
    jax.config.update("jax_default_matmul_precision", "highest")
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import convnext

    torch.manual_seed(0)
    hf = transformers.ConvNextForImageClassification(
        transformers.ConvNextConfig(depths=[3, 3, 27, 3],
                                    hidden_sizes=[128, 256, 512, 1024],
                                    num_labels=21)).eval()
    cfg = convnext.ConvNeXtConfig(num_classes=21, compute_dtype="float32")
    params = hf_import.convnext_params_from_hf(hf.state_dict(), cfg)

    x = (_photo_like(224, 224, 11)[None] / 255.0).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(convnext.apply(cfg, params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)
    assert np.abs(ref).max() > 1e-3


def test_swinb_224_full_geometry_forward_parity():
    """Production Swin-B @224 (depths 2/2/18/2, window 7): the 224px grid
    exercises every stage's shift mask and the relative-position-bias tables
    at real resolution."""
    jax.config.update("jax_default_matmul_precision", "highest")
    torch.manual_seed(0)
    hf = transformers.SwinForImageClassification(
        transformers.SwinConfig(embed_dim=128, depths=[2, 2, 18, 2],
                                num_heads=[4, 8, 16, 32], window_size=7,
                                num_labels=21)).eval()
    cfg = swin.SwinConfig(num_classes=21, compute_dtype="float32")
    params = hf_import.swin_params_from_hf(hf.state_dict(), cfg)

    x = (_photo_like(224, 224, 7)[None] / 255.0).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(swin.apply(cfg, params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)
    assert np.abs(ref).max() > 1e-3
