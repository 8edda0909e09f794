import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from apvt_lora.attacks import Normalizer, fgsm, make_fgsm, make_pgd, pgd
from apvt_lora.attacks.common import uint8_quantize, from_uint8
from apvt_lora.models import vit

EPS = 8 / 255
ALPHA = 3 / 255
NORM = Normalizer((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))


@pytest.fixture(scope="module")
def setup():
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (4, cfg.image_size, cfg.image_size, 3))
    y = jnp.array([0, 1, 2, 3])
    apply_fn = lambda p, imgs: vit.apply(cfg, p, imgs)
    return cfg, params, x, y, apply_fn


def _mean_ce(apply_fn, params, x, y):
    logits = apply_fn(params, NORM(x))
    return float(optax.softmax_cross_entropy_with_integer_labels(logits, y).mean())


def test_fgsm_invariants(setup):
    cfg, params, x, y, apply_fn = setup
    adv = fgsm(apply_fn, params, x, y, eps=EPS, normalize=NORM)
    adv, x_np = np.asarray(adv), np.asarray(x)
    assert adv.min() >= 0.0 and adv.max() <= 1.0
    assert np.abs(adv - x_np).max() <= EPS + 1e-6
    # gradient ascent: loss strictly increases for a generic model
    assert _mean_ce(apply_fn, params, jnp.asarray(adv), y) > _mean_ce(apply_fn, params, x, y)


def test_pgd_invariants(setup):
    cfg, params, x, y, apply_fn = setup
    adv = pgd(apply_fn, params, x, y, eps=EPS, alpha=ALPHA, steps=5,
              rng=jax.random.key(7), normalize=NORM)
    adv, x_np = np.asarray(adv), np.asarray(x)
    assert adv.min() >= 0.0 and adv.max() <= 1.0
    assert np.abs(adv - x_np).max() <= EPS + 1e-6


def test_pgd_beats_fgsm(setup):
    """More attack iterations must find at least as high a loss."""
    cfg, params, x, y, apply_fn = setup
    adv1 = fgsm(apply_fn, params, x, y, eps=EPS, normalize=NORM)
    adv10 = pgd(apply_fn, params, x, y, eps=EPS, alpha=ALPHA, steps=10,
                random_start=False, normalize=NORM)
    assert (_mean_ce(apply_fn, params, adv10, y)
            >= _mean_ce(apply_fn, params, adv1, y) - 1e-4)


def test_pgd_single_step_equals_fgsm(setup):
    """PGD(steps=1, alpha=eps, no random start) == FGSM: same signed step,
    same clipping region."""
    cfg, params, x, y, apply_fn = setup
    a = fgsm(apply_fn, params, x, y, eps=EPS, normalize=NORM)
    b = pgd(apply_fn, params, x, y, eps=EPS, alpha=EPS, steps=1,
            random_start=False, normalize=NORM)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_jitted_factories(setup):
    cfg, params, x, y, apply_fn = setup
    run_fgsm = make_fgsm(vit.apply, cfg, eps=EPS, normalize=NORM)
    run_pgd = make_pgd(vit.apply, cfg, eps=EPS, alpha=ALPHA, steps=3, normalize=NORM)
    a = run_fgsm(params, x, y)
    b = run_pgd(params, x, y, jax.random.key(0))
    assert a.shape == x.shape and b.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(fgsm(apply_fn, params, x, y, eps=EPS, normalize=NORM)),
        atol=1e-6)


def test_attack_on_lora_merged_params(setup):
    """Attacks compose with LoRA-adapted models with no wrapper classes."""
    from apvt_lora.ops import lora

    cfg, params, x, y, apply_fn = setup
    lcfg = lora.LoRAConfig(rank=2, targets=vit.LORA_TARGETS_DEFAULT)
    ad = jax.tree.map(lambda l: l + 0.01, lora.init(jax.random.key(3), params, lcfg))
    merged = lora.merge(params, ad, lcfg)
    adv = fgsm(apply_fn, merged, x, y, eps=EPS, normalize=NORM)
    assert np.abs(np.asarray(adv) - np.asarray(x)).max() <= EPS + 1e-6


def test_uint8_quantization_parity():
    """Truncation (not rounding), matching Utils.py:106-113 exactly."""
    x = np.array([[0.0, 1.0, 0.5, 0.999, 1.5, -0.2]], np.float32)
    q = uint8_quantize(x)
    np.testing.assert_array_equal(q, np.array([[0, 255, 127, 254, 255, 0]], np.uint8))
    r = from_uint8(q)
    assert np.abs(r - np.clip(x, 0, 1)).max() <= 1 / 255 + 1e-7
