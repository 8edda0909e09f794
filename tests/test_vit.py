import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apvt_lora.models import vit
from apvt_lora.models.registry import available_models, create_model, get_model


@pytest.fixture(scope="module")
def setup():
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (4, cfg.image_size, cfg.image_size, 3))
    return cfg, params, x


def test_logits_shape_and_dtype(setup):
    cfg, params, x = setup
    logits = vit.apply(cfg, params, x)
    assert logits.shape == (4, cfg.num_classes)
    assert logits.dtype == jnp.float32


def test_jit_matches_eager(setup):
    cfg, params, x = setup
    eager = vit.apply(cfg, params, x)
    jitted = jax.jit(vit.apply, static_argnums=0)(cfg, params, x)
    np.testing.assert_allclose(eager, jitted, atol=1e-4)


def test_deterministic(setup):
    cfg, params, x = setup
    a = vit.apply(cfg, params, x)
    b = vit.apply(cfg, params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_flows_to_input(setup):
    """Input gradients exist and are finite — the primitive every white-box
    attack (FGSM/PGD, whitebox_attacks.py:22-38) relies on."""
    cfg, params, x = setup

    def loss(imgs):
        logits = vit.apply(cfg, params, imgs)
        return -jax.nn.log_softmax(logits)[:, 0].mean()

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_remat_matches(setup):
    cfg, params, x = setup
    import dataclasses

    cfg_r = dataclasses.replace(cfg, remat=True)
    np.testing.assert_allclose(
        np.asarray(vit.apply(cfg, params, x)),
        np.asarray(vit.apply(cfg_r, params, x)),
        atol=1e-4,
    )


def test_unrolled_matches_scan(setup):
    """unroll_layers (the flagship bench path — no scan residual DUS) must be
    numerically identical to the scan encoder, forward and input-gradient."""
    cfg, params, x = setup
    import dataclasses

    cfg_u = dataclasses.replace(cfg, unroll_layers=True)
    np.testing.assert_allclose(np.asarray(vit.apply(cfg, params, x)),
                               np.asarray(vit.apply(cfg_u, params, x)),
                               atol=1e-5)

    def loss(c, imgs):
        return -jax.nn.log_softmax(vit.apply(c, params, imgs))[:, 0].mean()

    g_s = jax.grad(loss, argnums=1)(cfg, x)
    g_u = jax.grad(loss, argnums=1)(cfg_u, x)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_u), atol=1e-5)

    cfg_ur = dataclasses.replace(cfg_u, remat=True)
    np.testing.assert_allclose(np.asarray(vit.apply(cfg, params, x)),
                               np.asarray(vit.apply(cfg_ur, params, x)),
                               atol=1e-5)


def test_patchify_layout():
    """Patch pixels must be row-major with channel last — the contract the
    pretrained-weight importer relies on."""
    cfg = vit.ViTConfig(image_size=4, patch_size=2, hidden_dim=8, depth=1,
                        num_heads=1, mlp_dim=8, num_classes=2)
    img = jnp.arange(4 * 4 * 3, dtype=jnp.float32).reshape(1, 4, 4, 3)
    patches = vit._patchify(cfg, img)
    assert patches.shape == (1, 4, 12)
    # first patch = top-left 2x2 block, rows then cols then channels
    expected = jnp.concatenate([img[0, 0, 0], img[0, 0, 1], img[0, 1, 0], img[0, 1, 1]])
    np.testing.assert_array_equal(np.asarray(patches[0, 0]), np.asarray(expected))


def test_registry():
    assert {"google_vit", "vit_tiny", "vit_test"} <= set(available_models())
    entry, cfg, params = create_model("vit_test", num_classes=5)
    assert cfg.num_classes == 5
    assert entry.apply(cfg, params, jnp.zeros((1, 32, 32, 3))).shape == (1, 5)

    b16 = get_model("google_vit").config(21)
    assert (b16.hidden_dim, b16.depth, b16.seq_len) == (768, 12, 197)
