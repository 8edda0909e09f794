import jax
import jax.numpy as jnp
import numpy as np

from apvt_lora.models import vit
from apvt_lora.ops import lora
from apvt_lora.parallel import mesh as pmesh
from apvt_lora.utils import trees


def test_data_mesh_shards_batch(eight_devices):
    m = pmesh.make_mesh(pmesh.MeshSpec(data=-1, model=1))
    assert m.shape == {"data": 8, "model": 1}
    x = jnp.zeros((16, 8, 8, 3))
    xs = pmesh.shard_batch(m, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data", None, None, None)


def test_tp_rules_cover_vit(eight_devices):
    m = pmesh.make_mesh(pmesh.MeshSpec(data=4, model=2))
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    lcfg = lora.LoRAConfig(rank=4, targets=vit.LORA_TARGETS_DEFAULT)
    params = lora.attach(params, lora.init(jax.random.key(1), params, lcfg), lcfg)
    shardings = pmesh.tree_shardings(m, params)

    qw = trees.get_path(shardings, "blocks/attn/q/w")
    assert qw.spec == jax.sharding.PartitionSpec(None, None, "model")
    ow = trees.get_path(shardings, "blocks/attn/o/w")
    assert ow.spec == jax.sharding.PartitionSpec(None, "model", None)
    # embeddings stay replicated
    assert trees.get_path(shardings, "embed/pos").spec == jax.sharding.PartitionSpec()


def test_sharded_forward_matches_single_device(eight_devices):
    """DPxTP sharded forward must be numerically the single-device forward."""
    m = pmesh.make_mesh(pmesh.MeshSpec(data=4, model=2))
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(2), (8, cfg.image_size, cfg.image_size, 3))

    ref = vit.apply(cfg, params, x)

    shardings = pmesh.tree_shardings(m, params)
    params_sh = jax.device_put(params, shardings)
    x_sh = pmesh.shard_batch(m, x)
    out = jax.jit(vit.apply, static_argnums=0)(cfg, params_sh, x_sh)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-3)


def test_sharded_pgd_matches_single_device(eight_devices):
    """The jitted PGD program under a DP mesh produces the same adversarial
    batch as single-device execution (same rng, same projections)."""
    from apvt_lora.attacks import whitebox
    from apvt_lora.attacks.common import Normalizer

    m = pmesh.make_mesh(pmesh.MeshSpec(data=8, model=1))
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (16, 32, 32, 3))
    y = jax.random.randint(jax.random.key(2), (16,), 0, cfg.num_classes)
    run = whitebox.make_pgd(vit.apply, cfg, eps=8 / 255, alpha=3 / 255,
                            steps=3, normalize=Normalizer((0,) * 3, (1,) * 3))

    ref = run(params, x, y, jax.random.key(9))
    x_sh, y_sh = pmesh.shard_batch(m, np.asarray(x), np.asarray(y))
    params_sh = jax.device_put(params, pmesh.replicated(m))
    adv = run(params_sh, x_sh, y_sh, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(adv), atol=2e-5)
    # result stays sharded over the data axis (no implicit gather)
    assert adv.sharding.spec[0] == "data"


def test_sharded_train_step_matches_single_device(eight_devices):
    """One full train step (fwd+bwd+adamw) under DPxTP == single device."""
    import optax

    from apvt_lora.train import steps

    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    tx = optax.adam(1e-3)
    train = steps.make_train_step(lambda p, x: vit.apply(cfg, p, x), tx,
                                  normalize=None)
    images = np.random.default_rng(0).random((16, 32, 32, 3)).astype(np.float32)
    labels = (np.arange(16) % cfg.num_classes).astype(np.int32)
    valid = np.ones((16,), np.float32)

    # build the sharded copy BEFORE the first (buffer-donating) step runs
    m = pmesh.make_mesh(pmesh.MeshSpec(data=4, model=2))
    params_sh = jax.device_put(params, pmesh.tree_shardings(m, params))
    s2 = steps.TrainState.create(params_sh, tx)

    # fresh copies for the reference run: device_put above may alias the
    # original buffers as local shards, and the train step donates its state
    params_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
    s_ref = steps.TrainState.create(params_copy, tx)
    s_ref, m_ref = train(s_ref, jnp.asarray(images), jnp.asarray(labels),
                         jnp.asarray(valid))
    im_sh, lb_sh, va_sh = pmesh.shard_batch(m, images, labels, valid)
    s2, m2 = train(s2, im_sh, lb_sh, va_sh)

    np.testing.assert_allclose(float(m_ref["loss_sum"]), float(m2["loss_sum"]),
                               rtol=1e-5)
    # adam's first step divides by sqrt(nu)+eps, so near-zero grads amplify
    # reduction-order noise up to ~lr; bound by 2*lr
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2.5e-3), s_ref.params, s2.params)


def test_sharded_apgd_matches_single_device(eight_devices):
    """APGD-CE (the AutoAttack workhorse) under a DP mesh reproduces the
    single-device adversarial batch — step-size halving checkpoints, EMA
    trackers and all (SURVEY §2.2: every stage is SPMD)."""
    from apvt_lora.attacks.autoattack import apgd
    from apvt_lora.attacks.common import Normalizer

    m = pmesh.make_mesh(pmesh.MeshSpec(data=8, model=1))
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (16, 32, 32, 3))
    y = jax.random.randint(jax.random.key(2), (16,), 0, cfg.num_classes)
    run = apgd.make_apgd(vit.apply, cfg,
                         apgd.APGDConfig(eps=8 / 255, n_iter=6, loss="ce"),
                         normalize=Normalizer((0,) * 3, (1,) * 3))

    ref_adv, ref_f = run(params, x, y, jax.random.key(9))
    x_sh, y_sh = pmesh.shard_batch(m, np.asarray(x), np.asarray(y))
    params_sh = jax.device_put(params, pmesh.replicated(m))
    adv, f = run(params_sh, x_sh, y_sh, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(ref_adv), np.asarray(adv), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref_f), np.asarray(f), atol=1e-4)
    assert adv.sharding.spec[0] == "data"


def test_sharded_square_matches_single_device(eight_devices):
    """Square (black-box, per-example random queries + the chunked
    early-exit while_loop) under a DP mesh == single device."""
    from apvt_lora.attacks.autoattack import square
    from apvt_lora.attacks.common import Normalizer

    m = pmesh.make_mesh(pmesh.MeshSpec(data=8, model=1))
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (16, 32, 32, 3))
    y = jax.random.randint(jax.random.key(2), (16,), 0, cfg.num_classes)
    run = square.make_square(
        vit.apply, cfg,
        square.SquareConfig(eps=8 / 255, n_queries=24, exit_check_every=8),
        normalize=Normalizer((0,) * 3, (1,) * 3))

    ref = run(params, x, y, jax.random.key(9))
    x_sh, y_sh = pmesh.shard_batch(m, np.asarray(x), np.asarray(y))
    params_sh = jax.device_put(params, pmesh.replicated(m))
    adv = run(params_sh, x_sh, y_sh, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(adv), atol=2e-5)


def test_sharded_patch_train_matches_single_device(eight_devices):
    """EOT patch training under a DP mesh: the shared patch (optimized with
    batch-mean gradients -> psum across shards, minibatch gathers across the
    sharded sample pool) matches single-device training."""
    from apvt_lora.attacks import patch as patch_mod
    from apvt_lora.attacks.common import Normalizer

    m = pmesh.make_mesh(pmesh.MeshSpec(data=8, model=1))
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    images = jax.random.uniform(jax.random.key(1), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.key(2), (16,), 0, cfg.num_classes)
    pcfg = patch_mod.PatchConfig(patch_size=8, iters=5, batch_size=4,
                                 learning_rate=0.1, scale_min=0.4,
                                 scale_max=0.7)
    train = patch_mod.make_train_patch(vit.apply, cfg, pcfg,
                                       normalize=Normalizer((0,) * 3, (1,) * 3))

    ref_patch, ref_losses = train(params, images, labels, jax.random.key(9))
    im_sh, lb_sh = pmesh.shard_batch(m, np.asarray(images), np.asarray(labels))
    params_sh = jax.device_put(params, pmesh.replicated(m))
    patch, losses = train(params_sh, im_sh, lb_sh, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(ref_losses), np.asarray(losses),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref_patch), np.asarray(patch),
                               atol=5e-3)
