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
