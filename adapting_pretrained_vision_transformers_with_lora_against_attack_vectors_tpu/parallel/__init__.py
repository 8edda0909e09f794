from .mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    vit_param_rules,
    tree_shardings,
)
