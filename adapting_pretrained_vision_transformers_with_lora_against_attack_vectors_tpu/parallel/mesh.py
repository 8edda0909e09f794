"""Device mesh + sharding layer.

The reference is single-device throughout (SURVEY.md §2.2: no
``torch.distributed``, no NCCL/Gloo). Here every stage — train step, PGD
inner loop, patch EOT loop, eval sweep — is an SPMD program over a
``jax.sharding.Mesh`` with axes ``('data', 'model')``:

* ``data``: batch sharding; gradient/metric reductions become XLA ``psum``
  over ICI inserted automatically under jit.
* ``model``: tensor parallelism. ViT-B fits comfortably on one chip, so the
  default mesh is ``(n_devices, 1)``, but the param-sharding rules below make
  TP a config change, not a rewrite: attention QKV kernels split on the
  output (head) dim, the attention output projection and MLP down-projection
  split on the input dim, so each block needs a single all-reduce pair.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import trees

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data if self.data != -1 else n_devices // model
        if data * model != n_devices:
            raise ValueError(f"mesh {data}x{model} != {n_devices} devices")
        return data, model


def make_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Leading axis over 'data', rest replicated (NHWC images, labels, ...)."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put each array with its leading axis split over the data axis;
    rank-0 arrays (scalars riding along with a batch) are replicated — a
    rank-1 spec on a 0-d array would make device_put raise."""
    out = tuple(jax.device_put(
        a, batch_sharding(mesh, a.ndim) if a.ndim else replicated(mesh))
        for a in arrays)
    return out if len(out) > 1 else out[0]


# --- tensor-parallel parameter layout rules ---------------------------------

# (path regex, PartitionSpec builder given leaf ndim). Stacked ViT blocks give
# kernels shape (L, in, out) and biases (L, dim); unstacked leaves have no L.
def vit_param_rules() -> list[tuple[str, dict[int, P]]]:
    col = {3: P(None, None, MODEL_AXIS), 2: P(None, MODEL_AXIS)}      # split out dim
    row = {3: P(None, MODEL_AXIS, None), 2: P(MODEL_AXIS, None)}      # split in dim
    col_bias = {2: P(None, MODEL_AXIS), 1: P(MODEL_AXIS)}
    return [
        (r".*attn/(q|k|v)/w$", col),
        (r".*attn/(q|k|v)/b$", col_bias),
        (r".*attn/(q|k|v)/lora_b$", col),
        (r".*attn/o/w$", row),
        (r".*attn/o/lora_a$", row),
        (r".*mlp/fc1/w$", col),
        (r".*mlp/fc1/b$", col_bias),
        (r".*mlp/fc1/lora_b$", col),
        (r".*mlp/fc2/w$", row),
        (r".*mlp/fc2/lora_a$", row),
    ]


def tree_shardings(mesh: Mesh, tree, rules: Optional[list] = None):
    """NamedSharding pytree for ``tree``: rule match or fully replicated.

    When the mesh's model axis is 1 every spec degenerates to replication, so
    the same code path serves pure-DP and DP×TP without branching.
    """
    rules = vit_param_rules() if rules is None else rules
    compiled = [(re.compile(pat), specs) for pat, specs in rules]
    flat = trees.flatten_with_paths(tree)
    shardings = {}
    for path, leaf in flat.items():
        spec = P()
        if mesh.shape[MODEL_AXIS] > 1:
            for pat, specs in compiled:
                if pat.match(path) and leaf.ndim in specs:
                    spec = specs[leaf.ndim]
                    break
        shardings[path] = NamedSharding(mesh, spec)
    return trees.unflatten_from_paths(shardings)
