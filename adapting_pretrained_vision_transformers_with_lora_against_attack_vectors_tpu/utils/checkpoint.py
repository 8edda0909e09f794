"""Atomic pytree checkpointing (safetensors + JSON sidecar).

The reference persists weights as pickle ``torch.save(state_dict)`` files
(train.py:249-261) and PEFT directories (train_loras.py:342-355), with no
resume support and non-atomic writes. Here:

* Param/adapter/optimizer pytrees serialize as **flat path->tensor
  safetensors** files — zero-copy mmap reads, no pickle execution risk,
  language-neutral.
* Writes are **atomic** (write to a temp file in the same directory, then
  ``os.replace``) so a killed sweep never leaves a half-written checkpoint
  (SURVEY.md §5 checkpoint/resume row). Non-array metadata (step, config,
  vocabulary, the bf16 tag list) is JSON-encoded INTO the safetensors
  header (``metadata=``), so tensors + metadata are one file and one
  ``os.replace`` — no sidecar to go stale or tear (round-3 review: a
  leftover ``__bf16__`` sidecar from a previous save silently corrupted a
  later f32 load). Legacy ``<path>.json`` sidecars are still read.
* :func:`save_train_state` / :func:`load_train_state` round-trip the full
  :class:`train.steps.TrainState` including optimizer state in ONE atomic
  file (``{prefix}.state.safetensors``) — params and optimizer moments can
  never be torn across a kill. Optimizer leaves are keyed by their
  POSITION in the template flattening (``opt/00000``...), so the rebuild
  is exact for any optax chain (string-sorted path order would permute
  10+-leaf states). Legacy two-file ``.params``/``.opt`` checkpoints are
  still loadable.

bfloat16 note: safetensors-numpy cannot represent bf16, so bf16 leaves are
bit-cast to uint16 and tagged in the metadata for exact round-tripping.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional

import jax
import numpy as np
from safetensors.numpy import load_file, save_file

from . import trees

_SIDECAR = "meta.json"
_BF16_TAG = "__bf16__"
_META_KEY = "apvt_meta"  # JSON blob inside the safetensors header


def _to_numpy_flat(tree) -> tuple[dict[str, np.ndarray], list[str]]:
    from .transfer import verified_get

    # checksum-verified fetch: the remote-TPU backend intermittently returns
    # wrong bytes for a leaf (see utils/transfer.py) — a checkpoint must
    # never trust an unverified device_get.
    tree = verified_get(tree)
    flat = trees.flatten_with_paths(tree)
    out, bf16_paths = {}, []
    for path, leaf in flat.items():
        arr = np.asarray(leaf)
        if arr.dtype == jax.numpy.bfloat16:
            bf16_paths.append(path)
            arr = arr.view(np.uint16)
        out[path] = arr
    return out, bf16_paths


def _atomic_save_file(tensors: dict[str, np.ndarray], path: str,
                      *, meta: Optional[dict] = None) -> None:
    # CRITICAL: force C-contiguity. jax.device_get can return an ndarray
    # whose device layout surfaces as transposed strides (F-contiguous view,
    # e.g. a (768, 5) classifier head from a jitted program on TPU). Every
    # numpy consumer honors strides — but safetensors serializes the raw
    # buffer assuming C order, silently writing the TRANSPOSE. This
    # corrupted saved classifier heads (clean acc 1.0 -> 0.17 after reload)
    # until root-caused in round 2; tests/test_train.py pins it.
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        save_file(tensors, tmp,
                  metadata={_META_KEY: json.dumps(meta or {}, default=str)})
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_pytree(tree, path: str, *, meta: Optional[dict] = None) -> None:
    """Save a pytree of arrays to ``path`` (.safetensors) atomically.

    ``meta`` (JSON-serializable) is embedded in the safetensors header —
    tensors and metadata land in one ``os.replace``.
    """
    tensors, bf16_paths = _to_numpy_flat(tree)
    sidecar = dict(meta or {})
    if bf16_paths:
        sidecar[_BF16_TAG] = bf16_paths
    _atomic_save_file(tensors, path, meta=sidecar)
    legacy = path + ".json"
    if os.path.exists(legacy):
        # remove any pre-embedded-metadata sidecar: a stale __bf16__ tag
        # from an earlier save would otherwise corrupt a later load
        os.unlink(legacy)


def _atomic_write_json(obj: dict, path: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=2, default=str)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_pytree(path: str) -> tuple[Any, dict]:
    """Load ``(tree, meta)`` saved by :func:`save_pytree`.

    Metadata comes from the safetensors header; files written before the
    header-embedding change fall back to the legacy ``<path>.json`` sidecar.
    """
    from safetensors import safe_open

    meta: dict = {}
    embedded = False
    with safe_open(path, framework="numpy") as f:
        header_meta = f.metadata()
        if header_meta and _META_KEY in header_meta:
            meta = json.loads(header_meta[_META_KEY])
            embedded = True
    tensors = load_file(path)
    if not embedded and os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    for p in meta.pop(_BF16_TAG, []):
        tensors[p] = tensors[p].view(jax.numpy.bfloat16)
    return trees.unflatten_from_paths(tensors), meta


def save_train_state(state, path_prefix: str, *, meta: Optional[dict] = None) -> None:
    """Persist a ``TrainState`` as ONE atomic ``{prefix}.state.safetensors``.

    Params keep their tree paths under ``params/``; optimizer leaves are
    keyed by template-flattening POSITION (``opt/00000``...) so the rebuild
    in :func:`load_train_state` is exact for any optax state structure."""
    m = dict(meta or {})
    m["step"] = int(jax.device_get(state.step))
    opt_leaves = jax.tree.leaves(state.opt_state)
    tree = {"params": state.params,
            "opt": {f"{i:05d}": leaf for i, leaf in enumerate(opt_leaves)}}
    save_pytree(tree, path_prefix + ".state.safetensors", meta=m)


def train_state_exists(path_prefix: str) -> bool:
    """Is a resumable checkpoint (either format) present at ``prefix``?"""
    return (os.path.exists(path_prefix + ".state.safetensors")
            or os.path.exists(path_prefix + ".params.safetensors"))


def load_train_state(path_prefix: str, tx, *, state_cls) -> tuple[Any, dict]:
    """Rebuild a ``TrainState`` (params + optimizer state + step).

    Reads the single-file format; falls back to the legacy two-file
    ``.params``/``.opt`` pair for pre-existing checkpoints."""
    import jax.numpy as jnp

    state_path = path_prefix + ".state.safetensors"
    if os.path.exists(state_path):
        tree, meta = load_pytree(state_path)
        params = tree["params"]
        template = tx.init(params)
        n = len(jax.tree.leaves(template))
        leaves = [tree["opt"][f"{i:05d}"] for i in range(n)]
        opt_state = jax.tree.unflatten(jax.tree.structure(template), leaves)
    else:  # legacy split checkpoint
        params, meta = load_pytree(path_prefix + ".params.safetensors")
        opt_path = path_prefix + ".opt.safetensors"
        if os.path.exists(opt_path):
            raw, _ = load_pytree(opt_path)
            template = tx.init(params)
            leaves = jax.tree.leaves(raw["opt"])
            opt_state = jax.tree.unflatten(jax.tree.structure(template), leaves)
        else:
            opt_state = tx.init(params)
    step = jnp.asarray(meta.get("step", 0), jnp.int32)
    return state_cls(params=params, opt_state=opt_state, step=step), meta
