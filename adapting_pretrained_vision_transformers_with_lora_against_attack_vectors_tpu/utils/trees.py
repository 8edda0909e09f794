"""Path-addressed pytree utilities.

Model parameters in this framework are plain nested dicts of ``jnp`` arrays.
LoRA adapters, sharding rules, weight importers, and the eval harness all
address leaves (or subtrees) by '/'-joined string paths such as
``"blocks/attn/q"``. These helpers implement that addressing functionally —
every mutation returns a new tree, inputs are never modified.

FRAMEWORK CONVENTION: param trees are **dict-only** — repeated submodules use
string-integer keys (``{"0": ..., "1": ...}``), never Python lists. Lists
flatten fine but :func:`unflatten_from_paths` (used by checkpoint loading,
sharding-tree construction, and ``lora.detach``) rebuilds dict nodes only, so
a list-bearing tree would come back structurally different.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Mapping

import jax
import numpy as np

Tree = Any  # nested dict / list / tuple of array leaves


def flatten_with_paths(tree: Tree, *, sep: str = "/") -> dict[str, Any]:
    """Flatten ``tree`` into ``{path: leaf}`` with '/'-joined string keys."""
    flat = {}

    def visit(prefix: str, node: Any) -> None:
        if isinstance(node, Mapping):
            for k in node:
                visit(f"{prefix}{sep}{k}" if prefix else str(k), node[k])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(f"{prefix}{sep}{i}" if prefix else str(i), v)
        else:
            flat[prefix] = node

    visit("", tree)
    return flat


def unflatten_from_paths(flat: Mapping[str, Any], *, sep: str = "/") -> Tree:
    """Inverse of :func:`flatten_with_paths` (dict nodes only)."""
    root: dict[str, Any] = {}
    for path, leaf in flat.items():
        parts = path.split(sep)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return root


def get_path(tree: Tree, path: str, *, sep: str = "/") -> Any:
    """Return the leaf/subtree at ``path``; raises ``KeyError`` when absent."""
    node = tree
    for p in path.split(sep):
        if isinstance(node, Mapping):
            node = node[p]
        elif isinstance(node, (list, tuple)):
            node = node[int(p)]
        else:
            raise KeyError(f"cannot descend into leaf at {p!r} of {path!r}")
    return node


def set_path(tree: Tree, path: str, value: Any, *, sep: str = "/") -> Tree:
    """Return a copy of ``tree`` with the node at ``path`` replaced."""
    parts = path.split(sep)

    def rebuild(node: Any, depth: int) -> Any:
        if depth == len(parts):
            return value
        key = parts[depth]
        if isinstance(node, Mapping):
            new = dict(node)
            new[key] = rebuild(node[key], depth + 1)
            return new
        if isinstance(node, (list, tuple)):
            idx = int(key)
            new_list = list(node)
            new_list[idx] = rebuild(node[idx], depth + 1)
            return type(node)(new_list)
        raise KeyError(f"cannot descend into leaf at {key!r} of {path!r}")

    return rebuild(tree, 0)


def update_path(tree: Tree, path: str, fn: Callable[[Any], Any], *, sep: str = "/") -> Tree:
    """Return a copy of ``tree`` with ``fn`` applied to the node at ``path``."""
    return set_path(tree, path, fn(get_path(tree, path, sep=sep)), sep=sep)


def iter_paths(tree: Tree, *, sep: str = "/") -> Iterator[str]:
    yield from flatten_with_paths(tree, sep=sep)


def match_paths(tree: Tree, suffixes: tuple[str, ...], *, sep: str = "/") -> list[str]:
    """Paths of dict *subtrees* whose final component matches one of ``suffixes``.

    Used to locate LoRA target modules: e.g. suffix ``"q"`` matches the subtree
    path ``"blocks/attn/q"`` (whose leaves are ``.../q/w`` and ``.../q/b``).
    """
    hits = set()
    for leaf_path in flatten_with_paths(tree, sep=sep):
        parts = leaf_path.split(sep)
        for i, part in enumerate(parts[:-1]):
            if part in suffixes:
                hits.add(sep.join(parts[: i + 1]))
    return sorted(hits)


def tree_size_bytes(tree: Tree) -> int:
    return sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(tree))


def tree_count_params(tree: Tree) -> int:
    return sum(int(np.prod(leaf.shape)) for leaf in jax.tree.leaves(tree))


def cast_tree(tree: Tree, dtype) -> Tree:
    """Cast all floating-point leaves to ``dtype`` (ints/bools untouched)."""
    import jax.numpy as jnp

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(cast, tree)
