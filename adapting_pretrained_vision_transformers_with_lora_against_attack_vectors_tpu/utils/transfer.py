"""Checksum-verified device->host transfers.

On a remote-TPU backend (axon tunnel) ``device_get`` was observed to
*intermittently* return wrong bytes for a leaf of a large pytree — a ViT-B
checkpoint fetched right after a long compile+execute round saved a
corrupted classifier head while every later fetch of the same buffer was
correct (round-2 investigation; the corrupted checkpoint silently dropped
clean accuracy from 1.0 to 0.17 in every downstream stage). A framework
that writes checkpoints and adversarial-image artifacts through this path
must detect that, not trust it.

``verified_get`` computes an on-device integer checksum per leaf (values
bitcast to unsigned words, summed with wraparound — reduction-ORDER-
INDEPENDENT, so the host-side checksum over the fetched bytes is exactly
comparable), fetches, compares, and refetches any mismatched leaf. A
mismatch that persists after ``retries`` refetches raises — a loud failure
instead of a silently-wrong artifact.

Cost: one tiny jitted reduction per leaf per fetch (compiled once per tree
structure) — noise next to the transfer itself.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_WORD = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32, 8: jnp.uint32}


def _device_checksum_leaf(x: jax.Array) -> jax.Array:
    """uint32 wraparound sum of the value's words (order-independent)."""
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
    itemsize = jnp.dtype(x.dtype).itemsize
    if itemsize == 8:
        # split 64-bit words into 32-bit halves via bitcast to uint32 pairs
        w = jax.lax.bitcast_convert_type(x, jnp.uint32)
    else:
        w = jax.lax.bitcast_convert_type(x, _WORD[itemsize])
    return jnp.sum(w.astype(jnp.uint32))  # uint32 add wraps mod 2^32


@jax.jit
def _device_checksums(tree: Any):
    return jax.tree.map(_device_checksum_leaf, tree)


def _host_checksum_leaf(a: np.ndarray) -> int:
    a = np.ascontiguousarray(a)
    if a.dtype == np.bool_:
        a = a.astype(np.uint8)
    word = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint32}[a.dtype.itemsize]
    w = a.view(word if a.dtype.itemsize != 8 else np.uint32)
    return int(w.astype(np.uint64).sum() & 0xFFFFFFFF)


def verified_get(tree: Any, *, retries: int = 3) -> Any:
    """``jax.device_get`` with per-leaf checksum verification + refetch.

    Host-resident leaves (numpy arrays, scalars) pass through untouched.
    Raises ``RuntimeError`` if a leaf still mismatches after ``retries``
    refetches.
    """
    leaves, treedef = jax.tree.flatten(tree)
    device_idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
    if not device_idx:
        return jax.device_get(tree)

    dev_leaves = [leaves[i] for i in device_idx]
    want = [int(c) for c in jax.device_get(_device_checksums(dev_leaves))]

    host = jax.device_get(dev_leaves)
    out = list(leaves)
    for k, i in enumerate(device_idx):
        a = np.asarray(host[k])
        attempt = 0
        while _host_checksum_leaf(a) != want[k]:
            attempt += 1
            if attempt > retries:
                raise RuntimeError(
                    f"device->host transfer corruption persisted after "
                    f"{retries} refetches (leaf shape {a.shape}, dtype "
                    f"{a.dtype}); refusing to write a corrupt artifact")
            import warnings

            warnings.warn("device->host transfer checksum mismatch; "
                          f"refetching leaf (shape {a.shape}, attempt "
                          f"{attempt})", stacklevel=2)
            a = np.asarray(jax.device_get(dev_leaves[k]))
        out[i] = a
    return jax.tree.unflatten(treedef, out)
