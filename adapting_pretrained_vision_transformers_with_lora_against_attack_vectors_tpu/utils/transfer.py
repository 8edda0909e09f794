"""Checksum-verified device->host transfers.

Round-2 debugging of a corrupted-checkpoint incident produced two lessons:

1. The actual root cause was host-side — ``jax.device_get`` can return an
   ndarray with TRANSPOSED STRIDES (F-contiguous view) that safetensors
   then serializes raw, writing the transpose (fixed at the writers with
   ``np.ascontiguousarray``; see ``utils/checkpoint._atomic_save_file``).
2. Every artifact writer nevertheless goes through ``verified_get`` as
   defense-in-depth: the remote-TPU tunnel is a long, stateful transport,
   and a silently-wrong artifact costs a full pipeline re-run (attacks,
   adapters, eval all consume the bytes downstream).

``verified_get`` computes an on-device integer checksum per leaf (values
bitcast to unsigned words, POSITION-WEIGHTED so element-order permutations
are caught, wraparound-summed so the host-side checksum over the fetched
bytes — strides honored — is exactly comparable regardless of reduction
order), fetches, and compares. The fast path costs one tiny jitted
reduction per tree (compiled once per structure). Only on a mismatch does
it enter delayed retry rounds, re-reading both sides with backoff; a
mismatch that persists raises instead of writing a corrupt artifact.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_WORD = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32, 8: jnp.uint32}


def _device_checksum_leaf(x: jax.Array) -> jax.Array:
    """Position-weighted uint32 wraparound sum: ``sum_i w_i * (i+1) mod 2^32``.

    The weighting makes the checksum sensitive to element ORDER, not just
    the value multiset; products and the sum both wrap mod 2^32 (dtype
    pinned — uint32 would otherwise promote under jax_enable_x64), so the
    host computation below is exactly comparable.
    """
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
    itemsize = jnp.dtype(x.dtype).itemsize
    if itemsize == 8:
        # split 64-bit words into 32-bit halves via bitcast to uint32 pairs
        w = jax.lax.bitcast_convert_type(x, jnp.uint32)
    else:
        w = jax.lax.bitcast_convert_type(x, _WORD[itemsize])
    w = w.astype(jnp.uint32).reshape(-1)
    idx = jax.lax.iota(jnp.uint32, w.shape[0]) + jnp.uint32(1)
    return jnp.sum(w * idx, dtype=jnp.uint32)  # wraps mod 2^32


@jax.jit
def _device_checksums(tree: Any):
    return jax.tree.map(_device_checksum_leaf, tree)


_CHECKSUM_CHUNK = 1 << 22  # words per block: bounds temporaries to ~64 MB


def _host_checksum_leaf(a: np.ndarray) -> int:
    a = np.ascontiguousarray(a)
    if a.dtype == np.bool_:
        a = a.astype(np.uint8)
    word = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint32}[a.dtype.itemsize]
    # reshape BEFORE the dtype view: numpy forbids itemsize-changing views
    # of 0-d arrays (a scalar int64 leaf would crash here otherwise)
    w = a.reshape(-1).view(word if a.dtype.itemsize != 8 else np.uint32)
    # Blocked accumulation: the naive arange+product allocates ~16 B of
    # uint64 temporaries per word (≈450 MB for a stacked ViT MLP leaf) on
    # every artifact fetch; blocks bound it to a few MB with identical
    # results. Index weights are (i+1) mod 2^32 — the device iota is
    # uint32, so the host must wrap identically for >=2^32-word leaves.
    total = 0
    for start in range(0, w.size, _CHECKSUM_CHUNK):
        blk = w[start:start + _CHECKSUM_CHUNK].astype(np.uint64)
        idx = (np.arange(start + 1, start + 1 + blk.size,
                         dtype=np.uint64)) & 0xFFFFFFFF
        # truncate each product to uint32 (device multiplies wrap mod 2^32);
        # the block sum of <=2^22 terms < 2^54 fits uint64 without overflow
        total = (total + int(((blk * idx) & 0xFFFFFFFF).sum())) & 0xFFFFFFFF
    return total


def verified_get(tree: Any, *, retries: int = 3) -> Any:
    """``jax.device_get`` with per-leaf checksum verification.

    Fast path: one device-checksum program + the fetch; leaves whose host
    checksum matches are accepted immediately (no sleeps, no extra reads).
    On mismatch, the (checksum, fetch) round repeats for the failing leaves
    with an increasing backoff; a leaf that still disagrees after
    ``retries`` delayed rounds raises ``RuntimeError`` — a loud failure
    instead of a silently-wrong artifact.

    Host-resident leaves (numpy arrays, scalars) pass through untouched.
    """
    leaves, treedef = jax.tree.flatten(tree)
    device_idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
    if not device_idx:
        return jax.device_get(tree)

    dev_leaves = [leaves[i] for i in device_idx]
    pending = list(range(len(dev_leaves)))  # indices into dev_leaves
    good: dict[int, np.ndarray] = {}
    for attempt in range(retries + 1):
        if attempt:
            import time

            time.sleep(0.2 * attempt)
        subset = [dev_leaves[k] for k in pending]
        want = [int(c) for c in jax.device_get(_device_checksums(subset))]
        host = [np.asarray(a) for a in jax.device_get(subset)]
        still_bad = []
        for j, k in enumerate(pending):
            if _host_checksum_leaf(host[j]) == want[j]:
                good[k] = host[j]
            else:
                still_bad.append(k)
        if not still_bad:
            break
        pending = still_bad
        if attempt < retries:  # a retry actually follows; the final
            import warnings  # mismatch is reported by the raise below

            shapes = [tuple(dev_leaves[k].shape) for k in pending]
            warnings.warn(
                f"device->host transfer checksum mismatch on {len(pending)} "
                f"leaf/leaves {shapes}; retrying after backoff "
                f"(attempt {attempt + 1})", stacklevel=2)
    else:
        shapes = [tuple(dev_leaves[k].shape) for k in pending]
        raise RuntimeError(
            f"device->host transfer corruption persisted after {retries} "
            f"delayed retries (leaves {shapes}); refusing to write a "
            f"corrupt artifact")

    out = list(leaves)
    for k, i in enumerate(device_idx):
        out[i] = good[k]
    return jax.tree.unflatten(treedef, out)
