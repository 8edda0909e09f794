"""LoRA adapters as pure pytree transformations.

Capability parity with the reference's PEFT usage (reference
``train_loras.py:79-95``: r ∈ {8,16,32}, alpha=16, targets
query/key/value/output.dense) and its merge-based composability study
(reference ``eval_compose.py:102-114``), re-designed functionally:

* An **adapter is a pytree** ``{target_path: {"a": ..., "b": ...}}`` plus a
  static :class:`LoRAConfig`. Target paths address subtrees of the model's
  param dict (e.g. ``"blocks/attn/q"``); with stacked encoder blocks a single
  target covers every layer (factors carry a leading depth axis).
* :func:`attach` inserts the factors into the param tree so ``ops.nn.dense``
  computes the *unmerged* path ``x W + s·(x A) B`` — this is the training
  form (gradients flow only into the adapter pytree passed to ``jax.grad``).
* :func:`merge` folds ``ΔW = s·A B`` into the base weights — the eval form.
  Merging N adapters is a sum of deltas (:func:`merge_many`), replacing the
  reference's iterative ``PeftModel.from_pretrained + merge_and_unload``
  with one jittable pytree op.

The ``W`` convention here is ``(in, out)`` (``y = x @ W``); PEFT/torch store
``(out, in)``, so ``a = A_peft.T`` and ``b = B_peft.T`` under interop
(see ``peft_io.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

from ..utils import trees


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    """Static adapter hyperparameters (hashable; safe as a jit static arg)."""

    rank: int = 8
    alpha: float = 16.0
    targets: tuple[str, ...] = ()  # '/'-joined paths of dense subtrees
    dropout: float = 0.1  # applied to the adapter branch input during training
    # "input": PEFT-exact placement — Bernoulli mask on the adapter-branch
    # input x (C-dim). "post_a": mask on the rank-r projection x@A instead —
    # unbiased like "input" but C/r-fold less mask work and no masked
    # (B, N, C) copies per target (TPU-fast; documented divergence, see
    # ops/nn.dense).
    dropout_mode: str = "input"

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def init(rng: jax.Array, params, cfg: LoRAConfig, *, dtype=jnp.float32) -> dict:
    """Fresh adapter: A ~ He-uniform, B = 0 (so the initial delta is zero).

    Factor shapes follow each target's kernel: for ``w`` of shape
    ``(*lead, in, out)`` (lead = stacked-layer axes), ``a`` is
    ``(*lead, in, r)`` and ``b`` is ``(*lead, r, out)``.
    """
    adapter = {}
    for i, path in enumerate(cfg.targets):
        w = trees.get_path(params, path)["w"]
        *lead, d_in, d_out = w.shape
        # PEFT's kaiming_uniform(a=sqrt(5)): bound = gain*sqrt(3/fan_in) with
        # gain = sqrt(2/(1+5)) -> sqrt(1/fan_in)
        bound = (1.0 / d_in) ** 0.5
        a = jax.random.uniform(jax.random.fold_in(rng, i), (*lead, d_in, cfg.rank),
                               dtype, minval=-bound, maxval=bound)
        adapter[path] = {"a": a, "b": jnp.zeros((*lead, cfg.rank, d_out), dtype)}
    return adapter


def attach(params, adapter: Mapping, cfg: LoRAConfig, *,
           dropout_rng: jax.Array | None = None):
    """Insert adapter factors into the param tree for the unmerged compute path.

    ``dropout_rng``: when given (training form), each target also carries a
    PRNG key + rate so ``ops.nn.dense`` applies inverted dropout to the
    adapter-branch input ``x`` — PEFT's ``lora_dropout`` semantics
    (reference train_loras.py:79-95, rate 0.1). Pass a fresh fold of the
    step rng every step; omit for the eval form (identity)."""
    out = params
    for i, (path, fac) in enumerate(adapter.items()):
        # Scale carries the stacked-layer leading axes of the factors so that
        # lax.scan over stacked blocks can slice it alongside a/b.
        lead = fac["a"].shape[:-2]
        s = jnp.full(lead, cfg.scale, jnp.float32)
        key = (jax.random.fold_in(dropout_rng, i)
               if dropout_rng is not None and cfg.dropout > 0 else None)

        def add(sub, fac=fac, s=s, key=key, lead=lead):
            new = dict(sub)
            new["lora_a"], new["lora_b"], new["lora_s"] = fac["a"], fac["b"], s
            if key is not None:
                # per-stacked-layer keys so scan slices a distinct key per block
                import math

                n_lead = math.prod(lead) if lead else 1
                keys = jax.random.split(key, n_lead)
                rng_key = ("lora_rng_pa" if cfg.dropout_mode == "post_a"
                           else "lora_rng")
                new[rng_key] = keys.reshape(lead) if lead else keys[0]
                new["lora_p"] = jnp.full(lead, cfg.dropout, jnp.float32)
            return new

        out = trees.update_path(out, path, add)
    return out


def detach(params):
    """Strip any lora_* leaves (inverse of :func:`attach`, incl. the
    training-form dropout leaves)."""
    flat = trees.flatten_with_paths(params)
    kept = {p: v for p, v in flat.items()
            if p.rsplit("/", 1)[-1] not in ("lora_a", "lora_b", "lora_s",
                                            "lora_rng", "lora_rng_pa",
                                            "lora_p")}
    return trees.unflatten_from_paths(kept)


def delta(fac: Mapping, scale: float) -> jax.Array:
    """ΔW = scale · A B with arbitrary leading (stacked-layer) axes."""
    return scale * jnp.einsum("...ir,...ro->...io", fac["a"], fac["b"])


def merge(params, adapter: Mapping, cfg: LoRAConfig, *, sign: float = 1.0):
    """Fold ``sign · ΔW`` into the base kernels (sign=-1 un-merges)."""
    out = params
    for path, fac in adapter.items():
        def fold(sub, fac=fac):
            new = dict(sub)
            new["w"] = sub["w"] + sign * delta(fac, cfg.scale).astype(sub["w"].dtype)
            return new
        out = trees.update_path(out, path, fold)
    return out


def merge_many(params, adapters: Sequence[Mapping], cfgs: Sequence[LoRAConfig]):
    """Compose adapters by summed deltas — order-independent, one pass.

    Equivalent to the reference's sequential ``merge_and_unload`` chain
    (eval_compose.py:102-114) because each merge is a plain weight addition.
    """
    out = params
    for adapter, cfg in zip(adapters, cfgs):
        out = merge(out, adapter, cfg)
    return out


def num_params(adapter: Mapping) -> int:
    return trees.tree_count_params(adapter)
