"""LoRA composability evaluation — the framework's top-level science harness.

Capability parity with reference ``eval_compose.py``: evaluate the base
model, each per-attack LoRA adapter, and every 2-way/3-way/all-way adapter
combination on the clean test set plus every attack's adversarial test set,
then emit a JSON results file and an aligned summary table
(eval_compose.py:275-433, 485-512). Re-designed TPU-first:

* Variant weights are built **functionally**: merging N adapters is one
  pytree op summing ``ΔW = Σ sᵢ·AᵢBᵢ`` (``ops.lora.merge_many``), replacing
  the reference's iterative ``PeftModel.from_pretrained`` +
  ``merge_and_unload`` model surgery (eval_compose.py:102-114). Head
  (classifier) semantics match PEFT: the last-merged adapter's saved
  classifier wins.
* One jitted eval step serves **every variant × dataset pair** — params are
  arguments, so the sweep is |variants|·|datasets| executions of a single
  compiled program (the reference re-builds a torch model per variant).
* ``test_mode`` selector matches the reference CLI: ``all`` /``base_only`` /
  ``individual_only`` / ``combinations_only`` (eval_compose.py:446-447).
"""

from __future__ import annotations

import glob
import itertools
import json
import os
from typing import Callable, Mapping, Optional, Sequence

import jax
import numpy as np

from ..attacks.common import Normalizer
from ..data.loader import CachedLoader, Loader
from ..models.registry import ModelEntry, get_normalization
from ..ops import lora, peft_io
from ..train.loop import evaluate
from ..train.steps import make_eval_step


def enumerate_variants(attacks: Sequence[str], *, test_mode: str = "all"
                       ) -> list[tuple[str, tuple[str, ...]]]:
    """(variant_name, adapters-to-merge) pairs, reference enumeration order:
    base, each individual, all C(n,2), C(n,3), then the full set
    (eval_compose.py:286, 329, 372)."""
    variants: list[tuple[str, tuple[str, ...]]] = []
    if test_mode in ("all", "base_only"):
        variants.append(("base", ()))
    if test_mode in ("all", "individual_only"):
        variants.extend((f"lora_{a}", (a,)) for a in attacks)
    if test_mode in ("all", "combinations_only"):
        for k in (2, 3):
            if len(attacks) > k:
                variants.extend(("+".join(c), c)
                                for c in itertools.combinations(attacks, k))
        if len(attacks) >= 2:
            variants.append(("+".join(attacks), tuple(attacks)))
    # dedupe while keeping order (full set may equal a C(k) combo)
    seen, out = set(), []
    for name, combo in variants:
        if name not in seen:
            seen.add(name)
            out.append((name, combo))
    return out


def build_variant_params(base_params, combo: Sequence[str],
                         adapters: Mapping[str, tuple]) -> dict:
    """Merge the named adapters into the base. ``adapters[name]`` is
    ``(adapter_pytree, LoRAConfig, head-or-None)``. Last merged head wins
    (PEFT sequential-merge semantics, eval_compose.py:102-114)."""
    ads = [adapters[a][0] for a in combo]
    cfgs = [adapters[a][1] for a in combo]
    params = lora.merge_many(base_params, ads, cfgs)
    for a in reversed(combo):
        head = adapters[a][2]
        if head is not None:
            params = dict(params)
            # arbitrary head tree (flat linear {w,b} or yolo11-cls nested)
            params["head"] = jax.tree.map(np.asarray, head)
            break
    return params


def find_lora_adapters(lora_root: str, attacks: Sequence[str], rank: int,
                       *, tag: str = "best", model: Optional[str] = None,
                       source: Optional[str] = None,
                       log: Callable[[str], None] = print) -> dict[str, tuple]:
    """Discover per-attack adapter dirs and load them.

    Accepts both the flat layout the CLI composes
    (``{lora_root}/{attack}/rank{r}_{tag}_adapter``) and the reference's
    nested tree (``{lora_root}/{model}/{source}/{attack}/...``,
    eval_compose.py:197-208) — with ``model``/``source`` pinning the nested
    path, or a glob over them when not given. Discovered and missing
    adapters are logged so a wrong ``lora_root`` fails loudly, not as a
    silently empty variant matrix."""
    found = {}
    suffix = f"rank{rank}_{tag}_adapter"
    for attack in attacks:
        candidates = [os.path.join(lora_root, attack, suffix)]
        # nested layout: pin whichever of model/source was given — an
        # unpinned "*" there could silently load a DIFFERENT model's or
        # source's adapter when several trees share one lora_root
        candidates.extend(sorted(glob.glob(os.path.join(
            lora_root, model or "*", source or "*", attack, suffix))))
        hit = next((d for d in candidates if os.path.isdir(d)), None)
        if hit is None:
            log(f"find_lora_adapters: no {attack!r} adapter "
                f"({suffix}) under {lora_root}")
            continue
        log(f"find_lora_adapters: {attack} <- {hit}")
        found[attack] = peft_io.load_peft_adapter(hit)
    return found


def make_device_variant_builder(base_params, adapters: Mapping[str, tuple]):
    """Variant weights built ON DEVICE: one jitted ΔW-sum + head-swap program
    per (adapter-config signature, head-presence) pair.

    The eager path (:func:`build_variant_params`) dispatches ~4 ops per
    target per adapter (einsum, cast, add, tree rebuild) — ~20-60 round
    trips per variant through a remote-device transport (the axon tunnel)
    plus a host-side head upload. Here the base tree and each (tiny, rank-r)
    adapter are resident once and every variant is ONE program execution;
    combos of equal size share a compiled program because the scales are
    closed-over constants of the config tuple (reference hot loop:
    eval_compose.py:275-433 rebuilds a torch model per variant)."""
    base_d = jax.device_put(base_params)
    ads_d = {
        name: (jax.device_put(ad), cfg,
               # head is an arbitrary tree — flat {w,b} for linear heads,
               # nested conv->linear for yolo11-cls (peft_io framework_head)
               None if head is None else jax.device_put(
                   jax.tree.map(np.asarray, head)))
        for name, (ad, cfg, head) in adapters.items()
    }
    compiled: dict = {}

    def build(combo: Sequence[str]):
        if not combo:
            return base_d
        cfgs = tuple(ads_d[a][1] for a in combo)
        head_src = next((a for a in reversed(combo)
                         if ads_d[a][2] is not None), None)
        key = (cfgs, head_src is not None)
        if key not in compiled:
            def merge_fn(base, ads, head, cfgs=cfgs):
                p = lora.merge_many(base, ads, cfgs)
                if head is not None:
                    p = dict(p)
                    p["head"] = head
                return p
            compiled[key] = jax.jit(merge_fn)
        return compiled[key](base_d, [ads_d[a][0] for a in combo],
                             None if head_src is None else ads_d[head_src][2])

    return build


def run_composability_eval(
    entry: ModelEntry,
    base_params,
    adapters: Mapping[str, tuple],
    dataloaders: Mapping[str, Loader],
    num_classes: int,
    *,
    test_mode: str = "all",
    mesh=None,
    normalize: Optional[Normalizer] = None,
    out_path: Optional[str] = None,
    cfg=None,
    device_merge: bool = True,
    log: Callable[[str], None] = print,
) -> dict:
    """The full matrix: every variant × every dataset.

    ``dataloaders``: ``{"clean": Loader, "<attack>": Loader, ...}``.
    Returns ``{variant: {dataset: {accuracy, f1, ...}}}`` and optionally
    writes it as JSON (reference ``test_results.json``, eval_compose.py:485-487).
    """
    cfg = cfg if cfg is not None else entry.config(num_classes)
    normalize = normalize or Normalizer(*get_normalization(entry.name))
    eval_step = make_eval_step(lambda p, x: entry.apply(cfg, p, x),
                               num_classes, normalize=normalize)
    # each dataset is consumed once per variant — decode it once and replay
    # from host RAM (pass-through for shuffled/oversized loaders and for
    # already-replayable loaders, e.g. in-memory benchmark feeds)
    dataloaders = {k: CachedLoader(v) if isinstance(v, Loader) else v
                   for k, v in dataloaders.items()}

    # device-built variants need explicit placement; under a mesh the eval
    # step owns placement/sharding, so keep the host merge + device_put path
    builder = (make_device_variant_builder(base_params, adapters)
               if device_merge and mesh is None else None)

    results: dict[str, dict] = {}
    for name, combo in enumerate_variants(tuple(adapters), test_mode=test_mode):
        if builder is not None:
            params = builder(combo)
        else:
            params = build_variant_params(base_params, combo, adapters)
            params = jax.device_put(params)
        results[name] = {}
        for ds_name, loader in dataloaders.items():
            m = evaluate(eval_step, params, loader, mesh=mesh)
            results[name][ds_name] = {k: m[k] for k in
                                      ("accuracy", "f1", "loss", "support")}
        log(f"{name}: " + "  ".join(
            f"{d}={results[name][d]['accuracy']:.4f}" for d in dataloaders))

    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    return results


def format_summary_table(results: Mapping[str, Mapping[str, Mapping]]) -> str:
    """Aligned console table (reference eval_compose.py:490-512)."""
    if not results:
        return "(no results)"
    datasets = list(next(iter(results.values())))
    name_w = max(len("MODEL VARIANT"), max(len(n) for n in results)) + 2
    col_w = max(12, max(len(d) for d in datasets) + 2)
    lines = ["MODEL VARIANT".ljust(name_w)
             + "".join(d.ljust(col_w) for d in datasets)]
    lines.append("-" * (name_w + col_w * len(datasets)))
    for name, per_ds in results.items():
        row = name.ljust(name_w)
        for d in datasets:
            acc = per_ds.get(d, {}).get("accuracy")
            row += (f"{acc:.4f}".ljust(col_w) if acc is not None
                    else "-".ljust(col_w))
        lines.append(row)
    return "\n".join(lines)
