"""PEFT-format LoRA adapter interop.

The reference saves adapters with PEFT ``save_pretrained``
(train_loras.py:342-355: ``adapter_config.json`` + ``adapter_model.safetensors``)
and reloads them with ``PeftModel.from_pretrained`` (eval_compose.py:102-114).
This module reads and writes that exact format so:

* adapters trained by the reference evaluate in this framework, and
* adapters trained here load into PEFT unchanged.

Key mapping (HF ``ViTForImageClassification`` module names, torch
``(out, in)`` weight convention → this framework's stacked-block pytree with
``(in, out)`` kernels — factors transpose and stack on the layer axis):

==========================================  ===========================
PEFT module (per encoder layer ``i``)        framework target path
==========================================  ===========================
``vit.encoder.layer.{i}.attention.attention.query``   ``blocks/attn/q``
``...attention.attention.key``                        ``blocks/attn/k``
``...attention.attention.value``                      ``blocks/attn/v``
``...attention.output.dense``                         ``blocks/attn/o``
``...intermediate.dense``                             ``blocks/mlp/fc1``
``...output.dense``                                   ``blocks/mlp/fc2``
==========================================  ===========================

PEFT quirk reproduced exactly: the reference's ``target_modules=["query",
"key", "value", "output.dense"]`` is *suffix-matched* by PEFT, so
``output.dense`` hits BOTH the attention output projection and the MLP down
projection — reference adapters carry factors for all five module families.
"""

from __future__ import annotations

import json
import os
import re
from typing import Mapping, Optional

import numpy as np

from ..utils import trees
from .lora import LoRAConfig

# framework target path -> (peft module template, peft target_modules name)
_PATH_TO_PEFT = {
    "blocks/attn/q": "vit.encoder.layer.{i}.attention.attention.query",
    "blocks/attn/k": "vit.encoder.layer.{i}.attention.attention.key",
    "blocks/attn/v": "vit.encoder.layer.{i}.attention.attention.value",
    "blocks/attn/o": "vit.encoder.layer.{i}.attention.output.dense",
    "blocks/mlp/fc1": "vit.encoder.layer.{i}.intermediate.dense",
    "blocks/mlp/fc2": "vit.encoder.layer.{i}.output.dense",
}
_PEFT_RE = re.compile(
    r"base_model\.model\.vit\.encoder\.layer\.(\d+)\."
    r"(attention\.attention\.(?:query|key|value)|attention\.output\.dense|"
    r"intermediate\.dense|output\.dense)\.lora_(A|B)\.weight")

_MODULE_TO_PATH = {
    "attention.attention.query": "blocks/attn/q",
    "attention.attention.key": "blocks/attn/k",
    "attention.attention.value": "blocks/attn/v",
    "attention.output.dense": "blocks/attn/o",
    "intermediate.dense": "blocks/mlp/fc1",
    "output.dense": "blocks/mlp/fc2",
}

# PEFT target_modules entries the reference uses; suffix semantics.
_TARGETS_TO_PATHS = {
    "query": ("blocks/attn/q",),
    "key": ("blocks/attn/k",),
    "value": ("blocks/attn/v",),
    "output.dense": ("blocks/attn/o", "blocks/mlp/fc2"),
    "intermediate.dense": ("blocks/mlp/fc1",),
}


def peft_targets_to_paths(target_modules) -> tuple[str, ...]:
    """Expand PEFT ``target_modules`` (suffix-matched) into framework paths."""
    paths: list[str] = []
    for t in target_modules:
        for p in _TARGETS_TO_PATHS.get(t, ()):
            if p not in paths:
                paths.append(p)
    return tuple(paths)


def paths_to_peft_targets(paths) -> list[str]:
    out: list[str] = []
    for p in paths:
        if p in ("blocks/attn/o", "blocks/mlp/fc2"):
            name = "output.dense"
        else:
            name = {"blocks/attn/q": "query", "blocks/attn/k": "key",
                    "blocks/attn/v": "value",
                    "blocks/mlp/fc1": "intermediate.dense"}.get(p, p)
        if name not in out:
            out.append(name)
    return out


def save_peft_adapter(adapter: Mapping, cfg: LoRAConfig, out_dir: str, *,
                      head: Optional[Mapping] = None,
                      base_model_name: str = "google/vit-base-patch16-224") -> None:
    """Write ``adapter_config.json`` + ``adapter_model.safetensors`` (PEFT layout).

    ``head``: optional classifier params ``{"w": (in, out), "b": (out,)}``.
    The reference trains with ``TaskType.SEQ_CLS`` (train_loras.py:79-95),
    which makes PEFT treat the classifier as a ``modules_to_save`` full copy —
    pass the trained head to produce that exact artifact. Without a head the
    adapter is saved task-type-free (LoRA factors only).
    """
    from safetensors.numpy import save_file

    from ..utils.transfer import verified_get

    os.makedirs(out_dir, exist_ok=True)
    # checksum-verified fetch (utils/transfer.py): remote-TPU device_get can
    # intermittently return wrong bytes; never persist an unverified tree.
    adapter = verified_get(adapter)
    if head is not None:
        head = verified_get(head)
    tensors: dict[str, np.ndarray] = {}
    for path, fac in adapter.items():
        if path not in _PATH_TO_PEFT:
            # Non-ViT backbone target (swin/convnext/yolo11): HF PEFT has no
            # module naming for these, so persist under a framework-native
            # key the loader below understands. Factors keep their full
            # stacked-lead shapes.
            tensors[f"framework.{path}.lora_A"] = np.asarray(fac["a"], np.float32)
            tensors[f"framework.{path}.lora_B"] = np.asarray(fac["b"], np.float32)
            continue
        tmpl = _PATH_TO_PEFT[path]
        a = np.asarray(fac["a"], np.float32)  # (L, in, r)
        b = np.asarray(fac["b"], np.float32)  # (L, r, out)
        for i in range(a.shape[0]):
            mod = tmpl.format(i=i)
            # torch convention: lora_A (r, in), lora_B (out, r)
            tensors[f"base_model.model.{mod}.lora_A.weight"] = a[i].T
            tensors[f"base_model.model.{mod}.lora_B.weight"] = b[i].T
    if head is not None:
        if "w" in head:
            tensors["base_model.model.classifier.weight"] = np.asarray(
                head["w"], np.float32).T
            tensors["base_model.model.classifier.bias"] = np.asarray(
                head["b"], np.float32)
        else:
            # Non-linear classifier head (yolo11-cls: conv -> pool -> linear,
            # models/yolo11.py `head`): PEFT has no module naming for it, so
            # persist the full head tree under framework-native keys that
            # load_peft_adapter reconstructs (same rationale as the
            # `framework.` adapter-factor branch above).
            for path, leaf in _flatten_tree(head):
                tensors[f"framework_head.{path}"] = np.asarray(leaf, np.float32)
    # C-contiguity before safetensors: it writes raw buffers assuming C
    # order, silently transposing F-strided device_get results (see
    # utils/checkpoint._atomic_save_file)
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, os.path.join(out_dir, "adapter_model.safetensors"))

    config = {
        "peft_type": "LORA",
        "task_type": "SEQ_CLS" if head is not None else None,
        "base_model_name_or_path": base_model_name,
        "r": cfg.rank,
        "lora_alpha": cfg.alpha,
        "lora_dropout": cfg.dropout,
        "target_modules": paths_to_peft_targets(adapter.keys()),
        "bias": "none",
        "fan_in_fan_out": False,
        "inference_mode": True,
        "modules_to_save": ["classifier"] if head is not None else None,
        "use_rslora": False,
        "use_dora": False,
    }
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(config, f, indent=2)


def load_peft_adapter(adapter_dir: str, *, depth: Optional[int] = None
                      ) -> tuple[dict, LoRAConfig, Optional[dict]]:
    """Read a PEFT LoRA directory into ``(adapter, LoRAConfig, head-or-None)``.

    Accepts directories written either by this module or by HF PEFT (the
    reference's ``rank{r}_best_adapter`` artifacts). ``head`` is the
    ``modules_to_save`` classifier copy as ``{"w": (in, out), "b": (out,)}``
    when present.
    """
    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        config = json.load(f)
    if config.get("peft_type") != "LORA":
        raise ValueError(f"not a LoRA adapter: peft_type={config.get('peft_type')}")

    tensors = _read_adapter_tensors(adapter_dir)

    # per-path, per-layer factor collection
    per_path: dict[str, dict[int, dict[str, np.ndarray]]] = {}
    native: dict[str, dict[str, np.ndarray]] = {}
    for key, arr in tensors.items():
        if key.startswith("framework."):
            body, which = key[len("framework."):].rsplit(".lora_", 1)
            native.setdefault(body, {})[which] = np.asarray(arr)
            continue
        m = _PEFT_RE.fullmatch(key)
        if m is None:
            continue  # classifier/modules_to_save handled elsewhere
        layer, module, which = int(m.group(1)), m.group(2), m.group(3)
        path = _MODULE_TO_PATH[module]
        per_path.setdefault(path, {}).setdefault(layer, {})[which] = np.asarray(arr)

    adapter: dict = {}
    for path, fac in native.items():
        adapter[path] = {"a": fac["A"], "b": fac["B"]}
    for path, layers in per_path.items():
        n = (depth if depth is not None else max(layers) + 1)
        a_list, b_list = [], []
        for i in range(n):
            fac = layers.get(i)
            if fac is None:
                raise ValueError(f"adapter missing layer {i} for {path}")
            a_list.append(fac["A"].T)  # (in, r)
            b_list.append(fac["B"].T)  # (r, out)
        adapter[path] = {"a": np.stack(a_list), "b": np.stack(b_list)}

    cfg = LoRAConfig(rank=int(config["r"]), alpha=float(config["lora_alpha"]),
                     targets=tuple(sorted(adapter.keys())),
                     dropout=float(config.get("lora_dropout", 0.0)))

    head = None
    fh = {k[len("framework_head."):]: np.asarray(v)
          for k, v in tensors.items() if k.startswith("framework_head.")}
    if fh:
        return adapter, cfg, _unflatten_tree(fh)
    for w_key in ("base_model.model.classifier.weight",
                  "base_model.model.classifier.modules_to_save.default.weight"):
        if w_key in tensors:
            b_key = w_key.rsplit(".", 1)[0] + ".bias"
            head = {"w": np.asarray(tensors[w_key]).T,
                    "b": np.asarray(tensors[b_key])}
            break
    return adapter, cfg, head


def _flatten_tree(tree: Mapping, prefix: str = ""):
    """Yield (slash-path, leaf) for a nested dict-of-arrays head tree."""
    for k in sorted(tree):
        v = tree[k]
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            yield from _flatten_tree(v, p)
        else:
            yield p, v


def _unflatten_tree(flat: Mapping[str, np.ndarray]) -> dict:
    out: dict = {}
    for path, arr in flat.items():
        *parts, last = path.split("/")
        cur = out
        for part in parts:
            cur = cur.setdefault(part, {})
        cur[last] = arr
    return out


def _read_adapter_tensors(adapter_dir: str) -> dict[str, np.ndarray]:
    st = os.path.join(adapter_dir, "adapter_model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return dict(load_file(st))
    bin_path = os.path.join(adapter_dir, "adapter_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.detach().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no adapter weights in {adapter_dir}")
