"""Pretrained-weight interop: HF ``ViTForImageClassification`` <-> param pytree.

The reference builds its backbone from the HF hub checkpoint
``google/vit-base-patch16-224`` (Utils.py:84-90) and persists fine-tuned
weights as torch ``state_dict`` pickles (train.py:249-254). This module
converts both directions so:

* reference-trained ``{model}_best_model_finetuned.pth`` checkpoints load
  directly into this framework's functional ViT, and
* models fine-tuned here export back to an HF-compatible state dict.

Layout conversions:
* torch ``nn.Linear`` stores ``(out, in)``; kernels here are ``(in, out)``.
* the stride-16 patch conv ``(D, C, P, P)`` becomes the patch-matmul kernel
  ``(P*P*C, D)`` with (row, col, channel) pixel order — exactly matching
  ``models.vit._patchify``.
* per-layer tensors stack on a leading depth axis (the ``lax.scan`` layout).
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np

from .vit import ViTConfig

# (framework path in block i, HF template) for per-layer tensors
_LAYER_MAP = {
    "ln1/scale": "vit.encoder.layer.{i}.layernorm_before.weight",
    "ln1/bias": "vit.encoder.layer.{i}.layernorm_before.bias",
    "attn/q/w": "vit.encoder.layer.{i}.attention.attention.query.weight",
    "attn/q/b": "vit.encoder.layer.{i}.attention.attention.query.bias",
    "attn/k/w": "vit.encoder.layer.{i}.attention.attention.key.weight",
    "attn/k/b": "vit.encoder.layer.{i}.attention.attention.key.bias",
    "attn/v/w": "vit.encoder.layer.{i}.attention.attention.value.weight",
    "attn/v/b": "vit.encoder.layer.{i}.attention.attention.value.bias",
    "attn/o/w": "vit.encoder.layer.{i}.attention.output.dense.weight",
    "attn/o/b": "vit.encoder.layer.{i}.attention.output.dense.bias",
    "ln2/scale": "vit.encoder.layer.{i}.layernorm_after.weight",
    "ln2/bias": "vit.encoder.layer.{i}.layernorm_after.bias",
    "mlp/fc1/w": "vit.encoder.layer.{i}.intermediate.dense.weight",
    "mlp/fc1/b": "vit.encoder.layer.{i}.intermediate.dense.bias",
    "mlp/fc2/w": "vit.encoder.layer.{i}.output.dense.weight",
    "mlp/fc2/b": "vit.encoder.layer.{i}.output.dense.bias",
}


def _as_numpy(state_dict: Mapping) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


def vit_params_from_hf(state_dict: Mapping, cfg: ViTConfig, *,
                       dtype=np.float32) -> dict:
    """HF ``ViTForImageClassification`` state dict -> functional param pytree."""
    sd = _as_numpy(state_dict)

    def get(name):
        if name not in sd:
            raise KeyError(f"missing {name!r} in state dict "
                           f"(have e.g. {sorted(sd)[:3]}...)")
        return sd[name].astype(dtype)

    conv_w = get("vit.embeddings.patch_embeddings.projection.weight")  # (D,C,P,P)
    d, c, p, _ = conv_w.shape
    if (p, d) != (cfg.patch_size, cfg.hidden_dim):
        raise ValueError(f"checkpoint geometry ({d=}, {p=}) != config "
                         f"({cfg.hidden_dim}, {cfg.patch_size})")
    # (D, C, Ph, Pw) -> (Ph, Pw, C, D) -> (P*P*C, D): matches _patchify order.
    proj_w = conv_w.transpose(2, 3, 1, 0).reshape(p * p * c, d)

    blocks: dict[str, list[np.ndarray]] = {k: [] for k in _LAYER_MAP}
    for i in range(cfg.depth):
        for path, tmpl in _LAYER_MAP.items():
            arr = get(tmpl.format(i=i))
            if path.endswith("/w"):
                arr = arr.T  # (out, in) -> (in, out)
            blocks[path].append(arr)
    stacked = {p: np.stack(v) for p, v in blocks.items()}

    from ..utils import trees

    head_w = get("classifier.weight").T
    if head_w.shape[1] != cfg.num_classes:
        raise ValueError(f"classifier has {head_w.shape[1]} classes, "
                         f"config expects {cfg.num_classes}")
    return {
        "embed": {
            "proj": {"w": proj_w,
                     "b": get("vit.embeddings.patch_embeddings.projection.bias")},
            "cls": get("vit.embeddings.cls_token"),
            "pos": get("vit.embeddings.position_embeddings"),
        },
        "blocks": trees.unflatten_from_paths(stacked),
        "final_ln": {"scale": get("vit.layernorm.weight"),
                     "bias": get("vit.layernorm.bias")},
        "head": {"w": head_w, "b": get("classifier.bias")},
    }


def hf_from_vit_params(params, cfg: ViTConfig) -> dict[str, np.ndarray]:
    """Inverse of :func:`vit_params_from_hf` (numpy float32 state dict)."""
    def np32(x):
        return np.asarray(x, np.float32)

    p = cfg.patch_size
    d = cfg.hidden_dim
    proj_w = np32(params["embed"]["proj"]["w"]).reshape(p, p, 3, d).transpose(3, 2, 0, 1)
    sd = {
        "vit.embeddings.patch_embeddings.projection.weight": proj_w,
        "vit.embeddings.patch_embeddings.projection.bias": np32(params["embed"]["proj"]["b"]),
        "vit.embeddings.cls_token": np32(params["embed"]["cls"]),
        "vit.embeddings.position_embeddings": np32(params["embed"]["pos"]),
        "vit.layernorm.weight": np32(params["final_ln"]["scale"]),
        "vit.layernorm.bias": np32(params["final_ln"]["bias"]),
        "classifier.weight": np32(params["head"]["w"]).T,
        "classifier.bias": np32(params["head"]["b"]),
    }
    from ..utils import trees

    stacked = trees.flatten_with_paths(params["blocks"])
    for path, tmpl in _LAYER_MAP.items():
        arr = np32(stacked[path])
        for i in range(cfg.depth):
            layer = arr[i].T if path.endswith("/w") else arr[i]
            sd[tmpl.format(i=i)] = np.ascontiguousarray(layer)
    return sd


def load_checkpoint_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load an HF-format state dict from ``.safetensors`` / torch ``.pth``/
    ``.bin`` (the reference's checkpoint format, train.py:251), or an HF model
    directory containing either."""
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                return load_checkpoint_state_dict(cand)
        raise FileNotFoundError(f"no weights file in {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return _as_numpy(sd)
