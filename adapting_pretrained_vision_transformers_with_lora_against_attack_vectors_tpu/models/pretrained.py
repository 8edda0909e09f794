"""Pretrained-weight loading facade over the per-family importers.

The reference pulls ``google/vit-base-patch16-224`` from the HF hub at
runtime (Utils.py:84-90). This environment has **no network egress**, so
loading is strictly file-based: point at a local checkpoint (an HF model
directory, ``model.safetensors``, ``pytorch_model.bin``, or the reference's
torch ``.pth`` state-dict pickles) and the right converter is chosen from
the registry family. Random init is the explicit fallback, never a silent
download."""

from __future__ import annotations

import os
from typing import Optional

import jax

from . import convnext, hf_import, swin, vit
from .registry import ModelEntry, get_model


def load_pretrained(name: str, num_classes: int, checkpoint: Optional[str],
                    *, rng: Optional[jax.Array] = None):
    """Returns ``(entry, cfg, params)``.

    ``checkpoint=None`` -> random init (and a zero-delta LoRA attach still
    works). Families: vit/dinov1, swin, convnext — both HF-transformers and
    timm state-dict naming are auto-detected (the reference README sources
    its zoo "via TIMM") — and yolo11 in ultralytics ``model.N...`` naming
    (``hf_import.yolo11_params_from_ultralytics``), completing the 5/5
    pretrained-import zoo."""
    entry = get_model(name)
    cfg = entry.config(num_classes)
    if checkpoint is None:
        params = entry.init(rng if rng is not None else jax.random.key(0), cfg)
        return entry, cfg, params

    if not os.path.exists(checkpoint):
        raise FileNotFoundError(checkpoint)
    sd = hf_import.load_checkpoint_state_dict(checkpoint)

    is_timm = "patch_embed.proj.weight" in sd or "stem.0.weight" in sd
    if entry.family == "vit":
        if is_timm:
            params = hf_import.vit_params_from_timm(
                sd, cfg, allow_missing_head="head.weight" not in sd)
        else:
            prefix = "vit." if any(k.startswith("vit.") for k in sd) else ""
            params = hf_import.vit_params_from_hf(
                sd, cfg, prefix=prefix,
                allow_missing_head="classifier.weight" not in sd)
    elif entry.family == "swin":
        params = (hf_import.swin_params_from_timm(sd, cfg) if is_timm
                  else hf_import.swin_params_from_hf(sd, cfg))
    elif entry.family == "convnext":
        params = (hf_import.convnext_params_from_timm(sd, cfg) if is_timm
                  else hf_import.convnext_params_from_hf(sd, cfg))
    elif entry.family == "yolo11":
        lin = next((k for k in sd if k.endswith("linear.weight")), None)
        n_ckpt = sd[lin].shape[0] if lin is not None else -1
        params = hf_import.yolo11_params_from_ultralytics(
            sd, cfg, allow_missing_head=n_ckpt != cfg.num_classes)
    else:
        raise ValueError(f"no weight importer for family {entry.family!r} "
                         f"(model {name!r}); omit checkpoint for random init")
    return entry, cfg, params
