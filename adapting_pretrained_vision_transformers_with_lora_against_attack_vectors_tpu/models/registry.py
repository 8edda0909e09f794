"""Model registry — the multi-backbone factory the reference documents.

The reference README promises five backbones (README.md:49-57) but only ships
the HF ViT-B/16 factory (``Utils.create_vit_model``, Utils.py:84-90); a
``create_model(model_name, ...)`` registry was deleted (still imported by
rp2_attack.py:7 / auto_attack.py:8). This module implements the registry as
designed. Each entry provides:

* ``config(num_classes)`` — static architecture config
* ``init(rng, cfg)`` / ``apply(cfg, params, images)`` — pure functions
* ``lora_targets(...)`` — default adapter target paths
* ``normalization`` — preprocessing mean/std (ImageNet standard for all
  reference backbones, reference Utils.py:92-93)

Additional backbones (swin, dinov1, convnext, yolo11-cls) register themselves
on import from their own modules.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    name: str
    family: str
    config: Callable  # (num_classes) -> cfg
    init: Callable  # (rng, cfg) -> params
    apply: Callable  # (cfg, params, images) -> logits
    lora_targets: Callable  # (cfg) -> tuple[str, ...]
    normalization: tuple = (IMAGENET_MEAN, IMAGENET_STD)


_REGISTRY: dict[str, ModelEntry] = {}


def register(entry: ModelEntry) -> None:
    _REGISTRY[entry.name] = entry


def get_model(name: str) -> ModelEntry:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def create_model(name: str, num_classes: int, rng=None):
    """Reference-parity convenience: returns ``(entry, cfg, params)``.

    Mirrors the deleted ``Utils.create_model(model_name, num_classes)``
    factory; ``params`` are randomly initialised (use
    ``models.pretrained.load`` to fill from pretrained checkpoints).
    """
    import jax

    entry = get_model(name)
    cfg = entry.config(num_classes)
    params = entry.init(rng if rng is not None else jax.random.key(0), cfg)
    return entry, cfg, params


def get_normalization(model_name: str) -> tuple:
    """ImageNet mean/std for every registered backbone (Utils.py:92-93)."""
    return get_model(model_name).normalization if model_name in _REGISTRY else (
        IMAGENET_MEAN, IMAGENET_STD)


# --- built-in model zoo ------------------------------------------------------
# The five reference-documented backbones (README.md:49-57): google_vit,
# swin, dinov1, convnext, yolo11-cls — plus tiny/test variants for CI.
from . import convnext as _convnext  # noqa: E402
from . import swin as _swin  # noqa: E402
from . import vit as _vit  # noqa: E402
from . import yolo11 as _yolo11  # noqa: E402


def _vit_entry(name: str, base_cfg) -> ModelEntry:
    return ModelEntry(
        name=name,
        family="vit",
        config=lambda num_classes, _b=base_cfg: _b.with_classes(num_classes),
        init=_vit.init,
        apply=_vit.apply,
        lora_targets=lambda cfg: _vit.LORA_TARGETS_DEFAULT,
    )


def _entry(name: str, family: str, mod, base_cfg) -> ModelEntry:
    return ModelEntry(
        name=name,
        family=family,
        config=lambda num_classes, _b=base_cfg: _b.with_classes(num_classes),
        init=mod.init,
        apply=mod.apply,
        lora_targets=mod.lora_target_paths,
    )


register(_vit_entry("google_vit", _vit.VIT_B16))
register(_vit_entry("vit_tiny", _vit.VIT_TINY))
register(_vit_entry("vit_test", _vit.VIT_TEST))
# DINOv1: architecturally ViT-B/16; weights come from the self-supervised
# DINO checkpoint (head-less — see hf_import.vit_params_from_hf prefix="").
register(_vit_entry("dinov1", _vit.VIT_B16))
register(_entry("swin", "swin", _swin, _swin.SWIN_B))
register(_entry("swin_test", "swin", _swin, _swin.SWIN_TEST))
register(_entry("convnext", "convnext", _convnext, _convnext.CONVNEXT_B))
register(_entry("convnext_test", "convnext", _convnext, _convnext.CONVNEXT_TEST))
register(_entry("yolo11-cls", "yolo11", _yolo11, _yolo11.YOLO11N_CLS))
register(_entry("yolo11_test", "yolo11", _yolo11, _yolo11.YOLO11_TEST))
