"""Synthetic traffic-sign-style dataset generator.

Produces the exact filesystem contract of the real ETL output
(``{root}/{split}/images/*.png`` + ``{split}/metadata.csv`` with columns
``image_path, source, original_class, unified_class``, reference
Process.py:715-721) from nothing — shape/color-coded classes rendered with
numpy. Used by tests, the CPU-runnable integration config (BASELINE.json
config 1), and CLI demos; plays the role the reference's committed
``fashion_data/`` fixture plays (SURVEY.md §2.1 item 15) without binary
blobs in the repo.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from PIL import Image

from .io import save_metadata

DEFAULT_CLASSES = ("no_entry", "speed_limit", "stop", "warning", "yield")


def _render(cls_idx: int, rng: np.random.Generator, size: int) -> np.ndarray:
    """Class-dependent geometric figure + noise; classes are separable but
    not trivially so (color AND shape carry the label)."""
    img = rng.integers(0, 60, (size, size, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    c = size / 2.0
    r = size * (0.28 + 0.1 * rng.random())
    cx = c + rng.uniform(-2, 2)
    cy = c + rng.uniform(-2, 2)
    color = np.zeros(3, np.uint8)
    color[cls_idx % 3] = 230
    color[(cls_idx + 1) % 3] = 40 * (cls_idx % 5)

    if cls_idx % 3 == 0:  # disk
        mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r ** 2
    elif cls_idx % 3 == 1:  # square
        mask = (np.abs(xx - cx) < r) & (np.abs(yy - cy) < r)
    else:  # triangle
        mask = (yy - cy > -r) & (np.abs(xx - cx) < (yy - cy + r) / 2)
    img[mask] = color
    noise = rng.integers(0, 25, (size, size, 3), dtype=np.uint8)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def make_synthetic_dataset(root: str, *, classes=DEFAULT_CLASSES,
                           n_per_class: dict | int = 8, image_size: int = 32,
                           splits=("train", "val", "test"), source: str = "synthetic",
                           seed: int = 0) -> dict[str, pd.DataFrame]:
    """Write the dataset under ``root``; returns per-split metadata frames."""
    if isinstance(n_per_class, int):
        n_per_class = {s: n_per_class for s in splits}
    out = {}
    for si, split in enumerate(splits):
        rng = np.random.default_rng((seed, si))
        img_dir = os.path.join(root, split, "images")
        os.makedirs(img_dir, exist_ok=True)
        rows = []
        for ci, cls in enumerate(classes):
            for j in range(n_per_class[split]):
                name = f"{cls}_{split}_{j:04d}.png"
                Image.fromarray(_render(ci, rng, image_size)).save(
                    os.path.join(img_dir, name))
                rows.append({"image_path": os.path.join("images", name),
                             "source": source, "original_class": cls,
                             "unified_class": cls})
        df = pd.DataFrame(rows)
        save_metadata(df, os.path.join(root, split, "metadata.csv"))
        out[split] = df
    return out
