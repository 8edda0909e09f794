"""Metadata-driven dataset index + double-buffered batch loader.

Replaces the reference's ``TrafficSignDataset`` + torch ``DataLoader``
(Utils.py:12-82, train.py:206-213) with a TPU-oriented pipeline:

* :class:`MetadataIndex` — resolves image paths (same 3-way fallback as the
  reference), encodes labels through the **immutable** `LabelVocabulary`
  (fixing the reference's per-split remapping bug, Utils.py:61-65 /
  SURVEY.md §2.4 item 2).
* :class:`Loader` — threads decode PIL images to a fixed static shape,
  assembles padded uint8 batches (``valid`` mask keeps shapes static for
  XLA), and prefetches ahead of the consumer so device compute overlaps
  host decode. Images cross to the device as uint8; conversion to [0,1]
  floats and normalization happen on device.

Resize/crop backend: with ``decode_backend='auto'`` (default) the
resize+center-crop after PIL's PNG/JPEG decode runs in the native C++
library (``utils.native.resize_center_crop`` — the role OpenCV's C++ plays
under the reference's Python), falling back to PIL when the library is
unavailable. The native resampler matches PIL to <=2 uint8 LSB
(tests/test_native_kernels.py); pass ``decode_backend='pil'`` for bit-exact
torchvision-eval-pipeline parity runs.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from PIL import Image

from ..utils.vocab import LabelVocabulary
from .io import filter_metadata, read_metadata, resolve_image_path
from .transforms import eval_transform_pil


@dataclass
class Batch:
    images: np.ndarray  # (B, H, W, 3) uint8
    labels: np.ndarray  # (B,) int32
    valid: np.ndarray  # (B,) float32, 0 for padding
    filenames: list[str]
    # sample positions into the owning MetadataIndex (len == #real samples;
    # padding rows have none) — artifact writers use these to pair outputs
    # with their exact metadata rows (duplicate basenames / skipped rows /
    # shuffled order are all ambiguous by name alone)
    ids: Optional[np.ndarray] = None

    def images_f32(self) -> np.ndarray:
        return self.images.astype(np.float32) / 255.0


class MetadataIndex:
    """Sample index over one ``metadata.csv`` (optionally source-filtered)."""

    def __init__(self, metadata: str | pd.DataFrame, vocab: LabelVocabulary, *,
                 root_dir: str = ".", sources: Optional[Sequence[str]] = None,
                 strict: bool = False):
        df = read_metadata(metadata) if isinstance(metadata, str) else metadata
        meta_dir = os.path.dirname(os.path.abspath(metadata)) if isinstance(metadata, str) else root_dir
        df = filter_metadata(df, sources)

        self.vocab = vocab
        self.root_dir = root_dir
        paths, labels, filenames, kept, missing = [], [], [], [], 0
        for pos, row in enumerate(df.itertuples()):
            resolved = resolve_image_path(str(row.image_path), meta_dir, root_dir)
            if resolved is None:
                if strict:
                    raise FileNotFoundError(row.image_path)
                missing += 1
                continue
            paths.append(resolved)
            labels.append(vocab.index_of(str(row.unified_class)))
            filenames.append(os.path.basename(resolved))
            kept.append(pos)
        if missing:
            print(f"MetadataIndex: skipped {missing} rows with missing images")
        self.paths = paths
        self.labels = np.asarray(labels, np.int32)
        self.filenames = filenames
        # metadata rows of the RETAINED samples, position-aligned with
        # paths/labels/filenames: sample i <-> frame.iloc[i]. Artifact
        # writers (attacks/generate) build adversarial metadata from this,
        # never by basename matching.
        self.frame = df.iloc[kept].reset_index(drop=True)

    def __len__(self) -> int:
        return len(self.paths)


class Loader:
    """Batched iterator with threaded decode + background prefetch."""

    def __init__(self, index: MetadataIndex, *, batch_size: int,
                 image_size: int = 224, resize: int = 256,
                 shuffle: bool = False, seed: int = 0,
                 drop_remainder: bool = False, pad_final: bool = True,
                 num_workers: int = 8, prefetch: int = 2,
                 decode_backend: str = "auto"):
        self.index = index
        self.batch_size = batch_size
        if resize < image_size:
            # the native path raises mid-epoch from a worker thread and the
            # PIL path silently black-pads — fail loudly at construction
            raise ValueError(f"resize ({resize}) must be >= image_size "
                             f"({image_size})")
        self.image_size = image_size
        self.resize = resize
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.pad_final = pad_final
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0
        if decode_backend not in ("auto", "native", "pil"):
            raise ValueError(f"decode_backend {decode_backend!r}")
        if decode_backend == "pil":
            self._native = None
        else:
            from ..utils import native as _native

            if decode_backend == "native" and not _native.available():
                raise RuntimeError("decode_backend='native' but the C++ "
                                   "library is unavailable")
            self._native = _native if _native.available() else None

    def __len__(self) -> int:
        n, b = len(self.index), self.batch_size
        return n // b if self.drop_remainder else (n + b - 1) // b

    def _decode(self, i: int) -> np.ndarray:
        path = self.index.paths[i]
        if self._native is not None:
            if path.endswith(".png"):
                # hot path: PNG bytes -> resize -> crop in one native call
                # (libdeflate inflate + C++ unfilter, ~2.7x the PIL-decode
                # path on the loader-test corpus); None -> exotic PNG shape,
                # fall through to PIL
                with open(path, "rb") as f:
                    data = f.read()
                out = self._native.decode_png_resize_center_crop(
                    data, self.resize, self.image_size)
                if out is not None:
                    return out
                # exotic PNG (16-bit/interlaced/...): reuse the bytes already
                # in memory instead of re-reading the file for PIL
                import io as _io

                with Image.open(_io.BytesIO(data)) as img:
                    arr = np.asarray(img.convert("RGB"), np.uint8)
                    return self._native.resize_center_crop(
                        arr, self.resize, self.image_size)
            with Image.open(path) as img:
                arr = np.asarray(img.convert("RGB"), np.uint8)
                return self._native.resize_center_crop(
                    arr, self.resize, self.image_size)
        with Image.open(path) as img:
            return eval_transform_pil(img, resize=self.resize, crop=self.image_size)

    def _order(self) -> np.ndarray:
        order = np.arange(len(self.index))
        if self.shuffle:
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
        return order

    def __iter__(self) -> Iterator[Batch]:
        order = self._order()
        self._epoch += 1
        b = self.batch_size
        n_batches = len(self)

        def make_batch(pool: ThreadPoolExecutor, k: int) -> Batch:
            idxs = order[k * b:(k + 1) * b]
            imgs = list(pool.map(self._decode, idxs))
            pad = b - len(idxs) if self.pad_final else 0
            if pad:
                imgs.extend([np.zeros_like(imgs[0])] * pad)
            images = np.stack(imgs)
            labels = np.concatenate([self.index.labels[idxs],
                                     np.zeros(pad, np.int32)])
            valid = np.concatenate([np.ones(len(idxs), np.float32),
                                    np.zeros(pad, np.float32)])
            names = [self.index.filenames[i] for i in idxs]
            return Batch(images, labels, valid, names, ids=np.asarray(idxs))

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that aborts when the consumer is gone (never
            blocks a dying producer on a full queue)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # Exceptions (e.g. a truncated PNG mid-epoch) propagate to the
            # consumer through the queue — the consumer must never block
            # forever on a dead producer.
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for k in range(n_batches):
                        if stop.is_set():
                            return
                        if not put(make_batch(pool, k)):
                            return
                put(None)
            except BaseException as e:  # noqa: BLE001
                put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # drain so a producer blocked in put() can observe stop and exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class CachedLoader:
    """Replayable wrapper: decode the underlying loader once, then serve the
    batches from host RAM on every later iteration.

    For consumers that sweep the same split many times (eval/compose runs
    |variants| passes per dataset — 16 with four adapters), the host PNG
    decode dominates repeat cost; this removes it after the first pass.
    Caches only when (a) the loader is unshuffled (a shuffling loader yields
    a DIFFERENT epoch order each pass — replaying would silently change
    semantics) and (b) the estimated decoded size fits ``max_bytes``;
    otherwise it degrades to a transparent pass-through.
    """

    def __init__(self, loader: Loader, *, max_bytes: int = 4 << 30):
        self.loader = loader
        est = len(loader.index) * loader.image_size * loader.image_size * 3
        self._cache: Optional[list[Batch]] = (
            [] if (not loader.shuffle and est <= max_bytes) else None)
        self._filled = False

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self) -> Iterator[Batch]:
        if self._cache is None:
            yield from self.loader
            return
        if self._filled:
            yield from self._cache
            return
        # fill a LOCAL list and publish only on clean completion: an
        # interrupted first pass (mid-epoch decode error, consumer break)
        # must not leave a stale prefix that a retry would duplicate
        fill: list[Batch] = []
        for b in self.loader:
            fill.append(b)
            yield b
        self._cache = fill
        self._filled = True
