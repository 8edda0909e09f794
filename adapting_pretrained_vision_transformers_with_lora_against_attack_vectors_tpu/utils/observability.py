"""Observability: structured JSONL metrics, step timing, profiler hooks,
NaN guards.

The reference's observability is wall-clock prints + tqdm postfix
(train.py:225, 256-257; SURVEY.md §5). Here:

* :class:`MetricsLogger` — append-only JSONL event stream (one object per
  line: ts, step, event, payload) next to the run's artifacts; cheap enough
  to leave on.
* :class:`StepTimer` — EMA step timing + images/sec, reported without
  per-step device syncs (reads only what the caller already fetched).
* :func:`profile_trace` — context manager over ``jax.profiler`` writing a
  TensorBoard-loadable trace directory; no-ops cleanly where the profiler
  is unsupported (e.g. remote-tunnel backends).
* :func:`assert_finite` — ``checkify``-free NaN/Inf guard for pytrees at
  stage boundaries (debug tool; attacks/training never need it on the hot
  path).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Iterator, Optional

import jax
import numpy as np


class MetricsLogger:
    """Append-only JSONL metrics (``{"ts":…,"step":…,"event":…,…}``)."""

    def __init__(self, path: Optional[str], *, flush_every: int = 1):
        self.path = path
        self._f = None
        self._n = 0
        self._flush_every = flush_every
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")

    def log(self, event: str, *, step: Optional[int] = None, **payload) -> None:
        if self._f is None:
            return
        rec = {"ts": round(time.time(), 3), "event": event}
        if step is not None:
            rec["step"] = int(step)
        for k, v in payload.items():
            if hasattr(v, "item"):
                v = v.item()
            rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._n += 1
        if self._n % self._flush_every == 0:
            self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self) -> "MetricsLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class StepTimer:
    """EMA step timing; call :meth:`tick` once per step on the host."""

    def __init__(self, *, ema: float = 0.9):
        self._ema = ema
        self._avg: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._avg = dt if self._avg is None else (
                self._ema * self._avg + (1 - self._ema) * dt)
        self._last = now
        return dt

    @property
    def seconds_per_step(self) -> Optional[float]:
        return self._avg

    def images_per_second(self, batch_size: int) -> Optional[float]:
        return batch_size / self._avg if self._avg else None


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace scope; silently inert when unsupported."""
    if not log_dir:
        yield
        return
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def assert_finite(tree: Any, *, name: str = "tree") -> None:
    """Raise ``FloatingPointError`` naming the first non-finite leaf path."""
    from . import trees

    for path, leaf in trees.flatten_with_paths(tree).items():
        arr = np.asarray(jax.device_get(leaf))
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}/{path}: {bad}/{arr.size} non-finite values")
