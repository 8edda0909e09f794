"""BiLoRA — frequency-domain low-parameter adapters.

Capability parity with the reference's ``train_bilora.ipynb`` prototype
(cell 30d012be, ``BiLoRALinear``): instead of a low-rank factorization, each
task's adapter is ``n_frq`` learnable complex coefficients scattered into a
sparse 2-D spectrum over the weight matrix; the weight delta is

    ΔW = alpha * Re(ifft2(spectrum))

Per-task spectrum *positions* are chosen deterministically from the task id
(the reference derives them from a per-task seed), so two tasks occupy
disjoint/independent frequency supports — that is the "Bi" (per-task
band-limited) structure.

TPU notes: the scatter is a static-index ``.at[].set`` and ``ifft2`` lowers
to XLA's FFT — the whole ΔW materialization fuses into the surrounding jit.
Deltas from different tasks compose by addition exactly like LoRA merges,
so BiLoRA adapters slot into the same composability harness
(``eval/compose.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import trees


@dataclasses.dataclass(frozen=True)
class BiLoRAConfig:
    """Static adapter hyperparameters (reference cell 30d012be defaults:
    n_frq=100, alpha=1.0)."""

    n_frq: int = 100
    alpha: float = 1.0
    targets: tuple[str, ...] = ()
    task_id: int = 0


def _positions(task_id: int, n_frq: int, rows: int, cols: int) -> np.ndarray:
    """Deterministic per-task frequency positions (reference
    ``_select_positions``): a task-seeded permutation of the flat spectrum."""
    rng = np.random.default_rng(np.uint32(task_id) * np.uint32(2654435761) + 1)
    flat = rng.choice(rows * cols, size=min(n_frq, rows * cols), replace=False)
    return np.stack([flat // cols, flat % cols], axis=1).astype(np.int32)


def init(params, cfg: BiLoRAConfig, *, dtype=jnp.float32) -> dict:
    """Zero-coefficient adapter (initial ΔW = 0) per target."""
    adapter = {}
    for path in cfg.targets:
        w = trees.get_path(params, path)["w"]
        *lead, d_in, d_out = w.shape
        n = min(cfg.n_frq, d_in * d_out)
        adapter[path] = {
            "re": jnp.zeros((*lead, n), dtype),
            "im": jnp.zeros((*lead, n), dtype),
        }
    return adapter


def delta(fac: Mapping, path_positions: np.ndarray, shape: tuple,
          alpha: float) -> jax.Array:
    """ΔW = alpha * Re(ifft2(scatter(coeffs))) for one target.

    ``fac['re']/['im']``: (*lead, n) coefficients; ``shape``: the target
    kernel shape (*lead, in, out).
    """
    *lead, d_in, d_out = shape
    pos = jnp.asarray(path_positions)

    def one(re, im):
        spec = jnp.zeros((d_in, d_out), jnp.complex64)
        spec = spec.at[pos[:, 0], pos[:, 1]].set(re + 1j * im)
        return jnp.fft.ifft2(spec).real.astype(re.dtype)

    f = one
    for _ in lead:
        f = jax.vmap(f)
    return alpha * f(fac["re"], fac["im"])


def apply_delta(params, adapter: Mapping, cfg: BiLoRAConfig):
    """Functional merge: W <- W + ΔW per target (differentiable wrt the
    adapter coefficients — this is both the training and the eval form)."""
    out = params
    for path, fac in adapter.items():
        w = trees.get_path(params, path)["w"]
        pos = _positions(cfg.task_id, cfg.n_frq, w.shape[-2], w.shape[-1])

        def fold(sub, fac=fac, pos=pos, shape=w.shape):
            new = dict(sub)
            new["w"] = sub["w"] + delta(fac, pos, shape,
                                        cfg.alpha).astype(sub["w"].dtype)
            return new

        out = trees.update_path(out, path, fold)
    return out


def merge_many(params, adapters: Sequence[Mapping],
               cfgs: Sequence[BiLoRAConfig]):
    """Compose several per-task BiLoRA adapters by summed deltas."""
    out = params
    for adapter, cfg in zip(adapters, cfgs):
        out = apply_delta(out, adapter, cfg)
    return out


def num_params(adapter: Mapping) -> int:
    return trees.tree_count_params(adapter)
