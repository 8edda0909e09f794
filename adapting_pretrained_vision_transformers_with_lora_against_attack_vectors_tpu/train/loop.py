"""Epoch-level training drivers: base fine-tune and per-attack LoRA defense.

Capability parity with the reference's two trainers, re-designed around the
jitted steps in :mod:`train.steps`:

* :func:`fit` — the shared epoch engine. Replaces the reference's
  ``train_epoch``/``validate`` pair (train.py:25-88). Differences by design:
  batches cross to the device as uint8 and normalize on-device; metrics
  accumulate on device and cross to host once per epoch; the final partial
  batch is padded + masked instead of changing shape (one XLA program).
* :func:`train_base_model` — ``train.py`` capability: AdamW + StepLR
  (train.py:203-204), best-on-val-accuracy checkpointing (train.py:249-254),
  test metrics + results artifacts (train.py:277-294).
* :func:`train_lora_adapter` — ``train_loras.py`` capability: frozen base,
  adapter pytree is the only trainable (train_loras.py:284-351), best-on-val
  adapter + PEFT-format export (train_loras.py:340-355).

Both drivers work on any registry backbone and any mesh: pass a Mesh and the
loops shard each batch over the data axis (the reference is single-device).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..attacks.common import Normalizer
from ..data.loader import Loader
from ..models.registry import ModelEntry, get_normalization
from ..ops import lora
from ..parallel import mesh as pmesh
from ..utils import checkpoint
from ..utils.vocab import LabelVocabulary
from . import optim
from .metrics import confusion_matrix_metrics
from .steps import TrainState, make_eval_step, make_train_step


@dataclasses.dataclass
class FitResult:
    state: TrainState
    best_params: Any
    best_val_accuracy: float
    best_epoch: int
    history: list[dict]
    # the compiled eval program fit used for validation — reuse it for the
    # test pass instead of building (and remote-compiling) a second
    # identical one
    eval_step: Callable = None


def _device_batch(batch, mesh):
    """uint8 batch -> device arrays ([0,1] floats happen on device).

    Images cross the wire as uint8 — 4x fewer bytes than f32 on the
    remote-TPU tunnel — and the jitted step's trace-time dtype branch
    converts to [0,1] floats on device (train/steps.py)."""
    images = batch.images
    if mesh is not None:
        images, labels, valid = pmesh.shard_batch(mesh, images, batch.labels,
                                                  batch.valid)
    else:
        images = jax.device_put(images)
        labels = jax.device_put(batch.labels)
        valid = jax.device_put(batch.valid)
    return images, labels, valid


def evaluate(eval_step, params, loader: Loader, *, mesh=None) -> dict:
    """Run ``eval_step`` over a loader; returns accuracy/F1/loss metrics."""
    loss_sum = None
    conf_sum = None
    for batch in loader:
        images, labels, valid = _device_batch(batch, mesh)
        loss, conf = eval_step(params, images, labels, valid)
        loss_sum = loss if loss_sum is None else loss_sum + loss
        conf_sum = conf if conf_sum is None else conf_sum + conf
    if conf_sum is None:
        return {"accuracy": 0.0, "f1": 0.0, "loss": 0.0, "support": 0.0}
    conf_np = np.asarray(jax.device_get(conf_sum))
    m = confusion_matrix_metrics(conf_np)
    m["loss"] = float(jax.device_get(loss_sum)) / max(m["support"], 1.0)
    return m


def fit(
    forward: Callable[[Any, jax.Array], jax.Array],
    trainable,
    tx: optax.GradientTransformation,
    train_loader: Loader,
    val_loader: Optional[Loader],
    *,
    epochs: int,
    num_classes: int,
    normalize: Optional[Normalizer],
    mesh=None,
    on_epoch_end: Optional[Callable[[int, dict, TrainState, tuple], None]] = None,
    log: Callable[[str], None] = print,
    metrics=None,
    step_rng=None,
    augment=None,
    init_state: Optional[TrainState] = None,
    start_epoch: int = 0,
    init_best: Optional[tuple] = None,
    frozen=None,
) -> FitResult:
    """Shared epoch engine: train ``epochs`` epochs, track best-on-val params.

    ``metrics``: optional :class:`utils.observability.MetricsLogger` — each
    epoch record is appended as a JSONL event. ``step_rng``: see
    :func:`train.steps.make_train_step` (training-time stochastic branches).
    ``init_state``/``start_epoch``: resume a run mid-way (the capability the
    reference lacks, SURVEY.md §5 checkpoint row). ``frozen``: non-trainable
    pytree passed through jit as an argument (LoRA base params — see
    ``make_train_step``); when set ``forward`` is
    ``forward(frozen, trainable, x, ...)``."""
    train_step = make_train_step(forward, tx, normalize=normalize,
                                 step_rng=step_rng, augment=augment,
                                 frozen=frozen)
    eval_step = make_eval_step(forward, num_classes, normalize=normalize,
                               frozen=frozen)

    state = init_state if init_state is not None else TrainState.create(trainable, tx)
    if init_best is not None:
        # resume: carry the pre-crash best so worse post-resume epochs can't
        # silently overwrite the true best checkpoint
        best_params, best_acc, best_epoch = init_best
    else:
        best_params, best_acc, best_epoch = state.params, -1.0, -1
    history: list[dict] = []

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        loss_sum = correct = count = None
        for batch in train_loader:
            images, labels, valid = _device_batch(batch, mesh)
            state, m = train_step(state, images, labels, valid)
            if loss_sum is None:
                loss_sum, correct, count = m["loss_sum"], m["correct"], m["count"]
            else:
                loss_sum += m["loss_sum"]
                correct += m["correct"]
                count += m["count"]

        n = float(jax.device_get(count)) if count is not None else 0.0
        seconds = time.time() - t0
        rec = {
            "epoch": epoch,
            "train_loss": float(jax.device_get(loss_sum)) / max(n, 1.0) if n else 0.0,
            "train_accuracy": float(jax.device_get(correct)) / max(n, 1.0) if n else 0.0,
            "seconds": seconds,
            "images_per_second": n / seconds if seconds > 0 else 0.0,
        }
        if val_loader is not None:
            val = evaluate(eval_step, state.params, val_loader, mesh=mesh)
            rec.update({f"val_{k}": v for k, v in val.items()})
            if val["accuracy"] > best_acc:
                best_acc, best_epoch = val["accuracy"], epoch
                # REAL copies, not aliases: the next train_step donates the
                # state buffers (steps.py donate_argnums), which would delete
                # aliased best_params on TPU (harmless on CPU, hence the copy)
                best_params = jax.tree.map(jnp.copy, state.params)
        history.append(rec)
        log(f"epoch {epoch}: loss {rec['train_loss']:.4f} "
            f"acc {rec['train_accuracy']:.4f}"
            + (f" val_acc {rec.get('val_accuracy', 0):.4f}" if val_loader else "")
            + f" ({rec['seconds']:.1f}s)")
        if metrics is not None:
            metrics.log("epoch", step=epoch, **{k: v for k, v in rec.items()
                                                if k != "epoch"})
        if on_epoch_end is not None:
            on_epoch_end(epoch, rec, state, (best_params, best_acc, best_epoch))

    if best_epoch < 0:  # no val loader: final params are "best"
        best_params, best_acc, best_epoch = state.params, None, epochs - 1
    return FitResult(state, best_params, best_acc, best_epoch, history,
                     eval_step)


def train_base_model(
    entry: ModelEntry,
    params,
    train_loader: Loader,
    val_loader: Optional[Loader],
    test_loader: Optional[Loader],
    vocab: LabelVocabulary,
    *,
    out_dir: str,
    epochs: int = 1,
    lr: float = 1e-4,
    weight_decay: float = 1e-4,
    steplr_epochs: int = 20,
    steplr_gamma: float = 0.1,
    mesh=None,
    model_name: Optional[str] = None,
    source: str = "all",
    resume: bool = False,
    resume_save_s: float = 600.0,
    augment: bool = True,
    rng=None,
    cfg=None,
    log: Callable[[str], None] = print,
) -> dict:
    """Full fine-tune (reference ``train.py:113-296`` capability).

    Artifacts under ``out_dir``: ``class_mappings.txt``, best/final model
    checkpoints (safetensors), ``results.json``-style summary returned and
    written as ``training_results.csv`` (column parity with train.py:277-294).

    ``resume=True`` continues from ``{out_dir}/resume.*`` (full TrainState:
    params + optimizer + step), written atomically. Resume state is written
    on the first epoch completed after (re)start, on the final epoch, and
    otherwise at most every ``resume_save_s`` seconds (0 = every epoch): the
    full ViT-B TrainState is ~1 GB over the remote-TPU tunnel (~100 s/epoch
    measured on the flagship run — dwarfing the ~2.4 s device epoch), so
    crash-recovery durability is time-bounded, not epoch-bounded — while the
    first-epoch save guarantees forward progress even under a host that
    kills the process faster than the throttle interval. Long epochs
    (> ``resume_save_s``) still save every epoch.
    ``augment=True`` applies the reference's train-time augmentation
    (rotation/resized-crop/flip/color-jitter, train.py:128-135) on device.
    """
    import jax

    from ..data.augment import train_augment

    if train_loader is None:
        raise ValueError("no train split found (train/metadata.csv missing "
                         "or empty after source filtering)")
    model_name = model_name or entry.name
    cfg = cfg if cfg is not None else entry.config(len(vocab))
    normalize = Normalizer(*get_normalization(model_name))
    forward = lambda p, x, rng=None: entry.apply(cfg, p, x)
    aug_fn = train_augment if augment else None
    step_rng = (jax.random.fold_in(rng if rng is not None else jax.random.key(0),
                                   17) if augment else None)
    steps_per_epoch = max(len(train_loader), 1)
    tx = optim.adamw_steplr(lr, weight_decay=weight_decay,
                            step_size_epochs=steplr_epochs, gamma=steplr_gamma,
                            steps_per_epoch=steps_per_epoch)

    os.makedirs(out_dir, exist_ok=True)
    vocab.save(os.path.join(out_dir, "class_mappings.txt"))

    resume_prefix = os.path.join(out_dir, "resume")
    init_state, start_epoch, init_best = None, 0, None
    if resume and checkpoint.train_state_exists(resume_prefix):
        init_state, meta = checkpoint.load_train_state(
            resume_prefix, tx, state_cls=TrainState)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_path = resume_prefix + ".best.safetensors"
        if os.path.exists(best_path):
            b_params, b_meta = checkpoint.load_pytree(best_path)
            init_best = (b_params, float(b_meta.get("val_accuracy", -1.0)),
                         int(b_meta.get("epoch", -1)))
        log(f"resuming from epoch {start_epoch} (step {int(init_state.step)})")

    from ..utils.observability import MetricsLogger

    with MetricsLogger(os.path.join(out_dir, "metrics.jsonl")) as metrics:
        metrics.log("train_start", model=model_name, source=source,
                    epochs=epochs, lr=lr, start_epoch=start_epoch)

        # t = -inf: the FIRST epoch completed after (re)start always saves —
        # a host that kills the process every < resume_save_s must still
        # make one epoch of forward progress per attempt (review finding)
        last_save = {"t": float("-inf"),
                     "best_epoch": init_best[2] if init_best else -1}

        def save_resume(epoch, rec, state, best):
            best_params, best_acc, best_epoch = best
            if (epoch != epochs - 1
                    and time.time() - last_save["t"] < resume_save_s):
                return
            checkpoint.save_train_state(state, resume_prefix,
                                        meta={"epoch": epoch})
            if best_epoch > last_save["best_epoch"]:
                checkpoint.save_pytree(
                    best_params, resume_prefix + ".best.safetensors",
                    meta={"epoch": best_epoch, "val_accuracy": best_acc})
                last_save["best_epoch"] = best_epoch
            last_save["t"] = time.time()

        result = fit(forward, params, tx, train_loader, val_loader,
                     epochs=epochs, num_classes=len(vocab),
                     normalize=normalize, mesh=mesh, log=log, metrics=metrics,
                     step_rng=step_rng, augment=aug_fn,
                     init_state=init_state, start_epoch=start_epoch,
                     init_best=init_best, on_epoch_end=save_resume)

    best_path = os.path.join(out_dir, f"{model_name}_best_model_finetuned.safetensors")
    checkpoint.save_pytree(result.best_params, best_path,
                           meta={"model": model_name, "source": source,
                                 "classes": list(vocab.classes),
                                 "best_epoch": result.best_epoch,
                                 "best_val_accuracy": result.best_val_accuracy})
    final_path = os.path.join(out_dir, f"{model_name}_final_model.safetensors")
    checkpoint.save_pytree(result.state.params, final_path)

    summary = {
        "model": model_name, "source": source, "epochs": epochs,
        "best_epoch": result.best_epoch,
        "best_val_accuracy": result.best_val_accuracy,
        "history": result.history,
        "checkpoint": best_path,
    }
    if test_loader is not None:
        test = evaluate(result.eval_step, result.best_params, test_loader,
                        mesh=mesh)
        summary["test_accuracy"] = test["accuracy"]
        summary["test_f1"] = test["f1"]
        log(f"test: acc {test['accuracy']:.4f} f1 {test['f1']:.4f}")

    _write_results_csv(os.path.join(out_dir, "training_results.csv"), summary,
                       append=start_epoch > 0)
    return summary


def train_lora_adapter(
    entry: ModelEntry,
    base_params,
    lora_cfg: lora.LoRAConfig,
    train_loader: Loader,
    val_loader: Optional[Loader],
    vocab: LabelVocabulary,
    *,
    out_dir: str,
    epochs: int = 4,
    lr: float = 1e-4,
    train_head: bool = True,
    rng: Optional[jax.Array] = None,
    mesh=None,
    model_name: Optional[str] = None,
    cfg=None,
    log: Callable[[str], None] = print,
) -> dict:
    """Per-attack LoRA defense training (reference ``train_loras.py:118-395``).

    ``cfg``: optional model-config override (e.g. with ``use_fused_attention``
    flipped); defaults to ``entry.config(len(vocab))``.

    The trainable pytree is the adapter (plus, like PEFT ``SEQ_CLS``, the
    classifier head when ``train_head``); the base stays frozen and closed
    over. Saves ``rank{r}_best_adapter/`` and ``rank{r}_final_adapter/`` in
    PEFT format (reference layout, train_loras.py:342-355).
    """
    model_name = model_name or entry.name
    cfg = cfg if cfg is not None else entry.config(len(vocab))
    normalize = Normalizer(*get_normalization(model_name))
    rng = rng if rng is not None else jax.random.key(0)

    r_init, r_drop = jax.random.split(rng)
    adapter = lora.init(r_init, base_params, lora_cfg)
    trainable: dict = {"adapter": adapter}
    if train_head:
        # copy, never alias: the donated train state would otherwise delete
        # the caller's base-model head buffers on the first step (TPU)
        trainable["head"] = jax.tree.map(jnp.copy, base_params["head"])

    def forward(base, train_tree, x, drop_rng=None):
        # drop_rng is the per-step key from make_train_step: training passes
        # it (PEFT lora_dropout on the adapter branch); eval omits it.
        # ``base`` arrives as a jit ARGUMENT (fit(frozen=...)) — closing over
        # the 344 MB ViT-B tree would embed it in the lowered module, which
        # the axon remote-compile upload rejects (HTTP 413).
        p = lora.attach(base, train_tree["adapter"], lora_cfg,
                        dropout_rng=drop_rng)
        if train_head:
            p = dict(p)
            p["head"] = train_tree["head"]
        return entry.apply(cfg, p, x)

    tx = optim.lora_adam(lr)
    result = fit(forward, trainable, tx, train_loader, val_loader,
                 epochs=epochs, num_classes=len(vocab), normalize=normalize,
                 mesh=mesh, log=log, frozen=base_params,
                 step_rng=r_drop if lora_cfg.dropout > 0 else None)

    r = lora_cfg.rank
    from ..ops import peft_io

    for tag, tree in (("best", result.best_params), ("final", result.state.params)):
        peft_io.save_peft_adapter(
            tree["adapter"], lora_cfg, os.path.join(out_dir, f"rank{r}_{tag}_adapter"),
            head=tree.get("head"))

    return {
        "model": model_name, "rank": r,
        "best_epoch": result.best_epoch,
        "best_val_accuracy": result.best_val_accuracy,
        "history": result.history,
        "adapter_dir": os.path.join(out_dir, f"rank{r}_best_adapter"),
        "best_trainable": result.best_params,
    }


def _write_results_csv(path: str, summary: dict, *, append: bool = False) -> None:
    import csv

    rows = summary.get("history", [])
    if not rows:
        return
    keys = sorted({k for r in rows for k in r})
    # resumed runs append so pre-crash epochs aren't truncated away
    mode = "a" if append and os.path.exists(path) else "w"
    with open(path, mode, newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        if mode == "w":
            w.writeheader()
        for r in rows:
            w.writerow(r)
