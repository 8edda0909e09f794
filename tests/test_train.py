import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from apvt_lora.models import vit
from apvt_lora.ops import lora
from apvt_lora.train import (TrainState, confusion_matrix_metrics, lora_adam,
                             make_eval_step, make_train_step)
from apvt_lora.train.optim import steplr_schedule


@pytest.fixture(scope="module")
def problem():
    cfg = vit.VIT_TEST
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (8, cfg.image_size, cfg.image_size, 3))
    y = jnp.arange(8) % cfg.num_classes
    valid = jnp.ones(8, jnp.float32)
    return cfg, params, x, y, valid


def test_full_finetune_overfits_batch(problem):
    cfg, params, x, y, valid = problem
    tx = optax.adam(3e-3)
    forward = lambda p, imgs: vit.apply(cfg, p, imgs)
    step = make_train_step(forward, tx, normalize=None)
    # train_step donates its state, so hand it a copy of the shared fixture
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    first = None
    for _ in range(30):
        state, m = step(state, x, y, valid)
        if first is None:
            first = float(m["loss_sum"] / m["count"])
    last = float(m["loss_sum"] / m["count"])
    assert last < first * 0.5, (first, last)
    assert int(state.step) == 30


def test_lora_training_decreases_loss_base_frozen(problem):
    cfg, params, x, y, valid = problem
    lcfg = lora.LoRAConfig(rank=4, alpha=16.0, targets=vit.LORA_TARGETS_DEFAULT)
    adapter = lora.init(jax.random.key(2), params, lcfg)
    tx = lora_adam(5e-3)
    forward = lambda ad, imgs: vit.apply(cfg, lora.attach(params, ad, lcfg), imgs)
    step = make_train_step(forward, tx, normalize=None)
    state = TrainState.create(adapter, tx)
    losses = []
    for _ in range(25):
        state, m = step(state, x, y, valid)
        losses.append(float(m["loss_sum"] / m["count"]))
    assert losses[-1] < losses[0] * 0.8, losses[::6]
    # trainable tree is exactly the adapter => base params untouched by construction
    assert set(state.params.keys()) == set(adapter.keys())


def test_padding_mask_excluded(problem):
    cfg, params, x, y, _ = problem
    tx = optax.sgd(0.0)
    forward = lambda p, imgs: vit.apply(cfg, p, imgs)
    step = make_train_step(forward, tx, normalize=None)
    valid = jnp.array([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    fresh = lambda: TrainState.create(jax.tree.map(jnp.copy, params), tx)
    _, m = step(fresh(), x, y, valid)
    assert float(m["count"]) == 4.0
    # metrics identical if the padded images are garbage
    x_bad = x.at[4:].set(0.73)
    _, m2 = step(fresh(), x_bad, y, valid)
    np.testing.assert_allclose(float(m["loss_sum"]), float(m2["loss_sum"]), rtol=1e-5)


def test_eval_confusion_matches_sklearn(problem):
    from sklearn.metrics import accuracy_score, f1_score

    cfg, params, x, y, valid = problem
    forward = lambda p, imgs: vit.apply(cfg, p, imgs)
    eval_step = make_eval_step(forward, cfg.num_classes, normalize=None)
    _, conf = eval_step(params, x, y, valid)
    preds = np.argmax(np.asarray(vit.apply(cfg, params, x)), axis=-1)
    m = confusion_matrix_metrics(conf)
    assert m["accuracy"] == pytest.approx(accuracy_score(np.asarray(y), preds))
    assert m["f1"] == pytest.approx(
        f1_score(np.asarray(y), preds, average="weighted", zero_division=0), abs=1e-6)


def test_steplr_schedule():
    sched = steplr_schedule(1e-4, step_size_epochs=20, gamma=0.1, steps_per_epoch=10)
    assert float(sched(jnp.asarray(0))) == pytest.approx(1e-4)
    assert float(sched(jnp.asarray(199))) == pytest.approx(1e-4)  # epoch 19
    assert float(sched(jnp.asarray(200))) == pytest.approx(1e-5)  # epoch 20
    assert float(sched(jnp.asarray(405))) == pytest.approx(1e-6)  # epoch 40


def test_train_base_model_resume(tmp_path):
    """Killing a run after epoch 0 and restarting with resume=True continues
    from epoch 1 with the optimizer state intact (capability the reference
    lacks — it could only save, never resume)."""
    import os

    import jax

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import synthetic
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import loop
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    root = str(tmp_path)
    synthetic.make_synthetic_dataset(root + "/d", n_per_class=4, image_size=32)
    vocab = LabelVocabulary.from_classes(synthetic.DEFAULT_CLASSES)
    entry = registry.get_model("vit_test")
    params = entry.init(jax.random.key(0), entry.config(len(vocab)))
    mk = lambda s: Loader(MetadataIndex(f"{root}/d/{s}/metadata.csv", vocab),
                          batch_size=10, image_size=32, resize=32)

    out = root + "/out"
    # run 1: one epoch, writes resume state
    loop.train_base_model(entry, params, mk("train"), mk("val"), None, vocab,
                          out_dir=out, epochs=1, log=lambda s: None)
    assert os.path.exists(os.path.join(out, "resume.state.safetensors"))

    # run 2: resume to epoch 2 — history starts at epoch 1
    logs = []
    summary = loop.train_base_model(entry, params, mk("train"), mk("val"),
                                    None, vocab, out_dir=out, epochs=2,
                                    resume=True, log=logs.append)
    assert any("resuming from epoch 1" in s for s in logs)
    assert [h["epoch"] for h in summary["history"]] == [1]


def test_resume_preserves_best_checkpoint(tmp_path):
    """A resumed run must not overwrite a better pre-crash best checkpoint
    with worse post-resume params (review finding)."""
    import os

    import jax
    import numpy as np

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import synthetic
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import loop
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import checkpoint
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    root = str(tmp_path)
    synthetic.make_synthetic_dataset(root + "/d", n_per_class=4, image_size=32)
    vocab = LabelVocabulary.from_classes(synthetic.DEFAULT_CLASSES)
    entry = registry.get_model("vit_test")
    params = entry.init(jax.random.key(0), entry.config(len(vocab)))
    mk = lambda s: Loader(MetadataIndex(f"{root}/d/{s}/metadata.csv", vocab),
                          batch_size=10, image_size=32, resize=32)
    out = root + "/out"

    s1 = loop.train_base_model(entry, params, mk("train"), mk("val"), None,
                               vocab, out_dir=out, epochs=1,
                               log=lambda s: None)
    assert os.path.exists(os.path.join(out, "resume.best.safetensors"))
    first_best = s1["best_val_accuracy"]

    s2 = loop.train_base_model(entry, params, mk("train"), mk("val"), None,
                               vocab, out_dir=out, epochs=2, resume=True,
                               log=lambda s: None)
    # the carried best can only improve or stay — never regress
    assert s2["best_val_accuracy"] >= first_best - 1e-9


def test_resume_save_throttle(tmp_path, monkeypatch):
    """Resume-state writes are time-throttled (the full ViT-B TrainState is
    ~1 GB over the remote-TPU tunnel; per-epoch saves dominated the flagship
    train stage's wall-clock): with a large ``resume_save_s`` only the final
    first epoch after start and the final epoch save, with 0 every epoch
    saves — and the final save must still carry the true best params even
    when the best epoch itself was skipped."""
    import os

    import jax

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import synthetic
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import loop
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import checkpoint
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    root = str(tmp_path)
    synthetic.make_synthetic_dataset(root + "/d", n_per_class=4, image_size=32)
    vocab = LabelVocabulary.from_classes(synthetic.DEFAULT_CLASSES)
    entry = registry.get_model("vit_test")
    params = entry.init(jax.random.key(0), entry.config(len(vocab)))
    mk = lambda s: Loader(MetadataIndex(f"{root}/d/{s}/metadata.csv", vocab),
                          batch_size=10, image_size=32, resize=32)

    calls = []
    orig = checkpoint.save_train_state
    monkeypatch.setattr(loop.checkpoint, "save_train_state",
                        lambda *a, **k: (calls.append(k["meta"]["epoch"]),
                                         orig(*a, **k))[1])

    # fresh param copies per run: the jitted train step donates its input
    # buffers, so a second run cannot reuse the first run's initial tree
    import jax.numpy as jnp

    loop.train_base_model(entry, jax.tree.map(jnp.copy, params), mk("train"),
                          mk("val"), None, vocab,
                          out_dir=root + "/throttled", epochs=3,
                          resume_save_s=3600.0, log=lambda s: None)
    assert calls == [0, 2]  # first epoch (crash-loop liveness) + final epoch
    # the (throttled) final save still wrote a best checkpoint
    assert os.path.exists(os.path.join(root, "throttled",
                                       "resume.best.safetensors"))

    calls.clear()
    loop.train_base_model(entry, jax.tree.map(jnp.copy, params), mk("train"),
                          mk("val"), None, vocab,
                          out_dir=root + "/eager", epochs=3,
                          resume_save_s=0.0, log=lambda s: None)
    assert calls == [0, 1, 2]  # every epoch (pre-throttle behavior)


def test_saved_checkpoint_reproduces_in_memory_logits(tmp_path):
    """The saved best checkpoint must produce bitwise-identical logits to
    the in-memory tree it was saved from. Round-2 regression: F-strided
    device_get views were serialized raw by safetensors, silently
    transposing the classifier head — training metrics looked perfect while
    every downstream stage loaded a broken model."""
    import os

    import jax

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import synthetic
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import loop
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import checkpoint as ckpt
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    root = str(tmp_path)
    synthetic.make_synthetic_dataset(root + "/d", n_per_class=4, image_size=32)
    vocab = LabelVocabulary.from_classes(synthetic.DEFAULT_CLASSES)
    entry = registry.get_model("vit_test")
    cfg = entry.config(len(vocab))
    params = entry.init(jax.random.key(0), cfg)
    mk = lambda s: Loader(MetadataIndex(f"{root}/d/{s}/metadata.csv", vocab),
                          batch_size=10, image_size=32, resize=32)
    out = root + "/out"
    loop.train_base_model(entry, params, mk("train"), mk("val"), None, vocab,
                          out_dir=out, epochs=1, log=lambda s: None)

    best_path = os.path.join(out, "vit_test_best_model_finetuned.safetensors")
    reloaded, _ = ckpt.load_pytree(best_path)
    resume_best, _ = ckpt.load_pytree(os.path.join(out, "resume.best.safetensors"))

    x = jax.random.uniform(jax.random.key(5), (4, 32, 32, 3))
    l_reload = np.asarray(entry.apply(cfg, jax.device_put(reloaded), x))
    l_resume = np.asarray(entry.apply(cfg, jax.device_put(resume_best), x))
    # two independent save paths of the same epoch's params must agree and
    # reproduce identical predictions
    np.testing.assert_array_equal(l_reload, l_resume)
    for a, b in zip(jax.tree.leaves(reloaded), jax.tree.leaves(resume_best)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
